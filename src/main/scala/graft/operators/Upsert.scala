package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge: apply a change feed onto a base snapshot (SURVEY.md §2
  * #62). The batch half of the lakehouse MERGE INTO pattern — the
  * operation a pipeline runs when a crawl refresh, a takedown list, or
  * an upstream correction lands as (key, seq, op, payload) rows and the
  * training corpus snapshot must move to the post-change state.
  *
  * Semantics: per key, the change with the highest (seq) wins
  * (ties broken by op descending so a same-seq D beats the U it
  * follows in a compacted feed); a winning U/I replaces or inserts the
  * payload, a winning D removes the key. Keys untouched by the feed
  * pass through unchanged.
  *
  * Scale shape: the winner-per-key reduction is a window over the
  * CHANGE FEED only (partitioned by key — the feed is grouped before
  * it ever meets the base), then ONE equi-join feed↔base on the key.
  * The base is never windowed and never shuffled beyond the join; with
  * AQE a small compacted feed broadcasts and the base stays in place —
  * the right plan when changes ≪ snapshot, the CDC norm. A full-outer
  * join keeps both inserted keys (change-only) and untouched keys
  * (base-only).
  */
object Upsert {

  /** @param base    current snapshot; must carry `keyCol` + payload cols
    * @param changes feed of (keyCol, seqCol, opCol, payload cols) where
    *                op ∈ {"I","U","D"} (I and U are synonyms on apply)
    * @param tieCols extra descending tie-break columns appended to the
    *                winner order — a CDC apply is only deterministic
    *                under a TOTAL order on the feed, so a feed whose
    *                (seq, op) can repeat per key (e.g. replayed or
    *                merged shards) must name columns that complete it
    * @return the next snapshot, same schema as base
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCol: String, seqCol: String, opCol: String,
                   tieCols: Seq[String] = Nil): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol).desc +: col(opCol).desc +: tieCols.map(col(_).desc): _*)
    val winner = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(keyCol) +: col(opCol).as("_op") +: payload.map(c => col(c).as(s"_c_$c")): _*)
    base.join(winner, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: payload.map(c =>
        when(col("_op").isNotNull, col(s"_c_$c")).otherwise(col(c)).as(c)): _*)
  }
}
