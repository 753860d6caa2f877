package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record linkage: probabilistic duplicate scoring over
  * blocked candidate pairs (scale addition — the reference has no
  * entity-resolution surface; this is the scoring half that
  * `goldenRecords` consolidation and `editDistancePairs` blocking
  * assume exists upstream).
  *
  * Model: each field comparator emits agree/disagree; a pair's score is
  * the sum of per-field log-likelihood ratios — `log(m/u)` on
  * agreement, `log((1-m)/(1-u))` on disagreement, where m = P(agree |
  * same entity) and u = P(agree | different entities). Pairs at or
  * above `minScore` are candidate links.
  *
  * Exactness contract: weights are INTEGERS (log base 2 of dyadic m/u
  * ratios — e.g. m=8/9, u=1/9 gives +3/−3; m=4/5, u=1/5 gives +2/−2).
  * Real-valued weights are a caller-side scaling of the same sum; the
  * integer form keeps the score exact and engine-portable (the q123
  * rational-threshold rule), so the oracle hash-matches bit-for-bit.
  *
  * Scale shape: candidate generation is a self-equi-join on the block
  * key — pairs = Σ_b |b|² over blocks, NEVER all-pairs, and the join
  * shuffles each record once keyed by block. The field comparators run
  * on the joined pairs map-side (codegen'd `when` chains; a bounded
  * `levenshtein(a, b, k)` comparator stays cheap on runaway strings).
  * Oversized blocks (a null-heavy or default-valued block key is the
  * classic trap: one degenerate block quadratically dominates) are
  * REFUSED loudly by a guard FUSED into the join plan (a per-block
  * count window sharing the join's shuffle — no separate probe scan)
  * rather than silently ground through; when no natural blocking key
  * bounds |b|, use sorted-neighborhood blocking
  * (`Dedup.sortedNeighborhood` via [[scoreNeighborPairs]]) to feed
  * pairs instead.
  */
object Linkage {

  /** One field comparator: `agree(aCol, bCol)` is a Column predicate
    * over the two sides' values; weights are the integer log2
    * likelihood ratios (agreeW > 0 > disagreeW for any informative
    * field). A NULL agreement (e.g. comparator over null fields)
    * counts as disagreement — the conservative choice.
    */
  case class LinkField(name: String, agree: (Column, Column) => Column,
                       agreeW: Int, disagreeW: Int)

  /** Score all within-block pairs of `records` (self-linkage /
    * dedup form). Output: (idCol_a, idCol_b, pattern, score) with
    * idCol_a < idCol_b, `pattern` the per-field agreement bitstring in
    * `fields` order (the audit surface: which evidence fired), `score`
    * the summed integer weights; only pairs with score ≥ minScore
    * survive (the filter runs map-side on the join output — sub-
    * threshold pairs never reach another shuffle).
    *
    * @param valueCols columns the comparators read (projected before
    *                  the join so the pair shuffle carries only them)
    * @param maxBlockRows refuse blocks larger than this (quadratic
    *                  blow-up guard); the check rides the join's own
    *                  block-key shuffle as a count window threaded
    *                  through the id column, so it raises before any
    *                  quadratic pair row exists and costs no extra
    *                  input pass
    */
  def scorePairs(records: DataFrame, idCol: String, blockCols: Seq[String],
                 valueCols: Seq[String], fields: Seq[LinkField],
                 minScore: Int, maxBlockRows: Long = 100000L): DataFrame = {
    require(fields.nonEmpty, "scorePairs: no comparators")
    require(blockCols.nonEmpty, "scorePairs: no block key")
    val slim = records.select((idCol +: blockCols ++: valueCols).distinct.map(col): _*)
    // The guard routes through the id the pair filter reads, so column
    // pruning can never drop it; it only wraps side "a" — every block
    // row passes through that side, one firing row is enough.
    val guardedId = when(
      count(lit(1)).over(Window.partitionBy(blockCols.map(col): _*)) > maxBlockRows,
      raise_error(format_string(
        s"scorePairs: block %s exceeds $maxBlockRows rows — pairs are quadratic " +
        "per block; refine blockCols or use sorted-neighborhood blocking",
        concat_ws(",", blockCols.map(c => col(c).cast("string")): _*))))
      .otherwise(col(idCol))
    def side(tag: String, id: Column) = slim.select(
      (id.as(s"${idCol}_$tag") +: blockCols.map(col)) ++:
        valueCols.map(c => col(c).as(s"_${tag}_$c")): _*)
    val pairs = side("a", guardedId).join(side("b", col(idCol)), blockCols, "inner")
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
    scoreJoined(pairs, idCol, fields, minScore)
  }

  /** Score pairs from SORTED-NEIGHBORHOOD candidates instead of a
    * blocked self-join — the scale-robust candidate path when no
    * natural block key bounds |b|: [[scorePairs]]'s cost is Σ|b|²
    * (QUADRATIC in block size, so 10× more records in the same blocks
    * is 100× the pairs — measured on the dup-heavy 10× replica), while
    * SNM pairs each record with its `w` neighbors in `sortCol` order —
    * n·w candidates, LINEAR at any scale, recall governed by how well
    * the sort key co-locates true duplicates (the standard SNM
    * trade-off; multi-pass over several sort keys is the recall fix).
    * Candidates come from `Dedup.sortedNeighborhood` (two-level global
    * ordinal — never a global window), values hash-join back onto the
    * n·w pair list, and the same integer likelihood-ratio scoring
    * applies.
    */
  def scoreNeighborPairs(records: DataFrame, idCol: String, sortCol: String,
                         valueCols: Seq[String], fields: Seq[LinkField],
                         minScore: Int, w: Int = 10): DataFrame = {
    val slim = records.select((idCol +: valueCols).distinct.map(col): _*)
    val keyed = records.select(col(idCol), col(sortCol).as("_sk"))
    val cand = Dedup.sortedNeighborhood(keyed, "_sk", idCol, w)
      .select(col("id_a").as(s"${idCol}_a"), col("id_b").as(s"${idCol}_b"))
    def side(tag: String) = slim.select(
      col(idCol).as(s"${idCol}_$tag") +: valueCols.map(c => col(c).as(s"_${tag}_$c")): _*)
    val pairs = cand.join(side("a"), Seq(s"${idCol}_a")).join(side("b"), Seq(s"${idCol}_b"))
    scoreJoined(pairs, idCol, fields, minScore)
  }

  /** Multi-pass SNM: [[scoreNeighborPairs]] over SEVERAL sort keys,
    * with the candidate pair lists unioned and deduplicated BEFORE the
    * value join-back and scoring. One sort key is the documented
    * recall ceiling of single-pass SNM — two records whose difference
    * falls early in the key sort far apart and never meet; the classic
    * fix (Hernández/Stolfo's own) is independent passes over
    * differently-ordered keys (name, zip+street, phone …): a true
    * duplicate only has to co-locate under ONE of them.
    *
    * Scale shape: each pass is the linear n·w candidate generator
    * (two-level ordinal, never a global window); the union is
    * |passes|·n·w rows and the pair dedup ONE distinct on (id_a, id_b)
    * — map-side-combinable, shuffle bounded by the candidate list, so
    * recall is bought at strictly linear cost per extra pass. Pairs
    * are normalized id_a < id_b first: two passes can discover the
    * same pair in opposite sort orders, and an unnormalized distinct
    * would double-score it.
    */
  def scoreNeighborPairsMulti(records: DataFrame, idCol: String,
                              sortCols: Seq[String], valueCols: Seq[String],
                              fields: Seq[LinkField], minScore: Int,
                              w: Int = 10): DataFrame = {
    require(sortCols.nonEmpty, "scoreNeighborPairsMulti: no sort keys")
    val slim = records.select((idCol +: valueCols).distinct.map(col): _*)
    val cand = sortCols.map { sc =>
      val keyed = records.select(col(idCol), col(sc).cast("string").as("_sk"))
      Dedup.sortedNeighborhood(keyed, "_sk", idCol, w)
        .select(least(col("id_a"), col("id_b")).as(s"${idCol}_a"),
          greatest(col("id_a"), col("id_b")).as(s"${idCol}_b"))
    }.reduce(_.unionByName(_)).distinct()
    def side(tag: String) = slim.select(
      col(idCol).as(s"${idCol}_$tag") +: valueCols.map(c => col(c).as(s"_${tag}_$c")): _*)
    val pairs = cand.join(side("a"), Seq(s"${idCol}_a")).join(side("b"), Seq(s"${idCol}_b"))
    scoreJoined(pairs, idCol, fields, minScore)
  }

  private def scoreJoined(pairs: DataFrame, idCol: String,
                          fields: Seq[LinkField], minScore: Int): DataFrame = {
    val agrees = fields.map(f =>
      coalesce(f.agree(col(s"_a_${f.name}"), col(s"_b_${f.name}")), lit(false)))
    val score = fields.zip(agrees).map { case (f, a) =>
      when(a, lit(f.agreeW)).otherwise(lit(f.disagreeW))
    }.reduce(_ + _)
    val pattern = concat(agrees.map(a => when(a, lit("1")).otherwise(lit("0"))): _*)
    pairs.select(col(s"${idCol}_a"), col(s"${idCol}_b"),
        pattern.as("pattern"), score.as("score"))
      .filter(col("score") >= minScore)
  }
}
