package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Snapshot diff — the inverse audit of [[applyChanges]]: classify
    * every key across two versions of a table as `added` / `removed` /
    * `changed` / `same`. The regression gate a pipeline runs after a
    * rebuild ("what did the new dedup config actually change?") and
    * the reconciliation between a warehouse copy and its source.
    *
    * Scale shape: ONE full-outer equi-join on the key, with both
    * sides pre-projected to (key, payload struct) — the struct
    * comparison is a single null-safe equality Catalyst evaluates
    * field-wise, codegen'd, no row hashing round trip and no string
    * rendering (a rendered-hash diff breaks the moment two engines
    * format a double differently). Keys must be unique per side
    * (snapshot semantics) — duplicate keys raise rather than silently
    * cross-pairing; the guard is FUSED into the plan as a per-key
    * count window on the same key partitioning the join needs anyway
    * (zero extra input passes — the old eager probe scanned each side
    * once more), unless `assumeUnique` skips it.
    *
    * Output: (keyCol, change) for every key in either snapshot.
    * `keepSame=false` drops the (dominant, boring) `same` class
    * map-side — the typical production call reports only the delta.
    */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                    keepSame: Boolean = true,
                    assumeUnique: Boolean = false): DataFrame = {
    val payload = oldDf.columns.filterNot(_ == keyCol).toSeq
    require(newDf.columns.toSet == oldDf.columns.toSet,
      s"snapshot schemas differ: ${oldDf.columns.toSeq} vs ${newDf.columns.toSeq}")
    // Guard fused into each side's projection: the payload struct the
    // diff reads is routed through a when(dup, raise_error) so column
    // pruning can never drop the check, and the count window shares
    // the full-outer join's key partitioning — one shuffle per side,
    // no separate probe job.
    def slim(df: DataFrame, tag: String) = {
      val p = struct(payload.sorted.map(col): _*)
      val guarded = if (assumeUnique) p
        else when(count(lit(1)).over(Window.partitionBy(keyCol)) > 1,
          raise_error(format_string(
            s"diffSnapshots: $tag snapshot has duplicate key %s — not a snapshot",
            col(keyCol).cast("string"))))
        .otherwise(p)
      df.select(col(keyCol), guarded.as(s"_p_$tag"))
    }
    val change =
      when(col("_p_old").isNull, lit("added"))
        .when(col("_p_new").isNull, lit("removed"))
        .when(col("_p_old") <=> col("_p_new"), lit("same"))
        .otherwise(lit("changed"))
    val out = slim(oldDf, "old").join(slim(newDf, "new"), Seq(keyCol), "full_outer")
      .select(col(keyCol), change.as("change"))
    if (keepSame) out else out.filter(col("change") =!= "same")
  }

  /** Bitemporal as-of reconstruction: the state the system BELIEVED at
    * transaction time `txAt` about validity time `validAt` — the
    * two-axis time travel (Snodgrass; SQL:2011 temporal) that CDC
    * apply (one axis: tx) and SCD2 periods (one axis: validity) each
    * give half of. The audit question it answers: "what did the
    * feature store say on March 1st about the user's state on
    * February 1st?" — indispensable once late-arriving corrections
    * exist, because the corrected history and the as-known-then
    * history differ exactly where a training/serving skew audit needs
    * to look.
    *
    * Per key: among changes with tx ≤ txAt (known by then) and
    * valid_from ≤ validAt (effective by then), the one with the
    * LATEST validity wins; among same-validity rows the latest tx
    * wins (a correction to the same effective instant supersedes).
    *
    * Scale shape: the temporal filters are scan predicates (pushed to
    * the source); the winner is ONE per-key window with
    * WindowGroupLimit pushdown from rn = 1 — the applyChanges winner
    * shape, shuffles sized by the SURVIVING change feed.
    */
  def bitemporalAsOf(changes: DataFrame, keyCol: String, validCol: String,
                     txCol: String, txAt: Column, validAt: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(validCol).desc, col(txCol).desc)
    changes.filter(col(txCol) <= txAt && col(validCol) <= validAt)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Canonical mergeable aggregate state per key over `valueCol`:
    * (n, sum_q, min_v, max_v), the sum micro-unit-quantized and
    * carried as DECIMAL(38,0) — the partial-aggregate shape that makes
    * incremental pipelines possible: aggregate each arriving batch
    * once, then [[mergeAggStates]] folds states without ever
    * rescanning history. One partial-agg shuffle; every component is
    * commutative + associative (that's the contract the merge relies
    * on), and the quantized DECIMAL sum makes the state EXACT and
    * order-insensitive — the merged result is bit-identical to a
    * from-scratch aggregation, no float drift and NO SILENT LONG WRAP
    * (a long Σq overflows at ~10¹⁰ rows of 10⁹-unit values in
    * non-ANSI mode; state types must survive the corpus lifetime, not
    * one batch — the momentsState rule). The addend is decimal-cast
    * BEFORE the sum — summing longs and casting after would wrap
    * inside the aggregation buffer.
    */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(floor(col(valueCol).cast("double") * 1e6 + lit(0.5)).cast("decimal(20,0)"))
        .cast("decimal(38,0)").as("sum_q"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Second-moment extension of [[aggState]]: (n, sum_q, sum_q2) per
    * key, where q = round(value·1e6) is the micro-unit quantized value
    * (a long) and sum_q2 = Σq² is carried as DECIMAL(38,0) — q² alone
    * reaches ~10¹⁷ for values in the thousands, so a long sum would
    * overflow silently while decimal arithmetic stays exact to 38
    * digits (plenty: 10⁶ rows of 10¹⁷ is 10²³). From this state mean,
    * variance, and stddev are exact rational functions — see
    * [[momentsOf]] — and the state merges like any other power sum:
    * component-wise addition, order- and split-invariant, bit-identical
    * to a from-scratch pass. This is the distributed Welford
    * replacement: Welford's streaming update is sequential by design;
    * power sums in exact integer arithmetic are the shuffle-friendly
    * form with none of the float cancellation that makes naive
    * double-precision power sums dangerous.
    */
  def momentsState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val q = floor(col(valueCol).cast("double") * 1e6 + lit(0.5)).cast("long")
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      // both sums as decimal: Σq alone would overflow a long once the
      // state has absorbed ~10¹⁰ rows of 10⁹-unit values — state types
      // must survive the CORPUS lifetime, not one batch. The addend is
      // decimal-cast BEFORE the sum (sum over longs wraps inside the
      // aggregation buffer; a cast after the fact can't undo it).
      sum(q.cast("decimal(20,0)")).cast("decimal(38,0)").as("sum_q"),
      sum(q.cast("decimal(19,0)") * q).cast("decimal(38,0)").as("sum_q2"))
  }

  /** Merge [[momentsState]] tables — union + one partial agg, the
    * identical contract to [[mergeAggStates]]. */
  def mergeMomentsStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeMomentsStates: no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_q").cast("decimal(38,0)").as("sum_q"),
           sum("sum_q2").cast("decimal(38,0)").as("sum_q2"))
  }

  /** Finalize a moments state into (mean, var_samp, stddev): the
    * numerators are computed in exact decimal integers (n·Σq² − (Σq)²
    * cannot cancel catastrophically — it never passes through a float
    * until the single final division), then ONE IEEE double division
    * per statistic, engine-portable because every operand is the same
    * exact integer on any engine. Keys with n < 2 get NULL variance
    * (sample variance undefined), mirroring SQL var_samp.
    */
  def momentsOf(state: DataFrame): DataFrame = {
    val n = col("n")
    val num = (n.cast("decimal(38,0)") * col("sum_q2") -
               col("sum_q") * col("sum_q")).cast("decimal(38,0)")
    val den = (n * (n - lit(1L))).cast("double") * lit(1e12)
    val varS = when(n >= 2, round(num.cast("double") / den, 9))
    state.withColumn("mean_v", round(col("sum_q").cast("double") / (n.cast("double") * lit(1e6)), 9))
      .withColumn("var_v", varS)
      .withColumn("std_v", when(n >= 2, round(sqrt(num.cast("double") / den), 9)))
      .drop("sum_q", "sum_q2")
  }

  /** Incremental join-view maintenance for insert-only deltas: the
    * rows a materialized join view A⋈B GAINS when batches dA and dB
    * land — Δ(A⋈B) = dA⋈(B∪dB) ∪ A⋈dB, the classic delta rule with
    * the dA⋈dB cross term folded into the first join exactly once
    * (A and dA are disjoint by the insert-only contract, so the two
    * terms cannot overlap and the union is exact as a multiset).
    *
    * Why this beats recomputing the view: the full join re-emits (and
    * re-shuffles, or re-sorts into the sink layout) the ENTIRE view —
    * output ∝ |A⋈B|; the delta emits only the new rows — output ∝
    * fan-out of the deltas. Each base side is scanned at most once as
    * a probe-side stream, and when the deltas are batch-sized (the
    * norm: a day's landing against a years-deep view) AQE broadcasts
    * them, so NEITHER base table shuffles at all. The hint is NOT
    * forced (the q25 lesson): a backfill-sized delta degrades to a
    * plain shuffled join instead of OOMing the driver.
    *
    * Contract: deltas are pure inserts (no updates/deletes — route
    * those through [[applyChanges]] first) and disjoint from their
    * base by key-carrying row identity. Columns are aligned by name;
    * `on` names the shared equi-key columns.
    */
  def deltaJoin(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                on: Seq[String]): DataFrame = {
    require(on.nonEmpty, "deltaJoin: need at least one join key")
    require(aDelta.columns.toSeq == aOld.columns.toSeq &&
            bDelta.columns.toSeq == bOld.columns.toSeq,
      "deltaJoin: delta schema must match its base")
    aDelta.join(bOld.unionByName(bDelta), on)
      .unionByName(aOld.join(bDelta, on))
  }

  /** Incremental maintenance of an [[aggState]] under a CDC delta of
    * inserts AND deletes — the materialized-aggregate half of the
    * incremental-view story ([[deltaJoin]] is the join half): per-key
    * stats over a 100 TB corpus stay current by aggregating ONLY each
    * arriving delta (map-side, delta-sized) and folding it into the
    * persisted state; the corpus is never rescanned.
    *
    * Algebra: n and the quantized sum are abelian-group components, so
    * deletes subtract exactly — the maintained (n, sum_q) is
    * bit-identical to a from-scratch aggregation of the post-delta
    * corpus (spec-proven). min_v/max_v are only a SEMILATTICE (no
    * inverse): inserts fold in exactly, but deleting the extremum
    * cannot tighten the bound without a rescan, so after deletes they
    * remain CONSERVATIVE BOUNDS (stale min ≤ true min ≤ true max ≤
    * stale max) — still sound for pruning/z-maps, no longer exact
    * extrema; callers needing exact extrema after deletes recompute
    * those two columns (documented trade, the same one every
    * zone-map-maintaining system makes). Keys whose n reaches 0 drop
    * out of the state entirely.
    *
    * Contract: every D row must name a (key, value) actually present —
    * deleting a never-inserted row silently corrupts n/sum_q (the
    * inverse exists, the referent doesn't); that audit is
    * [[diffSnapshots]]'s job upstream.
    *
    * Scale shape: one delta-sized partial agg (signed addends built
    * map-side), then union + one state-keyed partial agg — the exact
    * [[mergeAggStates]] shuffle budget.
    */
  def applyAggDelta(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    valueCol: String, opCol: String): DataFrame = {
    val sign = when(col(opCol) === "D", lit(-1L))
      .when(col(opCol) === "I", lit(1L))
      .otherwise(raise_error(concat(lit("applyAggDelta: op must be I or D, got "), col(opCol))))
    val q = floor(col(valueCol).cast("double") * 1e6 + lit(0.5)).cast("decimal(20,0)")
    val deltaState = delta.groupBy(keys.map(col): _*).agg(
      sum(sign).as("n"),
      sum(sign.cast("decimal(20,0)") * q).cast("decimal(38,0)").as("sum_q"),
      // bounds fold over INSERTS only: a delete never tightens a bound
      min(when(col(opCol) === "I", col(valueCol))).as("min_v"),
      max(when(col(opCol) === "I", col(valueCol))).as("max_v"))
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_q").cast("decimal(38,0)").as("sum_q"),
           min("min_v").as("min_v"), max("max_v").as("max_v"))
      .filter(col("n") > 0)
  }

  /** Merge [[aggState]] tables: union + ONE partial agg re-combining
    * each component (counts and quantized sums add, min/max fold).
    * Keys absent from one side pass through untouched — no join, no
    * null-fill logic, because a missing state is simply the identity.
    * At 100 TB the inputs are state tables (|keys|-sized, not
    * corpus-sized); the merge shuffles only them.
    */
  def mergeAggStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAggStates: no states")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      // re-cast pins the schema across merge generations (sum over
      // decimal(38,0) would otherwise stay 38,0 but via Spark's
      // precision-widening rule — make the contract explicit)
      .agg(sum("n").as("n"), sum("sum_q").cast("decimal(38,0)").as("sum_q"),
           min("min_v").as("min_v"), max("max_v").as("max_v"))
  }
}
