package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filtered join: semi-join reduction of the FACT side before
  * the shuffle (scale addition). The middle regime Spark handles
  * worst: a dim side too large to broadcast but far smaller than the
  * fact, joined selectively — a plain sort-merge/shuffle-hash join
  * shuffles EVERY fact row, even the (often >90%) rows no dim key
  * matches. Building a bloom over the dim keys (a few MB at 10⁷ keys)
  * and filtering the fact map-side drops shuffle bytes by the join
  * selectivity — at 100 TB that is the difference between shuffling
  * 100 TB and shuffling the 3 TB that actually joins.
  *
  * Spark's AQE CAN inject exactly this (runtime row-level bloom), but
  * only when its cost heuristics fire; this operator is the explicit,
  * guaranteed form for pipelines that know their selectivity.
  *
  * Correctness: the bloom admits false POSITIVES only, and filtered
  * fact rows pass through the exact equality join afterwards — so the
  * result is exactly the plain join, for join types where dropping
  * never-matching fact rows is sound: `inner` and `left_semi`
  * (fact-preserving outer joins would LOSE the unmatched fact rows —
  * refused loudly). The dim-side aggregation to build the filter is
  * one partial agg; the filter itself ships as a literal byte array
  * inside the fact scan's codegen'd predicate (asserted map-only in
  * PlanSpec).
  *
  * Sizing follows the q57 rule: bits derive from an ABSOLUTE FP
  * budget (p = budget/|fact|), because FP cost scales with the fact
  * row count the filter inspects.
  */
object BloomJoin {

  /** Join `fact` to `dim` on equi-`keys` with a dim-key bloom pruning
    * the fact side first.
    *
    * @param joinType `inner` or `left_semi` (others refused: the
    *                 fact-side prefilter is unsound for them)
    * @param expectedDimKeys sizing estimate for the filter build;
    *                 `<= 0` (the default) sizes from `dim.count()` —
    *                 one metadata-cheap job over the SMALL side. The
    *                 old fixed 1e6 default built a ~3.6 MB filter
    *                 literal regardless of the dim's real size; that
    *                 literal rides the plan through codegen and every
    *                 AQE re-plan, and for a few-hundred-key dim the
    *                 measured cost was ~4 s of pure driver time per
    *                 query (taskTime 0.2 s) at sf0.1. Sizing from the
    *                 true count keeps the FP budget identical and the
    *                 filter cache-resident. Correctness is unaffected
    *                 either way (blooms only ever admit extra rows
    *                 into the exact join).
    * @param targetFpp       false-positive probability per fact row
    */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                        joinType: String = "inner",
                        expectedDimKeys: Long = 0L,
                        targetFpp: Double = 1e-6): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    require(keys.nonEmpty, "bloomFilteredJoin: no join keys")
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloomFilteredJoin: joinType '$joinType' would lose unmatched fact rows " +
      "under a fact-side prefilter; only inner/left_semi are sound")
    def keyHash(df: DataFrame): Column = xxhash64(keys.map(df(_)): _*)
    val maxBits = fact.sparkSession.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    // auto-size: one count over the small side (it is about to be
    // scanned for the filter build anyway); floor 1 keeps the
    // aggregate's own require(expectedNumItems > 0) satisfied on an
    // empty dim (whose null bloom short-circuits below regardless)
    val sizedKeys =
      if (expectedDimKeys > 0) expectedDimKeys else math.max(dim.count(), 1L)
    val bits = Dedup.deriveBloomBits(sizedKeys, targetFpp, maxBits)
    val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(keyHash(dim)),
      Literal(sizedKeys), Literal(bits)).toAggregateExpression())
    // one driver artifact of bits/8 bytes (the q57 pattern); null iff dim empty
    val bloomBytes = Option(dim.agg(bloomAgg.as("bf")).head.get(0))
      .map(_.asInstanceOf[Array[Byte]])
    val pruned = bloomBytes match {
      case None => fact.limit(0) // empty dim: inner/semi join is empty
      case Some(bytes) =>
        fact.filter(ColumnBridge.column(BloomFilterMightContain(
          Literal(bytes, BinaryType),
          ColumnBridge.expression(keyHash(fact)))))
    }
    pruned.join(dim, keys, joinType)
  }
}
