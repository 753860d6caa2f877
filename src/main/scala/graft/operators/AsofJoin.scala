package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * right.time <= left.time within the same key (the time-series join
  * Spark lacks natively; DuckDB spells it ASOF JOIN).
  *
  * Implemented as union + window rather than a range join: a range
  * condition in a join predicate degenerates to a per-key nested loop
  * (O(|L|·|R|) within each key), while the union-window form is
  * sort-based — ONE shuffle of L∪R on the key, a per-key time sort,
  * and `last(ignoreNulls)` carrying the latest right payload forward.
  * O((|L|+|R|) log) per key, no pair blowup on dense keys, and the
  * window sort feeds straight from the exchange (no extra pass).
  *
  * The right payload travels as ONE struct (not per-column carries):
  * `last(..., ignoreNulls)` must look through missing rows, never
  * through a legitimately-NULL field of a present row — a struct is
  * non-null whenever the right row exists, so all payload fields come
  * from the same matched row.
  *
  * Ties (equal timestamps) order the right row FIRST (`_src` 0 before
  * 1), so a right row at exactly left.time matches — ASOF's `<=`
  * convention, matching DuckDB.
  */
object AsofJoin {

  /** `tolerance`: optional upper bound on `leftTime - matchTime` — a
    * match older than the tolerance is nulled out (pandas
    * `merge_asof(tolerance=...)`). Because the carried right row is
    * always the LATEST at-or-before, "latest within tolerance" and
    * "latest, nulled when too old" coincide — so the bound is one
    * post-window conditional, not a second join. Pass a literal in the
    * time columns' difference type (an INTERVAL expr for timestamps, a
    * long for numeric times).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val payloadT = struct(rightPayload.map(col): _*)

    val l = left
      .withColumn("_t", col(leftTime)).withColumn("_src", lit(1))
      .withColumn("_p", lit(null).cast(right.select(payloadT).schema.head.dataType))
    val r = right
      .select(col(key), col(rightTime).as("_t"), lit(0).as("_src"), payloadT.as("_p"))
      .withColumns(lCols.filterNot(_ == key).map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select(lCols.map(col) :+ col("_t") :+ col("_src") :+ col("_p"): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
    // the matched row's own time rides the same window (same ordering →
    // same row as _m), so the tolerance gate needs no extra pass
    val gated = tolerance match {
      case Some(tol) => matched
        .withColumn("_mt", last(when(col("_src") === 0, col("_t")), ignoreNulls = true).over(w))
        .withColumn("_m", when(col("_t") - col("_mt") <= tol, col("_m")))
      case None => matched
    }
    gated.filter(col("_src") === 1)
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** FORWARD as-of join: each left row matched to the EARLIEST right
    * row at-or-after it (pandas merge_asof direction='forward' — "the
    * next purchase after this click"). Pure duality: forward on t is
    * backward on −t, so the one-shuffle union+window machinery and its
    * tolerance gate are reused verbatim on negated times — at equal
    * times the right row still sorts first (≥ includes equality), and
    * the backward gate _t−_mt ≤ tol becomes exactly the forward bound
    * rt−lt ≤ tol. Time columns must be NUMERIC (unix_micros first);
    * a right-time column in the payload is un-negated on the way out
    * (null stays null for unmatched rows).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      key: String, leftTime: String, rightTime: String,
                      rightPayload: Seq[String],
                      tolerance: Option[Column] = None): DataFrame = {
    val out = asofJoin(
      left.withColumn(leftTime, -col(leftTime)),
      right.withColumn(rightTime, -col(rightTime)),
      key, leftTime, rightTime, rightPayload, tolerance)
    val restored = out.withColumn(leftTime, -col(leftTime))
    if (rightPayload.contains(rightTime))
      restored.withColumn(rightTime, -col(rightTime))
    else restored
  }

  /** NEAREST as-of join: each left row matched to the right row whose
    * time is CLOSEST in either direction (pandas merge_asof
    * direction='nearest'); on an exact-distance tie the backward
    * (earlier) match wins — the deterministic convention, mirrored in
    * the oracle's ORDER BY (abs(dt), rt).
    *
    * Both directional carries come from ONE union and ONE hash
    * exchange on the key: the ascending window yields the latest
    * at-or-before payload (exactly [[asofJoin]]'s carry), and a second
    * window over the SAME partitioning sorted descending yields the
    * earliest at-or-after (right rows sort before left rows at equal
    * times in BOTH orders, so an equal-time right is eligible both
    * ways). Two Sort nodes, one Exchange — never a second shuffle, and
    * never the O(|L|·|R|) per-key blowup of an abs-difference range
    * join. The per-row winner is a null-safe comparison of the two
    * carried times; `tolerance` bounds |leftTime − matchTime| on each
    * side before the comparison.
    *
    * Time columns must be NUMERIC (unix_micros first) — distances
    * subtract as longs.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame,
                      key: String, leftTime: String, rightTime: String,
                      rightPayload: Seq[String],
                      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val payloadT = struct(rightPayload.map(col): _*)

    val l = left
      .withColumn("_t", col(leftTime).cast("long")).withColumn("_src", lit(1))
      .withColumn("_p", lit(null).cast(right.select(payloadT).schema.head.dataType))
    val r = right
      .select(col(key), col(rightTime).cast("long").as("_t"), lit(0).as("_src"), payloadT.as("_p"))
      .withColumns(lCols.filterNot(_ == key).map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select(lCols.map(col) :+ col("_t") :+ col("_src") :+ col("_p"): _*)

    val wB = Window.partitionBy(col(key)).orderBy(col("_t").asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key)).orderBy(col("_t").desc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = l.unionByName(r)
      .withColumn("_pb", last(col("_p"), ignoreNulls = true).over(wB))
      .withColumn("_bt", last(when(col("_src") === 0, col("_t")), ignoreNulls = true).over(wB))
      .withColumn("_pf", last(col("_p"), ignoreNulls = true).over(wF))
      .withColumn("_ft", last(when(col("_src") === 0, col("_t")), ignoreNulls = true).over(wF))
    val gated = tolerance match {
      case Some(tol) => both
        .withColumn("_pb", when(col("_t") - col("_bt") <= tol, col("_pb")))
        .withColumn("_bt", when(col("_t") - col("_bt") <= tol, col("_bt")))
        .withColumn("_pf", when(col("_ft") - col("_t") <= tol, col("_pf")))
        .withColumn("_ft", when(col("_ft") - col("_t") <= tol, col("_ft")))
      case None => both
    }
    val takeBack = col("_ft").isNull ||
      (col("_bt").isNotNull && (col("_t") - col("_bt")) <= (col("_ft") - col("_t")))
    gated.filter(col("_src") === 1)
      .withColumn("_m", when(takeBack, col("_pb")).otherwise(col("_pf")))
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Hot-key variant: [[asofJoin]] sorts EACH key's full history in one
    * window task — a Zipf-hot key (one user = 10% of a 100 TB stream)
    * serializes there, and AQE's skew splitting does not apply to
    * windows. Here the window partition is (key, coarse time bucket):
    * per-task sorts are bounded by a bucket's rows, and cross-bucket
    * correctness is restored by CARRYING IN each bucket's predecessor
    * state — the latest right row over all earlier buckets. The carry
    * is computed on a per-(key, bucket) aggregate (map-side-combinable
    * `max_by`) plus one spine window over BUCKET IDS (rows = buckets
    * present, never event rows), then injected as a synthetic row
    * sorting before everything in its bucket (`_src` -1 at the bucket
    * start; its TRUE time rides separately for the tolerance gate).
    *
    * Times must be numeric (cast timestamps with `unix_micros` first);
    * `bucketWidth` shares their unit. Buckets floor correctly for
    * negative times (the pmod trick, as in RangeJoin). A key hot at a
    * single INSTANT still lands in one bucket — bucketing spreads
    * time-spread hot keys, the Zipf-user shape.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame,
                       key: String, leftTime: String, rightTime: String,
                       rightPayload: Seq[String],
                       bucketWidth: Long,
                       tolerance: Option[Column] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val lCols = left.columns.toSeq
    val payloadT = struct(rightPayload.map(col): _*)
    val pType = right.select(payloadT).schema.head.dataType
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / bucketWidth).cast("long")
    val nullLCols = lCols.filterNot(_ == key)
      .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap
    val shape: Seq[Column] =
      lCols.map(col) ++ Seq(col("_t"), col("_rt"), col("_src"), col("_p"), col("_b"))

    val l = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_rt", lit(null).cast("long"))
      .withColumn("_src", lit(1))
      .withColumn("_p", lit(null).cast(pType))
      .withColumn("_b", bucketOf(col("_t")))
      .select(shape: _*)
    val r = right
      .select(col(key), col(rightTime).cast("long").as("_t"),
        col(rightTime).cast("long").as("_rt"), lit(0).as("_src"), payloadT.as("_p"))
      .withColumn("_b", bucketOf(col("_t")))
      .withColumns(nullLCols)
      .select(shape: _*)

    // latest right row per (key, bucket) — partial-agg, then the spine
    // window turns it into "latest right row of any EARLIER bucket"
    val rAgg = r.groupBy(col(key), col("_b"))
      .agg(max_by(struct(col("_rt"), col("_p")), col("_t")).as("_last"))
    val spine = l.select(col(key), col("_b")).distinct()
      .unionByName(rAgg.select(col(key), col("_b")))
      .distinct()
      .join(rAgg, Seq(key, "_b"), "left")
    val wSpine = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = spine
      .withColumn("_c", last(col("_last"), ignoreNulls = true).over(wSpine))
      .filter(col("_c").isNotNull)
      .select(col(key), (col("_b") * bucketWidth).as("_t"),
        col("_c._rt").as("_rt"), lit(-1).as("_src"), col("_c._p").as("_p"), col("_b"))
      .withColumns(nullLCols)
      .select(shape: _*)

    val w = Window.partitionBy(col(key), col("_b")).orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r).unionByName(carries)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case Some(tol) => matched
        .withColumn("_mt", last(when(col("_src") <= 0, col("_rt")), ignoreNulls = true).over(w))
        .withColumn("_m", when(col("_t") - col("_mt") <= tol, col("_m")))
      case None => matched
    }
    gated.filter(col("_src") === 1)
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"_m.$c").as(c)): _*)
  }
}
