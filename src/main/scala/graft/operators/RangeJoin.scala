package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band (interval) join: pairs rows sharing equi-keys whose event times
  * lie within `gap` of each other — the "events within Δt" primitive
  * behind attribution, co-occurrence, and leakage checks.
  *
  * Spark has no native band-join strategy: a raw
  * `|lt - rt| <= gap` condition downgrades the join to
  * key-equi + per-key time filter, which is fine — unless keys are hot
  * (a hot key re-pairs all its rows). The scale form here is the
  * standard bucketing trick: quantize time into gap-width buckets, so a
  * qualifying pair is at most one bucket apart; the LEFT side probes its
  * own bucket ±1 (3 rows via explode), the RIGHT side keeps its single
  * bucket, and the join becomes a plain hash equi-join on
  * (keys, bucket) — shuffle keyed by (key, time-bucket), so even one
  * key's rows spread across reducers in time order. The exact
  * `|lt - rt| <= gap` residual filters the candidates; each true pair
  * is produced exactly once because the right row's bucket is unique
  * and the probe buckets are distinct.
  */
object RangeJoin {

  /** Exact floor(t / g) for long-valued times: the numerator is made an
    * exact multiple of g first, so the double division is exact (the
    * quotient is an integer well under 2^53 for any epoch-scaled time)
    * — no boundary flips, including negative times. Property-tested
    * against math.floorDiv in OperatorsSpec.
    */
  private[graft] def bucketOf(t: Column, g: Long): Column =
    ((t - pmod(t, lit(g))) / lit(g)).cast("long")

  /** Band join on `keyCols` with `|lTime - rTime| <= gap`.
    * `lTime`/`rTime` are long-valued event times (e.g. unix micros) in
    * the same unit as `gap`; non-key output columns of the two sides
    * must be disjoint.
    *
    * `how`: "inner" (default) or "left". The left-outer form cannot
    * ride the probe explode directly (an unmatched left row appears
    * under 3 probe buckets — a naive outer join would null-extend it 3
    * times), so it is the inner join plus the unmatched remainder:
    * match eligibility depends only on (keys, lTime), so the distinct
    * qualifying key-times from a slim probe join select the remainder
    * with one anti join — still hash-equi joins end to end, no
    * nested-loop fallback, no uniqueness requirement on left rows.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               lTime: String, rTime: String, gap: Long,
               how: String = "inner"): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    require(how == "inner" || how == "left", s"bandJoin supports inner/left, got '$how'")
    val lb = left.withColumn("_b0", bucketOf(col(lTime), gap))
      .withColumn("_bucket", explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    val rb = right.withColumn("_bucket", bucketOf(col(rTime), gap))
    val inner = lb.join(rb, keyCols :+ "_bucket")
      .filter(abs(col(lTime) - col(rTime)) <= gap)
      .drop("_bucket")
    if (how == "inner") return inner

    // distinct (keys, lTime) that found at least one in-band right row —
    // the probe join runs over the slim key-time projection, not payloads
    val lSlim = left.select((keyCols :+ lTime).map(col): _*).distinct()
      .withColumn("_b0", bucketOf(col(lTime), gap))
      .withColumn("_bucket", explode(array(col("_b0") - 1, col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    val qualified = lSlim.join(rb.select((keyCols :+ rTime :+ "_bucket").map(col): _*),
        keyCols :+ "_bucket")
      .filter(abs(col(lTime) - col(rTime)) <= gap)
      .select((keyCols :+ lTime).map(col): _*).distinct()
    val rightOnly = right.columns.filterNot(left.columns.contains).toSeq
    val unmatched = left.join(qualified, keyCols :+ lTime, "left_anti")
      .select(left.columns.toSeq.map(col) ++
        rightOnly.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    inner.unionByName(unmatched)
  }

  /** Point-in-interval join: left POINTS `tCol` paired with right
    * INTERVALS `[sCol, eCol]` (inclusive) sharing `keyCols` — the
    * event-in-session / reading-in-maintenance-window / date-in-
    * validity-period primitive. Where [[bandJoin]] pairs two point
    * sets within a gap, this joins against true spans of varying
    * length.
    *
    * A raw `s <= t AND t <= e` condition gives Catalyst no equi-key
    * beyond `keyCols` — fine until a key is hot, then one reducer
    * re-pairs everything. The scale form quantizes time into
    * `bucket`-width cells: each INTERVAL explodes to the cells it
    * overlaps (`sequence(cell(s), cell(e))` — fan-out = span/bucket+1,
    * so pick `bucket` near the typical span), each POINT keeps its one
    * cell, and the join is a plain hash equi-join on (keys, cell) +
    * the exact `BETWEEN` residual. Each true pair appears exactly once
    * (the point's single cell is covered by its interval exactly once).
    * The shuffle is keyed by (key, time-cell), so a hot key's rows
    * spread across reducers by time.
    *
    * Degenerate spans fail LOUDLY, not quadratically: an interval
    * overlapping more than `maxSpanBuckets` cells raises at runtime
    * (a year-long interval against a 1-minute bucket is a config
    * error — re-bucket, or split the pathological rows out), and
    * `e < s` intervals raise rather than silently match nothing.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                   tCol: String, sCol: String, eCol: String, bucket: Long,
                   maxSpanBuckets: Int = 1024,
                   broadcastMaxCells: Long = 500000L): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val b0 = bucketOf(col(sCol), bucket)
    val b1 = bucketOf(col(eCol), bucket)
    val guarded = when(col(eCol) < col(sCol),
        raise_error(format_string(s"intervalJoin: interval end < start (%s < %s)", col(eCol), col(sCol))).cast("long"))
      .when(b1 - b0 > maxSpanBuckets,
        raise_error(format_string(
          s"intervalJoin: interval spans %s buckets (> $maxSpanBuckets) — widen `bucket` or split outlier spans",
          (b1 - b0).cast("string"))).cast("long"))
      .otherwise(b1)
    val ib = intervals.withColumn("_bucket", explode(sequence(b0, guarded)))
    val pb = points.withColumn("_bucket", bucketOf(col(tCol), bucket))
    // Join strategy can't be left to Catalyst here: size estimates are
    // taken BEFORE the explode, so a fact-table interval side (orders
    // vs lineitem) still looks broadcastable and Spark statically
    // builds a hashed relation of |intervals| × fan-out rows on the
    // driver — linear driver memory, the one thing that cannot survive
    // a 100× scale-up (and AQE can demote SMJ→BHJ but never the
    // reverse). The gate counts EXPLODED CELLS (Σ span fan-out on a
    // pruned scan), not raw intervals — the broadcast pins the
    // post-explode frame, so 500k intervals × 1024-cell spans would
    // otherwise hint ~5×10⁸ rows onto the driver, the exact OOM this
    // branch exists to prevent. Small dim-table intervals broadcast
    // (ideal — points never shuffle); anything bigger goes sort-merge
    // on (keys, time-cell), which spills gracefully at any scale.
    val cells = Option(intervals
        .agg(sum(greatest(b1 - b0, lit(0L)) + 1).as("c")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val ibSized =
      if (cells <= broadcastMaxCells) broadcast(ib)
      else ib.hint("merge")
    pb.join(ibSized, keyCols :+ "_bucket")
      .filter(col(sCol) <= col(tCol) && col(tCol) <= col(eCol))
      .drop("_bucket")
  }

  /** Interval×interval OVERLAP join: all pairs of [ls,le] × [rs,re]
    * spans sharing equi-keys with a non-empty closed-interval overlap
    * (ls ≤ re AND rs ≤ le) — concurrent-session detection, validity-
    * period conflicts, booking collisions. Completes the interval
    * family: [[intervalJoin]] is point-in-span, `Rolling
    * .mergeIntervals` is span-union; this is span-meets-span.
    *
    * Scale shape: BOTH sides explode to their gap-width cells and
    * hash-equi-join on (keys, cell) — same shuffle key as
    * intervalJoin, hot keys spread by time. An overlapping pair
    * shares every cell in the overlap, so naive cell-join output
    * needs a dedup shuffle; instead each pair is emitted EXACTLY ONCE
    * with zero extra shuffle by keeping only the cell containing
    * max(ls, rs) — the overlap's first instant, which lies in both
    * spans by definition, so its cell is always in both cell lists.
    * Degenerate spans fail LOUDLY (the intervalJoin guard: e < s and
    * spans past `maxSpanBuckets` raise, never go quadratic); the
    * join strategy is picked from an un-exploded count for the same
    * driver-safety reason as intervalJoin.
    *
    * Non-key columns of the two sides must be disjoint (caller
    * aliases); self-joins pass the same frame twice with aliased
    * payloads and filter an id order afterwards.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                          lsCol: String, leCol: String, rsCol: String, reCol: String,
                          bucket: Long, maxSpanBuckets: Int = 1024,
                          broadcastMaxCells: Long = 500000L): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val dup = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(dup.isEmpty, s"non-key columns must be disjoint; shared: $dup")
    def explodeCells(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = bucketOf(col(s), bucket)
      val b1 = bucketOf(col(e), bucket)
      val guarded = when(col(e) < col(s),
          raise_error(format_string(
            s"intervalOverlapJoin: interval end < start (%s < %s)", col(e), col(s))).cast("long"))
        .when(b1 - b0 > maxSpanBuckets,
          raise_error(format_string(
            s"intervalOverlapJoin: interval spans %s buckets (> $maxSpanBuckets) — widen `bucket` or split outlier spans",
            (b1 - b0).cast("string"))).cast("long"))
        .otherwise(b1)
      df.withColumn("_bucket", explode(sequence(b0, guarded)))
    }
    val lb = explodeCells(left, lsCol, leCol)
    val rb = explodeCells(right, rsCol, reCol)
    // Same exploded-cell gate as intervalJoin: the hint pins the
    // post-explode frame, so the bound must be on cells, not rows.
    val rCells = Option(right
        .agg(sum(greatest(bucketOf(col(reCol), bucket) - bucketOf(col(rsCol), bucket), lit(0L)) + 1)
          .as("c")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val rbSized =
      if (rCells <= broadcastMaxCells) broadcast(rb)
      else rb.hint("merge")
    lb.join(rbSized, keyCols :+ "_bucket")
      .filter(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol) &&
        col("_bucket") === bucketOf(greatest(col(lsCol), col(rsCol)), bucket))
      .drop("_bucket")
  }
}
