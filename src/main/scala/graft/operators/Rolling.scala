package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding time-range aggregation: per-key trailing-window count and
  * sum at EVENT granularity ("activity in the last N minutes as of
  * each event") — the rate-limit / rolling-engagement / feature-
  * engineering primitive, and the event-time counterpart of the
  * tumbling streaming window (q20), which only emits per-bucket rows.
  *
  * Spark design: ONE window with a RANGE frame over the epoch-micros
  * ordering column — one shuffle on the key, a per-key sort, then a
  * running frame scan. Deliberately NOT the band-join formulation: a
  * self-join within ±width replicates every row per candidate pair,
  * while a RANGE frame is linear in the input. Frame peers (equal
  * timestamps) are included symmetrically by SQL RANGE semantics, so
  * ties cannot make the result partitioning-dependent.
  *
  * Scale: window tasks are bounded per key. For a Zipf-hot key the q64
  * bucketed decomposition applies (coarse time bucket + boundary
  * carry-in, where the carry is the frame aggregate at the bucket
  * edge); at this corpus' per-user volumes the plain form is the right
  * plan. The sum runs over DECIMAL so frame-scan order can never
  * drift a double.
  */
object Rolling {

  /** Appends `n_win` (trailing count) and `sum_win` (trailing DECIMAL
    * sum of `valueCol`, cast to double) over the last `width` time
    * units (inclusive of the current row's instant) per `keyCol`.
    */
  def trailing(df: DataFrame, keyCol: String, timeCol: String,
               width: Long, valueCol: String): DataFrame = {
    require(width > 0, "width must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol))
      .rangeBetween(-width, 0)
    // decimal cast BEFORE the window: both aggregates then share one
    // Window node (an inline cast splits them into two frame scans)
    df.withColumn("_vd", col(valueCol).cast("decimal(18,4)"))
      .select(df.columns.map(col) :+
        count(lit(1)).over(w).as("n_win") :+
        sum(col("_vd")).over(w).cast("double").as("sum_win"): _*)
  }

  /** Per-key fixed-step resampling with as-of forward fill: a uniform
    * time grid (step `stepUs`, anchored at multiples of the step)
    * spanning each key's observed range, each grid instant carrying the
    * most recent observation at-or-before it — the irregular-events →
    * regular-series primitive (feature snapshots, charting, downstream
    * joins on aligned time).
    *
    * Scale shape: per-key bounds are ONE partial agg (two longs per
    * key survive the combine); the grid explodes MAP-SIDE from that
    * key-sized table (span/step rows per key, a caller-controlled
    * density, never event-scaled); the fill is [[AsofJoin.asofJoin]] —
    * the one-shuffle union+window machinery, no per-grid-point probe
    * join. Grid anchoring is pure integer arithmetic (`pmod`), exact
    * on epoch-micros longs in both engines — never a floor of a double
    * quotient, which can misround at exact step boundaries.
    *
    * Returns one row per (key, grid instant): left columns
    * (`keyCol`, `grid_ts`) plus `payload` columns from the most recent
    * event at-or-before the instant (never null here: the grid starts
    * at the first event, so a predecessor always exists — but the
    * machinery is left-outer like merge_asof).
    */
  def resample(events: DataFrame, keyCol: String, timeCol: String,
               stepUs: Long, payload: Seq[String]): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val step = lit(stepUs)
    val bounds = events.groupBy(keyCol)
      .agg(min(timeCol).as("_t0"), max(timeCol).as("_t1"))
      .select(col(keyCol),
        (col("_t0") + pmod(step - pmod(col("_t0"), step), step)).as("_g0"),
        (col("_t1") - pmod(col("_t1"), step)).as("_g1"))
    val grid = bounds.filter(col("_g0") <= col("_g1"))
      .select(col(keyCol), explode(sequence(col("_g0"), col("_g1"), step)).as("grid_ts"))
    AsofJoin.asofJoin(grid, events, keyCol, "grid_ts", timeCol, payload)
  }
}
