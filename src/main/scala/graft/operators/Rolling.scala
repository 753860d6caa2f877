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
}
