package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the `events` table.
  *
  * The reference has no streaming surface; these are the scale
  * additions (SURVEY.md §2 #27-28): a file-source stream driven
  * synchronously for tests, identical plan to what a production
  * `readStream` on object storage would run.
  */
object Events {

  /** Tumbling 1-hour windowed counts/sums per event_type.
    *
    * Test path runs `complete` mode over a memory sink so every window
    * is emitted for the batch-SQL oracle compare. At scale the same
    * plan runs `append` with `withWatermark(ts, ...)` so state is
    * bounded — pass `watermark=Some("2 hours")`.
    */
  def hourlyByType(spark: SparkSession, eventsPath: String,
                   watermark: Option[String] = None): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    val stream0 = spark.readStream.schema(schema).parquet(eventsPath)
    val stream = watermark.fold(stream0)(w => stream0.withWatermark("ts", w))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,4)")).as("sum_value_d"))
    val name = "graft_hourly_" + UUID.randomUUID().toString.replace("-", "")
    val mode = if (watermark.isEmpty) "complete" else "append"
    val q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).select(
      col("window.start").as("hour_start"), col("event_type"),
      col("n_events"), col("sum_value_d").cast("double").as("sum_value"))
  }
}
