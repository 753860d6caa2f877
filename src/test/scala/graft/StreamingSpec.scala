package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming surface (SURVEY.md §2 #27-28): pure sessionization logic
  * unit-tested exhaustively; the full streaming pipelines run against the
  * sf0.001 events table and are cross-checked with the equivalent batch
  * aggregation (the same oracle shape the driver uses).
  */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val MIN30 = 30L * 60 * 1000 * 1000

  test("splitSessions: empty, single, gap-split, and numbering") {
    Events.splitSessions(1L, Array.empty, MIN30) shouldBe Nil

    val one = Events.splitSessions(1L, Array(100L), MIN30)
    one.map(s => (s.session_id, s.n_events, s.start_us, s.end_us)) shouldBe Seq((1, 1L, 100L, 100L))

    // two events exactly at the gap stay together; one past it splits
    val atGap = Events.splitSessions(1L, Array(0L, MIN30), MIN30)
    atGap.size shouldBe 1
    val past = Events.splitSessions(1L, Array(0L, MIN30 + 1), MIN30)
    past.size shouldBe 2
    past.map(_.session_id) shouldBe Seq(1, 2)

    // unsorted input is sorted before splitting
    val unsorted = Events.splitSessions(7L, Array(MIN30 * 4, 0L, 10L), MIN30)
    unsorted.map(s => (s.session_id, s.n_events)) shouldBe Seq((1, 2L), (2, 1L))
    unsorted.head.start_us shouldBe 0L
  }

  test("streaming hourly window agg equals the batch aggregation") {
    val streamed = Events.hourlyByType(spark, s"$sfDir/events.parquet")
    val batch = Events.readBatch(spark, s"$sfDir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    canon(streamed) shouldBe canon(batch)
  }

  test("streaming dedup collapses a doubled stream to the distinct set") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.streaming.Events.streamDedup(spark, s"$dir/events.parquet")
    val batch = graft.streaming.Events.readBatch(spark, s"$dir/events.parquet")
    out.count() shouldBe batch.count()
    out.select("user_id", "ts").distinct().count() shouldBe batch.count()
  }

  test("streaming sessionization matches the batch lag/cumsum computation") {
    val streamed = Events.sessionize(spark, s"$sfDir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("tus")
    val batch = Events.readBatch(spark, s"$sfDir/events.parquet")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("new_s",
        when(lag("tus", 1).over(w).isNull || col("tus") - lag("tus", 1).over(w) > MIN30, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_s").over(w.rowsBetween(Long.MinValue, 0)).cast("int"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           timestamp_micros(min("tus")).as("session_start"),
           timestamp_micros(max("tus")).as("session_end"))
    canon(streamed) shouldBe canon(batch)
  }
}
