package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Streaming CDC SOURCE over a [[TxTable]] — the inverse of the
  * exactly-once sink (`Events.streamIntoTx`), closing the incremental
  * loop stream → table → stream. This is the Delta streaming-source
  * shape (Armbrust et al., VLDB'20 §4.3): STREAM OFFSETS ARE COMMITTED
  * VERSIONS — `getOffset` reads one manifest listing (no data IO),
  * and each micro-batch replays `TxTable.changes(fromV, toV)` tagged
  * with `_change` / `_version` / `_commit_ms`. Restart-resume is free:
  * the engine's checkpoint stores the last version offset, so a
  * restarted query replays exactly the unconsumed commits.
  *
  * Scale shape: a poll costs one directory listing of the (retention-
  * bounded) manifest dir; a batch reads ONLY the delta's files (an
  * append's new files; an overwrite/merge/delete reads the touched
  * snapshots — exactly where the semantics put the cost). The schema
  * is pinned at stream start from the head snapshot + the three CDC
  * columns; compact commits are dataChange=false and replay as
  * nothing.
  *
  * Spark-first plumbing: a DSv1 [[Source]] (the stable connector
  * surface whose `getBatch` returns a DataFrame — the natural fit
  * when the delta IS a composable frame), registered through
  * `StreamSourceProvider`, so the user-facing call is plain
  * `spark.readStream.format(...)`: see [[TxChangesStream.readChangesStream]].
  */
class TxChangesSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "tx-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), TxChangesStream.schemaFor(ctx.sparkSession,
      TxChangesStream.tableOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new TxChangesSource(ctx.sparkSession, TxChangesStream.tableOf(parameters),
      parameters.getOrElse("startingVersion", "0").toInt,
      parameters.get("maxVersionsPerTrigger").map(_.toInt), metadataPath,
      schema) // sourceSchema already planned it — don't re-read footers
}

/** Offset = the largest committed version this stream has consumed.
  * Equality/serialization ride the engine's json contract.
  */
case class TxVersionOffset(v: Int) extends Offset {
  override def json: String = v.toString
}

private[graft] class TxChangesSource(spark: SparkSession, table: String,
                                     startV: Int, maxVersionsPerTrigger: Option[Int],
                                     metadataPath: String,
                                     pinned: Option[StructType] = None) extends Source {
  override val schema: StructType =
    pinned.getOrElse(TxChangesStream.schemaFor(spark, table))

  // Rate-limit bookkeeping (the FileStreamSource pattern): the last
  // OFFERED version persists in the source's own metadata dir, so a
  // restart resumes the throttle from ≥ the engine's committed offset
  // (we persist BEFORE offering — an offer can replay after a crash,
  // never rewind; the engine's offset log keeps delivery exactly-once).
  private val offeredPath = new org.apache.hadoop.fs.Path(metadataPath, "graft_last_offered")
  private def fsys = offeredPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def readOffered(): Int =
    try {
      val in = fsys.open(offeredPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    } catch { case _: java.io.IOException => startV }
  private def writeOffered(v: Int): Unit = {
    val out = fsys.create(offeredPath, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** One manifest-dir listing; None until a version past `startV`
    * exists. With `maxVersionsPerTrigger`, advance at most that many
    * commits per micro-batch (the Delta source's rate-limit knob —
    * bounds replay-batch size when a stream starts against a long
    * history).
    */
  override def getOffset: Option[Offset] = {
    val cur = TxTable.currentVersion(spark, table)
    val floor = math.max(startV, maxVersionsPerTrigger.fold(startV)(_ => readOffered()))
    val next = maxVersionsPerTrigger.fold(cur)(mx => math.min(cur, floor + mx))
    if (next <= startV) None
    else {
      if (maxVersionsPerTrigger.isDefined && next > floor) writeOffered(next)
      Some(TxVersionOffset(math.max(next, floor)))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(_.json.toInt).getOrElse(startV)
    TxChangesStream.batchFor(spark, table, from, end.json.toInt, schema)
  }

  override def stop(): Unit = ()
}

object TxChangesStream {

  private[graft] def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table",
      sys.error("tx-changes source requires .option(\"table\", <path>)"))

  /** Stream schema, pinned at start: the head snapshot's data columns
    * + (_change, _version, _commit_ms). A table evolved mid-stream
    * keeps emitting the pinned shape (restart the stream to pick up
    * added columns — the Delta source rule).
    */
  def schemaFor(spark: SparkSession, table: String): StructType = {
    val v = TxTable.currentVersion(spark, table)
    require(v >= 1, s"tx-changes: no committed version at $table to stream from")
    StructType(TxTable.readVersion(spark, table, v).schema.fields ++ Seq(
      StructField("_change", StringType, nullable = false),
      StructField("_version", IntegerType, nullable = false),
      StructField("_commit_ms", LongType, nullable = true)))
  }

  /** One micro-batch: the exact `changes(from, to)` delta + per-version
    * commit time (a tiny driver-side manifest map, broadcast as a map
    * literal), re-tagged streaming for the engine.
    */
  private[graft] def batchFor(spark: SparkSession, table: String, from: Int,
                              to: Int, schema: StructType): DataFrame = {
    val ms = ((from + 1) to to).map(v => v -> TxTable.commitMsOf(spark, table, v)).toMap
    val delta = TxTable.changes(spark, table, from, to)
      .withColumn("_commit_ms", element_at(typedlit(ms), col("_version")))
    // align to the PINNED schema: a batch replayed across a schema
    // evolution (restart re-pins from the evolved head, then re-runs
    // an uncommitted pre-evolution batch) surfaces added columns as
    // typed NULLs — the ALTER TABLE ADD COLUMN semantics the evolved
    // table itself has
    val cols = schema.fields.map { f =>
      if (delta.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    org.apache.spark.sql.graft.ColumnBridge.asStreaming(
      delta.select(cols.toIndexedSeq: _*))
  }

  /** The user-facing entry — `readStream` over a TxTable's commit log:
    * {{{
    *   TxChangesStream.readChangesStream(spark, path)
    *     .writeStream.option("checkpointLocation", ckpt)...
    * }}}
    * `startingVersion` replays history from that version (exclusive);
    * 0 = from the beginning (Delta's startingVersion semantics).
    */
  def readChangesStream(spark: SparkSession, table: String,
                        startingVersion: Int = 0,
                        maxVersionsPerTrigger: Option[Int] = None): DataFrame = {
    val rd = spark.readStream.format(classOf[TxChangesSourceProvider].getName)
      .option("table", table)
      .option("startingVersion", startingVersion.toString)
    maxVersionsPerTrigger.fold(rd)(mx =>
      rd.option("maxVersionsPerTrigger", mx.toString)).load()
  }

  /** The full incremental pipeline, composed end-to-end: stream the
    * CDC of `srcTable`, apply `transform` per micro-batch, land the
    * result in `dstTable` through `commitIdempotent` — CDC SOURCE
    * (this file) → exactly-once SINK (the q293 contract) in one call.
    * This is the continuous-materialization shape (a downstream table
    * that tracks an upstream one at batch cost): offsets ride the
    * engine checkpoint, dedup ledger IS dstTable's manifest log, so a
    * crash anywhere replays into a no-op. Insert-only consumption
    * (the appending-source case); a row-level merge consumer composes
    * `TxTable.mergeInto` in its own foreachBatch instead.
    *
    * @return the number of micro-batches that actually committed
    */
  def pipeTo(spark: SparkSession, srcTable: String, dstTable: String,
             appId: String, transform: DataFrame => DataFrame,
             checkpoint: String, startingVersion: Int = 0,
             maxVersionsPerTrigger: Option[Int] = None): Long = {
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = readChangesStream(spark, srcTable, startingVersion, maxVersionsPerTrigger)
      .writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = transform(batch.filter(org.apache.spark.sql.functions
          .col("_change") === "insert"))
        if (!out.isEmpty) {
          val (_, didApply) = TxTable.commitIdempotent(out, dstTable, appId, batchId)
          if (didApply) { applied.incrementAndGet(); () }
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    applied.get()
  }

  /** Synchronous replay harness (the Events.runToMemory shape): drive
    * the change stream through all currently-committed versions into a
    * memory sink and return the materialized frame. Test/oracle-side
    * by design — production attaches `readChangesStream` to a real
    * sink with a durable checkpoint.
    */
  def replayAll(spark: SparkSession, table: String,
                startingVersion: Int = 0,
                checkpoint: Option[String] = None): DataFrame = {
    val name = "graft_txcdc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val shm = java.nio.file.Paths.get("/dev/shm")
    val ckpt = checkpoint.getOrElse((if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft_ckpt_")
    else java.nio.file.Files.createTempDirectory("graft_ckpt_")).toString)
    val q = readChangesStream(spark, table, startingVersion)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    // a caller-provided checkpoint is durable state; the throwaway
    // temp one cleans up here (the Events.runToMemory rule)
    if (checkpoint.isEmpty) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator().asScala
        .toSeq.reverse.foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    spark.table(name)
  }
}
