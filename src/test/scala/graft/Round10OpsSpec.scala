package graft

import org.apache.spark.sql.functions._

import graft.sources.TxTable

/** Round-10 lakehouse-substrate hardening: bloom probe/build parity,
  * value-set escaping, manifest delta-log, partitioned layout,
  * positional deletion vectors, mirror marker widening.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_r10_spec_").toString + "/t"

  // --- ADVICE r9 (medium): deleteKeysMor's driver-side bloom probe
  // must render keys exactly as the executor-built blooms did (Spark's
  // cast-to-string). java.sql.Timestamp.toString gives '... 00:00:00.0'
  // while Spark casts to '... 00:00:00' — with the old String.valueOf
  // probe, every candidate file was wrongly bloom-pruned and the
  // delete silently missed all rows.
  test("deleteKeysMor bloom probe uses Spark's string rendering (timestamp keys)") {
    val table = freshTable()
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2L),
      (java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 3L)
    ).toDF("ts", "v")
    TxTable.commit(df, table, bloomCols = Seq("ts"))
    val keys = Seq(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")).toDF("ts")
    val (v2, nDel) = TxTable.deleteKeysMor(spark, table, "ts", keys)
    nDel shouldBe 1L
    TxTable.readVersion(spark, table, v2).collect().map(_.getLong(1)).sorted shouldBe
      Seq(1L, 3L)
  }

  // --- directive r9#3: the per-commit bloom index aggregates its
  // bitsets executor-side (collect_set per file) — the driver receives
  // one row per new file. Byte-identity vs an independent driver-side
  // recompute of every file's bloom from the raw data.
  test("executor-built bloom sidecar is byte-identical to a driver recompute") {
    val table = freshTable()
    val df = (1L to 400L).map(i => (i, s"k$i")).toDF("id", "k")
      .repartition(4, col("id"))
    TxTable.commit(df, table, bloomCols = Seq("k"))
    val entries = TxTable.bloomEntries(spark, table, 1)
    entries.size shouldBe TxTable.filesOf(spark, table, 1).size
    entries.foreach { case (fl, c, m, k, b64) =>
      c shouldBe "k"
      val expected = new Array[Byte](m / 8)
      spark.read.parquet(s"$table/$fl").select(col("k").cast("string"))
        .collect().map(_.getString(0)).foreach { v =>
          TxTable.bloomBitsOf(v, m, k).foreach { b =>
            expected(b >> 3) = (expected(b >> 3) | (1 << (b & 7))).toByte
          }
        }
      b64 shouldBe java.util.Base64.getEncoder.encodeToString(expected)
    }
  }

  // --- ADVICE r9 (low): a data value containing the U+001F join
  // separator, a ']', or a backslash must round-trip through the
  // manifest value-set encoding and still prune exactly.
  test("value-set entries round-trip separator, bracket, and backslash in values") {
    val table = freshTable()
    val nasty = Seq("ab", "c]d", "e\\f", "plain", "\\s", "\\q")
    val df = nasty.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "cat")
      .coalesce(1)
    TxTable.commit(df, table, setCols = Seq("cat"))
    val vsets = TxTable.valueSetsOf(spark, table, 1)
    vsets.size shouldBe 1
    vsets.head._3.sorted shouldBe nasty.sorted
    // exact pruning: present values keep the file, absent values prune
    nasty.foreach { v =>
      TxTable.prunedFilesByValue(spark, table, 1, "cat", v).size shouldBe 1
      TxTable.readWhereValue(spark, table, "cat", v).count() shouldBe 1L
    }
    TxTable.prunedFilesByValue(spark, table, 1, "cat", "a") shouldBe empty
    TxTable.prunedFilesByValue(spark, table, 1, "cat", "b") shouldBe empty
  }

  // --- directive r9#2: the mirror txn marker is a STRING carrying the
  // upstream version — collision-free at any version count. The r9
  // numeric encoding gave the version 20 bits; at v = 2^20 the version
  // bled into the batchId bits and colliding markers made exactly-once
  // gating skip un-applied work.
  test("mirror txn markers stay distinct and exactly-once past 2^20 versions") {
    val vBig = 1 << 20
    val markers = Seq(vBig - 1, vBig, vBig + 1).flatMap(v =>
      Seq(graft.sources.TxChangesStream.mirrorMarker("app", v, del = false),
        graft.sources.TxChangesStream.mirrorMarker("app", v, del = true)))
    markers.distinct.size shouldBe markers.size
    // exactly-once through commitIdempotent at the huge version
    val table = freshTable()
    val df = Seq((1L, "a")).toDF("id", "s")
    val m = graft.sources.TxChangesStream.mirrorMarker("app", vBig, del = false)
    TxTable.commitIdempotent(df, table, m, 0L)._2 shouldBe true
    TxTable.commitIdempotent(df, table, m, 0L)._2 shouldBe false // replay skips
    val m1 = graft.sources.TxChangesStream.mirrorMarker("app", vBig + 1, del = false)
    TxTable.commitIdempotent(df, table, m1, 0L)._2 shouldBe true // distinct version applies
    TxTable.read(spark, table).count() shouldBe 2L
  }

  // --- directive r9#6: consecutive delete-free versions coalesce into
  // ONE idempotent commit per micro-batch — a K-version insert-only
  // backfill lands as ceil(K/mx) mirror commits, not K — while the
  // mirror still equals the source and a re-run is a no-op.
  test("pipeToMirror coalesces insert-only version runs into one commit per batch") {
    val src = freshTable()
    val dst = freshTable()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_r10_mir_ckpt_").toString
    val K = 6
    (1 to K).foreach(i =>
      TxTable.commit(Seq((i.toLong, s"a$i")).toDF("id", "s"), src))
    graft.sources.TxChangesStream.pipeToMirror(spark, src, dst, "id",
      "r10_runs", ckpt, maxVersionsPerTrigger = Some(2)) shouldBe K.toLong
    canon(TxTable.read(spark, dst)) shouldBe canon(TxTable.read(spark, src))
    TxTable.currentVersion(spark, dst) shouldBe 3 // ceil(6/2) commits, not 6
    // deletes still apply strictly ordered against the runs around them
    TxTable.deleteKeysMor(spark, src, "id", Seq(2L, 4L).toDF("id"))._2 shouldBe 2L
    TxTable.commit(Seq((7L, "a7")).toDF("id", "s"), src)
    graft.sources.TxChangesStream.pipeToMirror(spark, src, dst, "id",
      "r10_runs", ckpt)
    canon(TxTable.read(spark, dst)) shouldBe canon(TxTable.read(spark, src))
    // a re-run with nothing new is a full no-op
    graft.sources.TxChangesStream.pipeToMirror(spark, src, dst, "id",
      "r10_runs", ckpt) shouldBe 0L
    canon(TxTable.read(spark, dst)) shouldBe canon(TxTable.read(spark, src))
  }
}
