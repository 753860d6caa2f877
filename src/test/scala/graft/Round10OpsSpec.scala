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

  // --- directive r9#1: manifest delta-log + checkpointing. A commit
  // that carries its parent's files writes an O(delta) manifest; the
  // proof of independence is EQUALITY of the append-manifest bytes
  // across tables whose file counts differ 2x (plus a fixed absolute
  // bound) — the pre-delta design rendered the full file list, so
  // bytes grew linearly with the table.
  test("delta-log: a 1-file append's manifest bytes are independent of table file count") {
    def appendManifestBytes(nFiles: Int): Long = {
      val table = freshTable()
      val big = spark.range(1000L).toDF("id").withColumn("v", col("id") * 2)
        .repartition(nFiles)
      TxTable.commit(big, table, statsCols = Seq("id")) // v1 checkpoint
      TxTable.commit(spark.range(1L).toDF("id").withColumn("v", lit(0L)).coalesce(1),
        table, statsCols = Seq("id")) // v2 delta: ONE added file
      TxTable.filesOf(spark, table, 2).size shouldBe nFiles + 1
      new java.io.File(s"$table/_manifests/v2.json").length()
    }
    val m120 = appendManifestBytes(120)
    val m240 = appendManifestBytes(240)
    m240 shouldBe m120 // byte-for-byte size parity at 2x the file count
    assert(m120 < 4096L, s"delta manifest unexpectedly large: $m120 bytes")
  }

  // The checkpoint cadence bounds every reconstruction walk: v10 is a
  // full (self-contained) manifest, v2..v9 and v11 are deltas, and
  // resolved state through the chain equals per-version expectations.
  test("delta-log reconstruction: checkpoint at the cadence, deltas between, state exact") {
    val table = freshTable()
    (1 to 11).foreach(i =>
      TxTable.commit(Seq((i.toLong, s"s$i")).toDF("id", "s"), table,
        statsCols = Seq("id"), bloomCols = Seq("id")))
    def txt(v: Int) = {
      val src = scala.io.Source.fromFile(s"$table/_manifests/v$v.json", "UTF-8")
      try src.mkString finally src.close()
    }
    txt(1) should include ("\"files\":[")   // first commit: checkpoint
    (2 to 9).foreach { v => txt(v) should include (s"\"base\":${v - 1}") }
    txt(10) should include ("\"files\":[")  // cadence checkpoint
    txt(10) should not include ("\"base\":")
    txt(11) should include ("\"base\":10") // delta over the checkpoint
    // resolved state: files accumulate, stats/blooms cover every file
    (1 to 11).foreach { v =>
      TxTable.filesOf(spark, table, v).size shouldBe v
      TxTable.statsOf(spark, table, v).size shouldBe v
      TxTable.readVersion(spark, table, v).count() shouldBe v.toLong
    }
    // skipping still exact through the chain: the id=7 probe keeps
    // only files whose bloom admits it, and the read returns the row
    val kept = TxTable.prunedFilesByKey(spark, table, 11, "id", "7")
    kept should contain (TxTable.filesOf(spark, table, 7).diff(
      TxTable.filesOf(spark, table, 6)).head)
    TxTable.readWhereKey(spark, table, "id", "7").count() shouldBe 1L
    // restore over a delta version is a full manifest and reads whole
    val rv = TxTable.restore(spark, table, 6)
    TxTable.readVersion(spark, table, rv).count() shouldBe 6L
  }

  // Retention honors the checkpoint boundary: expiring must never
  // strand a kept version's delta chain, so the floor is the oldest
  // kept version's base checkpoint — at most one checkpoint interval
  // of extra (kilobyte) manifests.
  test("expireVersions keeps every link of a kept delta chain") {
    val table = freshTable()
    (1 to 12).foreach(i =>
      TxTable.commit(Seq((i.toLong, s"s$i")).toDF("id", "s"), table))
    val (expired, _) = TxTable.expireVersions(spark, table, keepLast = 1)
    expired shouldBe (1 to 9)
    TxTable.liveVersions(spark, table) shouldBe Seq(10, 11, 12)
    // the kept delta chain (12 -> 11 -> 10) resolves fully
    TxTable.read(spark, table).count() shouldBe 12L
    TxTable.readVersion(spark, table, 11).count() shouldBe 11L
    TxTable.readVersion(spark, table, 10).count() shouldBe 10L
    // expired versions fail loudly
    intercept[IllegalArgumentException] { TxTable.readVersion(spark, table, 9) }
    // expiring again with the same policy is a no-op
    TxTable.expireVersions(spark, table, keepLast = 1) shouldBe
      ((Seq.empty, Seq.empty))
  }

  // --- directive r9#4: partitioned TxTable layout — hive-style
  // data/<col>=<val>/ files, the partition column recorded in the
  // manifest, reads re-deriving the column from the path.
  test("partitioned commit: layout on disk, schema round-trip, partition-pruned read") {
    val table = freshTable()
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "C", 40.0))
      .toDF("id", "cat", "price")
    TxTable.commit(df, table, statsCols = Seq("id"), partitionBy = Some("cat"))
    TxTable.partColOf(spark, table, 1) shouldBe Some("cat")
    // every data file nests under its partition directory
    val files = TxTable.filesOf(spark, table, 1)
    files.foreach(_ should startWith regex "data/cat=[ABC]/")
    // full read: content AND schema (order + type) round-trip
    val rd = TxTable.read(spark, table)
    rd.columns.toSeq shouldBe Seq("id", "cat", "price")
    rd.schema("cat").dataType.typeName shouldBe "string"
    canon(rd) shouldBe canon(df)
    // partition-pruned read: exactly the partition's files, manifest-only
    val a = TxTable.readPartition(spark, table, "A")
    canon(a) shouldBe canon(df.filter(col("cat") === "A"))
    TxTable.readPartition(spark, table, "nope").count() shouldBe 0L
    // appends INHERIT the layout without re-declaring it
    TxTable.commit(Seq((5L, "B", 50.0)).toDF("id", "cat", "price"), table,
      statsCols = Seq("id"))
    TxTable.filesOf(spark, table, 2).diff(files)
      .foreach(_ should startWith ("data/cat=B/"))
    TxTable.readPartition(spark, table, "B").count() shouldBe 2L
    // a layout change on a carrying commit refuses loudly
    val ex = intercept[IllegalArgumentException] {
      TxTable.commit(Seq((6L, "D", 60.0)).toDF("id", "cat", "price"), table,
        partitionBy = Some("id"))
    }
    ex.getMessage should include ("layout")
  }

  // Disjoint-partition appends auto-rebase: the loser of the version
  // CAS renames its staged partition files to the next version (the
  // AddFile-only conflict-freedom rule) — both writers land.
  test("concurrent appends to different partitions both land via rebase") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "A", 1.0)).toDF("id", "cat", "price"), table,
      partitionBy = Some("cat"))
    // writer B targets v2... but writer A publishes v2 first
    TxTable.commit(Seq((2L, "A", 2.0)).toDF("id", "cat", "price"), table)
    // B's staged commit to the stale target rebases to v3 and lands
    graft.sources.TxTable.commitAs(
      Seq((3L, "B", 3.0)).toDF("id", "cat", "price"), table, 2, "append",
      rebaseAppend = true) shouldBe 3
    TxTable.currentVersion(spark, table) shouldBe 3
    canon(TxTable.read(spark, table)) shouldBe
      canon(Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0))
        .toDF("id", "cat", "price"))
    // the rebased file kept its partition directory
    TxTable.filesOf(spark, table, 3)
      .filter(_.contains("cat=B")).foreach(_ should include ("data/cat=B/v3_"))
    TxTable.readPartition(spark, table, "B").count() shouldBe 1L
  }

  // Per-partition OPTIMIZE: one partition's files rewrite, the rest
  // carry by reference; MoR deletes fold into the rewrite; changes()
  // stays silent (dataChange=false).
  test("compactPartition rewrites one partition and carries the others verbatim") {
    val table = freshTable()
    (1 to 3).foreach(i =>
      TxTable.commit(Seq((i.toLong, "A", i * 1.0)).toDF("id", "cat", "price"),
        table, partitionBy = if (i == 1) Some("cat") else None))
    TxTable.commit(Seq((9L, "B", 9.0)).toDF("id", "cat", "price"), table)
    val bFiles = TxTable.filesOf(spark, table, 4).filter(_.contains("cat=B"))
    TxTable.deleteKeysMor(spark, table, "id", Seq(2L).toDF("id"))._2 shouldBe 1L
    val (nv, nRw, nCarry) = TxTable.compactPartition(spark, table, "A")
    nRw shouldBe 3
    nCarry shouldBe bFiles.size
    // carried B files are byte-identical references; A re-binned
    TxTable.filesOf(spark, table, nv).filter(_.contains("cat=B")) shouldBe bFiles
    canon(TxTable.read(spark, table)) shouldBe
      canon(Seq((1L, "A", 1.0), (3L, "A", 3.0), (9L, "B", 9.0))
        .toDF("id", "cat", "price"))
    // the folded tombstone is gone from the compacted partition's read
    TxTable.readPartition(spark, table, "A").count() shouldBe 2L
    // CDC: the compact replays as nothing
    TxTable.changes(spark, table, nv - 1, nv).count() shouldBe 0L
  }

  // --- directive r9#5: positional deletion vectors — the (file, row
  // ordinal) sidecar form. Result-equal to the key-tombstone form on
  // the same inputs, zero files rewritten, schema-independent (no key
  // column), CDC replays the delete, OPTIMIZE folds the vectors.
  test("positional deletion vectors: equal to the key form, zero rewrite, CDC + fold") {
    import org.apache.spark.sql.functions.{col => c}
    val keyT = freshTable()
    val posT = freshTable()
    val df = (1L to 100L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(4, c("id"))
    Seq(keyT, posT).foreach(t => TxTable.commit(df, t, statsCols = Seq("id")))
    val (kv, kn) = TxTable.deleteWhereMor(spark, keyT, "id", 10.0, 40.0, "id")
    val (pv, pn) = TxTable.deleteWherePos(spark, posT, "id", 10.0, 40.0)
    pn shouldBe kn
    // zero files rewritten in both forms
    TxTable.filesOf(spark, posT, pv) shouldBe TxTable.filesOf(spark, posT, 1)
    canon(TxTable.readVersion(spark, posT, pv)) shouldBe
      canon(TxTable.readVersion(spark, keyT, kv))
    // already-deleted rows never re-record (idempotent no-op)
    TxTable.deleteWherePos(spark, posT, "id", 10.0, 40.0)._2 shouldBe 0L
    // a second, overlapping positional delete stacks correctly
    TxTable.deleteWherePos(spark, posT, "id", 30.0, 50.0)._2 shouldBe 10L
    TxTable.read(spark, posT).count() shouldBe 59L
    // CDC: the posdelete version replays as exactly the deleted rows
    val cdc = TxTable.changes(spark, posT, 1, 2)
    cdc.filter(c("_change") === "delete").count() shouldBe 31L
    cdc.count() shouldBe 31L
    // appends after the delete are unaffected; re-inserted ordinals
    // in NEW files never collide with old vectors (per-file scope)
    TxTable.commit(Seq((10L, "re10")).toDF("id", "s"), posT,
      statsCols = Seq("id"))
    TxTable.read(spark, posT).filter(c("id") === 10L).count() shouldBe 1L
    // OPTIMIZE folds the vectors away: content preserved, posd gone
    val cv = TxTable.compact(spark, posT)
    TxTable.posDeletesOf(spark, posT, cv) shouldBe empty
    TxTable.read(spark, posT).count() shouldBe 60L
    // sidecars are REFERENCED files for vacuum while their manifests
    // live (vacuuming one would resurrect rows in time travel)
    val sidecars = TxTable.posDeletesOf(spark, posT, 3)
    sidecars should not be empty
    TxTable.vacuum(spark, posT, minAgeMs = 0)
      .intersect(sidecars) shouldBe empty
  }
}
