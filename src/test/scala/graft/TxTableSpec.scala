package graft

import org.apache.spark.sql.functions._

import graft.sources.TxTable

/** Transactional snapshot layer: commit protocol, isolation, time
  * travel, conflict detection, orphan accounting.
  */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_tx_spec_").toString + "/t"

  test("append and overwrite commits version correctly; reads are snapshot-isolated") {
    val table = freshTable()
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((3L, "c")).toDF("id", "s")
    val c = Seq((9L, "z")).toDF("id", "s")
    TxTable.commit(a, table) shouldBe 1
    TxTable.commit(b, table) shouldBe 2
    val v2Read = TxTable.readVersion(spark, table, 2) // resolve BEFORE v3 exists
    TxTable.commit(c, table, op = "overwrite") shouldBe 3
    TxTable.readVersion(spark, table, 1).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L)
    TxTable.readVersion(spark, table, 2).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L)
    TxTable.read(spark, table).collect().map(_.getLong(0)) shouldBe Seq(9L)
    // a dataframe resolved at version 2 still reads version 2 after
    // the overwrite — files and manifests are immutable
    v2Read.collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L)
    TxTable.history(spark, table).collect()
      .map(r => (r.getInt(0), r.getString(1))) shouldBe
      Array((1, "append"), (2, "append"), (3, "overwrite"))
  }

  test("a commit losing the version race fails loudly, and its files surface as orphans") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    // the race window is between the head read and the manifest
    // create: this writer targeted v2, then a competitor published v2
    // first — the version-pinned body reproduces that deterministically
    val winner = new java.io.File(s"$table/_manifests/v2.json")
    val fw = new java.io.FileWriter(winner)
    fw.write("""{"version":2,"op":"append","n_files":0,"files":[]}"""); fw.close()
    val ex = intercept[RuntimeException] {
      TxTable.commitAs(Seq((2L, "b")).toDF("id", "s"), table, 2, "append")
    }
    ex.getMessage should include("conflict")
    // a publish AFTER the competitor's manifest lands is NOT a
    // conflict — the head re-read simply targets the next version
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), table) shouldBe 3
    // the loser's already-moved data files are unreferenced → orphans
    val orphans = TxTable.orphans(spark, table)
    orphans.foreach(_ should startWith("data/v2_"))
    orphans should not be empty
    // referenced files are never orphans
    TxTable.orphans(spark, table).intersect(
      TxTable.filesOf(spark, table, 1)) shouldBe empty
  }

  test("eight genuinely-racing writers: every version has exactly one winner, no manifest lost") {
    val table = freshTable()
    import spark.implicits._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // every writer retries on conflict against the fresh head — the
    // documented caller loop; all 8 single-row commits must land
    val futures = (1 to 8).map { i =>
      scala.concurrent.Future {
        var committed = -1
        var attempts = 0
        while (committed < 0 && attempts < 50) {
          attempts += 1
          try committed = TxTable.commit(Seq((i.toLong, s"w$i")).toDF("id", "s"), table)
          catch { case e: RuntimeException if e.getMessage.contains("conflict") => () }
        }
        committed
      }
    }
    val versions = futures.map(f =>
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(120, "s")))
    pool.shutdown()
    // exactly versions 1..8, each won by exactly one writer
    versions.sorted shouldBe (1 to 8)
    TxTable.currentVersion(spark, table) shouldBe 8
    // the final snapshot carries every committed row exactly once
    TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe (1L to 8L)
    // history is contiguous and every manifest resolves
    (1 to 8).foreach(v => TxTable.filesOf(spark, table, v) should not be empty)
  }

  test("changes replays exactly the delta: append = new files only, overwrite = delete+insert, compact = silent") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table) shouldBe 1
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), table) shouldBe 2
    TxTable.compact(spark, table) shouldBe 3
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table, op = "overwrite") shouldBe 4
    def evs(from: Int, to: Int) = TxTable.changes(spark, table, from, to)
      .select("_version", "_change", "id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq
    // append step: only v2's new rows, never a v1 rescan
    evs(1, 2) shouldBe Seq((2, "insert", 3L))
    // compact step is byte-only: no row events at all (dataChange=false)
    evs(2, 3) shouldBe Seq.empty[(Int, String, Long)]
    // the overwrite deletes the (compacted) prior snapshot and inserts the new one
    evs(3, 4) shouldBe Seq((4, "delete", 1L), (4, "delete", 2L), (4, "delete", 3L), (4, "insert", 9L))
    // full replay from the beginning composes all of it
    evs(0, 4) shouldBe Seq(
      (1, "insert", 1L), (1, "insert", 2L), (2, "insert", 3L),
      (4, "delete", 1L), (4, "delete", 2L), (4, "delete", 3L), (4, "insert", 9L))
  }

  test("compact shrinks the snapshot's file count, preserves content, and keeps time travel intact") {
    val table = freshTable()
    val df = spark.range(1000).select(col("id"), (col("id") % 7).cast("string").as("s"))
    TxTable.commit(df.repartition(8), table) shouldBe 1
    TxTable.filesOf(spark, table, 1).size shouldBe 8
    TxTable.compact(spark, table) shouldBe 2 // 1000 tiny rows << targetBytes → 1 file
    TxTable.filesOf(spark, table, 2).size shouldBe 1
    TxTable.opOf(spark, table, 2) shouldBe "compact"
    // content-preserving: same rows before and after
    TxTable.readVersion(spark, table, 2).collect().map(_.getLong(0)).sorted shouldBe
      TxTable.readVersion(spark, table, 1).collect().map(_.getLong(0)).sorted
    // pre-compaction snapshot still resolves (files untouched)
    TxTable.readVersion(spark, table, 1).count() shouldBe 1000
  }

  test("vacuum deletes only orphans; expireVersions reclaims replaced history and keeps live versions whole") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table) shouldBe 2
    // plant a lost-race orphan (version ≤ head → a genuinely dead file)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/data/v1_9_deadbeef.parquet"), Array[Byte](1))
    // ...and an in-flight commit's file (version > head): protected
    // from vacuum REGARDLESS of age — its manifest may be about to
    // publish
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/data/v9_0_inflight.parquet"), Array[Byte](1))
    TxTable.vacuum(spark, table, minAgeMs = 0) shouldBe Seq("data/v1_9_deadbeef.parquet")
    new java.io.File(s"$table/data/v1_9_deadbeef.parquet").exists() shouldBe false
    new java.io.File(s"$table/data/v9_0_inflight.parquet").exists() shouldBe true
    // under the default 24h age gate a FRESH dead file survives too
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/data/v1_8_fresh.parquet"), Array[Byte](1))
    TxTable.vacuum(spark, table) shouldBe Seq.empty
    // ...but an AGED one (mtime 25h ago) is reclaimed by the default
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$table/data/v1_8_fresh.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 25L * 3600 * 1000))
    TxTable.vacuum(spark, table) shouldBe Seq("data/v1_8_fresh.parquet")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$table/data/v9_0_inflight.parquet"))
    // overwrite makes v1/v2 history; expire down to the head only
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table, op = "overwrite") shouldBe 3
    val (expired, deleted) = TxTable.expireVersions(spark, table, keepLast = 1)
    expired shouldBe Seq(1, 2)
    deleted should not be empty
    // v2 carried v1's files forward: every expired file is really gone
    deleted.foreach(rel => new java.io.File(s"$table/$rel").exists() shouldBe false)
    // expired manifests are gone → time travel fails loudly
    intercept[IllegalArgumentException] { TxTable.readVersion(spark, table, 1) }
    // the live head is untouched and whole
    TxTable.read(spark, table).collect().map(_.getLong(0)) shouldBe Seq(9L)
    TxTable.history(spark, table).collect().map(_.getInt(0)) shouldBe Array(3)
    // expiring again is a no-op
    TxTable.expireVersions(spark, table, keepLast = 1) shouldBe ((Seq.empty, Seq.empty))
  }

  test("readVersion reads the manifest's explicit file list, never a directory listing") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table)
    // plant a stray parquet in data/ — a listing-based reader would
    // pick it up; the manifest reader must not
    Seq((99L, "stray")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$table/_stray")
    val strayPart = new java.io.File(s"$table/_stray").listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(strayPart.toPath,
      java.nio.file.Paths.get(s"$table/data/stray.parquet"))
    TxTable.read(spark, table).collect().map(_.getLong(0)) shouldBe Seq(1L)
    TxTable.orphans(spark, table) should contain("data/stray.parquet")
  }

  test("vacuum racing live commits never deletes a published manifest's files") {
    val table = freshTable()
    TxTable.commit(Seq((0L, "seed")).toDF("id", "s"), table) shouldBe 1
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the adversarial maintenance job: minAgeMs=0 (no age protection)
    // so ONLY the in-flight version skip stands between a racing
    // vacuum and the files a commit has renamed into data/ but not
    // yet published a manifest for
    val vac = new Thread(() => {
      while (!stop.get()) { TxTable.vacuum(spark, table, minAgeMs = 0); () }
    })
    vac.start()
    try (2 to 13).foreach { i =>
      TxTable.commit(Seq((i.toLong, s"w$i")).toDF("id", "s"), table) shouldBe i
    } finally { stop.set(true); vac.join() }
    // every published manifest's files all exist and resolve
    (1 to 13).foreach { v =>
      TxTable.filesOf(spark, table, v).foreach { rel =>
        assert(new java.io.File(s"$table/$rel").exists(), s"v$v lost $rel to vacuum")
      }
      TxTable.readVersion(spark, table, v).count() shouldBe v
    }
    TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe (Seq(0L) ++ (2L to 13L))
  }

  test("append refuses a schema-incompatible frame loudly; reordered columns round-trip; overwrite may change schema") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    // new column → refusal naming both schemas, BEFORE any data lands
    val ex = intercept[IllegalArgumentException] {
      TxTable.commit(Seq((2L, "b", 0.5)).toDF("id", "s", "score"), table)
    }
    ex.getMessage should include("schema mismatch")
    ex.getMessage should include("score")
    TxTable.currentVersion(spark, table) shouldBe 1 // nothing committed
    TxTable.orphans(spark, table) shouldBe empty    // nothing written either
    // same type change → refusal too
    intercept[IllegalArgumentException] {
      TxTable.commit(Seq(("2", "b")).toDF("id", "s"), table)
    }.getMessage should include("schema mismatch")
    // REORDERED columns are compatible (parquet resolves by name):
    // the mixed snapshot round-trips losslessly
    TxTable.commit(Seq(("c", 3L)).toDF("s", "id"), table) shouldBe 2
    TxTable.read(spark, table).select("id", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted shouldBe Seq((1L, "a"), (3L, "c"))
    // overwrite is the documented schema-change path
    TxTable.commit(Seq((9L, "z", 1.0)).toDF("id", "s", "score"), table, op = "overwrite") shouldBe 3
    TxTable.read(spark, table).columns.sorted shouldBe Array("id", "s", "score").sorted
  }

  test("the committer seam drives the conflict path: a publish returning false raises the retryable conflict") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    val alwaysLose = new graft.sources.TxCommitter {
      def publish(f: org.apache.hadoop.fs.FileSystem, mp: org.apache.hadoop.fs.Path,
                  json: String, nonce: String): Boolean = false
    }
    TxTable.committerOverride = Some(alwaysLose)
    try {
      val ex = intercept[RuntimeException] {
        TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table)
      }
      ex.getMessage should include("conflict")
    } finally TxTable.committerOverride = None
    // the doomed writer's data files surfaced as orphans; the table is intact
    TxTable.currentVersion(spark, table) shouldBe 1
    TxTable.orphans(spark, table).foreach(_ should startWith("data/v2_"))
    // with the real committer the same commit lands
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table) shouldBe 2
  }

  test("a crash mid-expiry leaves only vacuum-reclaimable orphans, never a dangling manifest") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table) shouldBe 2
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table, op = "overwrite") shouldBe 3
    val v1Files = TxTable.filesOf(spark, table, 1)
    val v2Files = TxTable.filesOf(spark, table, 2)
    // simulate expireVersions crashing BETWEEN its two phases: the
    // expired manifests are gone, their data files are not
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$table/_manifests/v1.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$table/_manifests/v2.json"))
    // no dangling manifest: every live version still resolves fully
    TxTable.liveVersions(spark, table) shouldBe Seq(3)
    TxTable.read(spark, table).collect().map(_.getLong(0)) shouldBe Seq(9L)
    // the stranded files are exactly the orphan set…
    TxTable.orphans(spark, table).toSet shouldBe (v1Files ++ v2Files).toSet
    // …and vacuum reclaims them (no in-flight versions here)
    TxTable.vacuum(spark, table, minAgeMs = 0).toSet shouldBe (v1Files ++ v2Files).toSet
    TxTable.orphans(spark, table) shouldBe empty
  }

  test("commit times are strictly monotonic; readAsOf resolves boundaries exactly") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table)
    TxTable.commit(Seq((2L, "b")).toDF("id", "s"), table)
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table, op = "overwrite")
    val ts = (1 to 3).map(v => TxTable.commitMsOf(spark, table, v))
    ts.sliding(2).foreach { case Seq(a, b) => assert(a < b) } // strict, even same-ms commits
    // at v2's commit time: v1+v2 content
    TxTable.readAsOf(spark, table, ts(1)).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L)
    // one ms before v3: still v2's snapshot
    TxTable.readAsOf(spark, table, ts(2) - 1).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L)
    // at/after v3: the overwrite
    TxTable.readAsOf(spark, table, ts(2) + 1000).collect().map(_.getLong(0)) shouldBe Seq(9L)
    // before the first commit: loud refusal, not an empty frame
    val ex = intercept[IllegalArgumentException] {
      TxTable.readAsOf(spark, table, ts(0) - 1)
    }
    ex.getMessage should include("existed at ts")
  }

  test("object-store CAS committer: eight racing writers, exactly one wins each version, no manifest orphans (r8)") {
    val table = freshTable()
    // the full protocol through the conditional-put path (the S3
    // If-None-Match / GCS generation-match contract, emulated locally)
    graft.sources.TxTable.committerOverride =
      Some(new graft.sources.ObjectStoreCommitter(new graft.sources.LocalEmulatedObjectStore))
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to 8).map { i =>
        scala.concurrent.Future {
          var committed = -1
          var attempts = 0
          while (committed < 0 && attempts < 50) {
            attempts += 1
            try committed = TxTable.commit(Seq((i.toLong, s"w$i")).toDF("id", "s"), table)
            catch { case e: RuntimeException if e.getMessage.contains("conflict") => () }
          }
          committed
        }
      }
      val versions = futures.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(120, "s")))
      pool.shutdown()
      versions.sorted shouldBe (1 to 8)
      TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe (1L to 8L)
      // no orphaned manifest: the _manifests dir holds EXACTLY v1..v8,
      // no staged .tmp survivors from the losing CAS attempts
      val names = new java.io.File(s"$table/_manifests").listFiles().map(_.getName).sorted
      names.toSeq shouldBe (1 to 8).map(v => s"v$v.json")
    } finally TxTable.committerOverride = None
  }

  test("duplicate-batch delivery races through the object-store CAS: exactly one applies (r8)") {
    val table = freshTable()
    TxTable.committerOverride =
      Some(new graft.sources.ObjectStoreCommitter(new graft.sources.LocalEmulatedObjectStore))
    try {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      // four writers deliver the SAME (appId, batchId) concurrently —
      // the crashy-sink worst case on an object store: one must win the
      // conditional put, the rest must land as already-applied no-ops
      val futures = (1 to 4).map { _ =>
        scala.concurrent.Future {
          TxTable.commitIdempotent(Seq((1L, "x")).toDF("id", "s"), table, "dup", 7L)
        }
      }
      val results = futures.map(f =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration(120, "s")))
      results.count(_._2) shouldBe 1                 // exactly one applied
      results.map(_._1).distinct shouldBe Seq(1)     // all see version 1
      TxTable.currentVersion(spark, table) shouldBe 1
      TxTable.read(spark, table).count() shouldBe 1L // the row landed once
      pool.shutdown()
    } finally TxTable.committerOverride = None
  }

  test("tx-changes stream schema pins at start: a mid-stream evolution keeps emitting the pinned shape (r8)") {
    import graft.sources.TxChangesStream
    val table = freshTable()
    TxTable.commit(Seq((1L, "a")).toDF("id", "s"), table) shouldBe 1
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_txsch_ckpt_").toString
    def runOnce(): Unit = {
      val q = TxChangesStream.readChangesStream(spark, table)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          buf.add(b.columns.toSeq); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // the table evolves while the stream is down; the RESTARTED stream
    // re-pins from the new head (the documented restart rule), but a
    // batch never mixes shapes mid-stream
    TxTable.commitEvolve(Seq((2L, "b", 9L)).toDF("id", "s", "extra"), table) shouldBe 2
    runOnce()
    import scala.jdk.CollectionConverters._
    val shapes = buf.asScala.toSeq
    shapes.head shouldBe Seq("id", "s", "_change", "_version", "_commit_ms")
    shapes.last shouldBe Seq("id", "s", "extra", "_change", "_version", "_commit_ms")
  }

  test("restore is zero-copy, preserves history, and survives vacuum/expire correctly (r8)") {
    val table = freshTable()
    TxTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), table) shouldBe 1
    TxTable.commit(Seq((3L, "c")).toDF("id", "s"), table) shouldBe 2
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table, op = "overwrite") shouldBe 3
    val rv = TxTable.restore(spark, table, 2)
    rv shouldBe 4
    // content rolled back; files REFERENCED, not copied
    TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L)
    TxTable.filesOf(spark, table, 4).toSet shouldBe TxTable.filesOf(spark, table, 2).toSet
    TxTable.opOf(spark, table, 4) shouldBe "restore"
    // the bad v3 stays travelable until retention expires it
    TxTable.readVersion(spark, table, 3).collect().map(_.getLong(0)) shouldBe Seq(9L)
    // vacuum(0) must not touch the restored head's files (referenced
    // twice — v2 and v4) even though v3's are still referenced by v3
    TxTable.vacuum(spark, table, minAgeMs = 0L) shouldBe empty
    // expiring history down to the restored head keeps its files live
    // (they are referenced by the kept v4 even though NAMED v1_/v2_)
    TxTable.expireVersions(spark, table, keepLast = 1)
    TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L)
    // restoring to an expired version refuses loudly
    val e = intercept[IllegalArgumentException] { TxTable.restore(spark, table, 2) }
    e.getMessage should include("expired")
    // a new append continues normally on top of the restored head
    TxTable.commit(Seq((7L, "g")).toDF("id", "s"), table) shouldBe 5
    TxTable.read(spark, table).collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L, 3L, 7L)
  }

  test("mergeInto retries a lost CAS by RE-MERGING against the new head: racing append and merge both land (r8)") {
    val table = freshTable()
    TxTable.commit(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"), table) shouldBe 1
    val feed = Seq((2L, 99.0, 1L, "U"), (3L, 0.0, 1L, "D"), (5L, 50.0, 1L, "I"))
      .toDF("id", "v", "seq", "op")
    // inject a competing append BETWEEN the merge's read and its
    // publish: the hook fires once, commits extra rows as the next
    // version, then lets the merge's own publish lose the CAS
    @volatile var fired = false
    val hook: graft.sources.TxCommitter = new graft.sources.TxCommitter {
      def publish(f: org.apache.hadoop.fs.FileSystem, mp: org.apache.hadoop.fs.Path,
                  json: String, nonce: String): Boolean = {
        if (!fired) {
          fired = true
          TxTable.committerOverride = None
          try TxTable.commit(Seq((7L, 70.0)).toDF("id", "v"), table)
          finally TxTable.committerOverride = Some(this)
        }
        graft.sources.LocalLinkCommitter.publish(f, mp, json, nonce)
      }
    }
    TxTable.committerOverride = Some(hook)
    val (v, attempts) = try TxTable.mergeInto(spark, table, feed, "id", "seq", "op")
      finally TxTable.committerOverride = None
    // the hook's append won v2; the merge lost, RE-READ the head (now
    // including id=7) and re-merged into v3 — both writers landed
    attempts shouldBe 2
    v shouldBe 3
    TxTable.opOf(spark, table, 2) shouldBe "append"
    TxTable.opOf(spark, table, 3) shouldBe "merge"
    TxTable.read(spark, table).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted shouldBe
      Seq((1L, 10.0), (2L, 99.0), (5L, 50.0), (7L, 70.0))
  }
}
