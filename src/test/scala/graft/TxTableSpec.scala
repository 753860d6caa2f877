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
}
