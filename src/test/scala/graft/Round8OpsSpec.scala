package graft

import org.apache.spark.sql.functions._

import graft.functions.{Profile, Quality}
import graft.sources.TxTable

/** Round-8 fixes and additions: empty-snapshot reads, skipping-stat
  * widening for >2^53 longs, the pettitt size guard, definite quality
  * verdicts on all-NULL columns.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_tx_r8_").toString + "/t"

  test("delete-all commits a readable EMPTY snapshot with the recorded schema; appends resume against it") {
    val table = freshTable()
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    TxTable.commit(a, table, statsCols = Seq("id")) shouldBe 1
    // range covers every row of every candidate file → zero survivors
    val (v, rewritten, carried) = TxTable.deleteWhere(spark, table, "id", 0.0, 100.0)
    v shouldBe 2
    carried shouldBe 0
    val empty = TxTable.read(spark, table)
    empty.count() shouldBe 0L
    empty.schema.fieldNames.toSeq shouldBe Seq("id", "s")
    // history / changes still resolve across the empty state
    TxTable.changes(spark, table, 1, 2).filter(col("_change") === "delete")
      .count() shouldBe 3L
    // the append schema gate holds against the EMPTY parent's recorded schema
    val bad = Seq((9, 1.0)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] { TxTable.commit(bad, table) }
    e.getMessage should include("append schema mismatch")
    // a compatible append resumes the table from empty
    TxTable.commit(Seq((9L, "z")).toDF("id", "s"), table) shouldBe 3
    TxTable.read(spark, table).collect().map(_.getLong(0)) shouldBe Seq(9L)
  }

  test("skipping stats on BIGINT beyond 2^53 widen OUTWARD — pruning never skips a file with in-range rows") {
    val table = freshTable()
    val big = (1L << 53) + 3L // not exactly representable as double
    val df = Seq(big, big + 10L).toDF("id")
    TxTable.commit(df, table, statsCols = Seq("id"))
    val st = TxTable.statsOf(spark, table, 1)
    st should not be empty
    val lo = st.map(_._3).min
    val hi = st.map(_._4).max
    // recorded bounds must bracket the true values as doubles
    assert(lo <= big.toDouble && lo < big.toDouble + 1,
      s"lo=$lo must sit at/under the true min $big")
    assert(hi >= (big + 10L).toDouble)
    // a point query at the true min must keep its file and return the
    // row — with inward-rounded stats the file was silently skipped
    TxTable.prunedFiles(spark, table, 1, "id",
      big.toDouble, big.toDouble) should not be empty
    TxTable.readWhere(spark, table, "id", big.toDouble, big.toDouble)
      .collect().map(_.getLong(0)) shouldBe Array(big)
  }

  test("pettitt refuses a series above maxRows in-plan and passes unchanged under budget") {
    val series = (1 to 30).map(i => (i, if (i <= 15) 1.0 else 5.0)).toDF("day", "m")
    // under budget: normal result
    val ok = Profile.pettitt(series, "day", "m", maxRows = 100L).collect().head
    ok.getAs[Long]("n") shouldBe 30L
    // over budget: the in-plan raise_error fires at materialization
    val e = intercept[Exception] {
      Profile.pettitt(series, "day", "m", maxRows = 10L).collect()
    }
    e.getMessage should include("collapse to calendar cells")
  }

  test("Quality.audit min/max bounds on an all-NULL column verdict a DEFINITE fail, not NULL") {
    val df = Seq((1L, None: Option[Double]), (2L, None))
      .toDF("id", "v")
    val out = Quality.audit(df, Seq(
        Quality.MinBound("v", 0.0), Quality.MaxBound("v", 10.0)))
      .collect()
    out.length shouldBe 2
    for (r <- out) {
      r.isNullAt(r.fieldIndex("metric")) shouldBe true // surfaced, not invented
      r.getAs[Boolean]("passed") shouldBe false        // but the verdict is definite
    }
  }
}
