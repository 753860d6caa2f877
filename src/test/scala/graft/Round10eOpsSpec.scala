package graft

import org.apache.spark.sql.functions._

import graft.functions.Eval
import graft.sources.TxTable

/** Round-10 batch 4: Krippendorff's α, replaceWhere partition
  * overwrite, null-count file skipping.
  */
class Round10eOpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_r10e_spec_").toString + "/t"

  test("krippendorffAlpha matches the textbook nominal example") {
    // Krippendorff's standard example (Hayes & Krippendorff '07,
    // nominal, with missing data): units rated by up to 3 raters.
    // units: 1:{a,a}, 2:{b,b,b}, 3:{b,b}, 4:{b,b,b}, 5:{b,b},
    // 6:{c,c,b}, 7:{d,d,d}, 8:{a,a}, 9:{e,e}, 10:{d,d}, 11 single
    val rows = Seq(
      ("1", "a"), ("1", "a"),
      ("2", "b"), ("2", "b"), ("2", "b"),
      ("3", "b"), ("3", "b"),
      ("4", "b"), ("4", "b"), ("4", "b"),
      ("5", "b"), ("5", "b"),
      ("6", "c"), ("6", "c"), ("6", "b"),
      ("7", "d"), ("7", "d"), ("7", "d"),
      ("8", "a"), ("8", "a"),
      ("9", "e"), ("9", "e"),
      ("10", "d"), ("10", "d"),
      ("11", "a")) // unpairable — must drop
    val r = Eval.krippendorffAlpha(rows.toDF("u", "v"), "u", "v").head()
    r.getLong(0) shouldBe 10L  // pairable units
    r.getLong(1) shouldBe 24L  // pairable ratings
    // direct computation of the same formula
    val byU = rows.groupBy(_._1).filter(_._2.size >= 2)
    val doSum = byU.values.map { rs =>
      val m = rs.size.toDouble
      rs.groupBy(_._2).values.map { g =>
        val k = g.size.toDouble
        BigDecimal(k * (m - k) / (m - 1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    }.sum.toDouble
    val nc = byU.values.flatten.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = nc.values.sum.toDouble
    val de = n * n - nc.values.map(c => c.toDouble * c).sum
    val expected = 1.0 - (n - 1.0) * doSum / de
    r.getDouble(2) shouldBe (expected +- 1e-8)
    // perfect agreement → alpha 1
    val perfect = Seq(("1", "a"), ("1", "a"), ("2", "b"), ("2", "b"))
    Eval.krippendorffAlpha(perfect.toDF("u", "v"), "u", "v").head()
      .getDouble(2) shouldBe (1.0 +- 1e-9)
  }

  test("overwritePartition replaces one partition atomically and refuses stray rows") {
    val table = freshTable()
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "p", "x")
    TxTable.commit(df, table, partitionBy = Some("p"))
    val v2 = TxTable.overwritePartition(spark, table,
      Seq((9L, "a", 90.0)).toDF("id", "p", "x"), "a")
    v2 shouldBe 2
    TxTable.read(spark, table).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("x"))).sorted shouldBe
      Seq((3L, 30.0), (9L, 90.0))
    // partition b's file carried by reference
    TxTable.filesOf(spark, table, 2)
      .count(TxTable.filesOf(spark, table, 1).contains) shouldBe 1
    // a row outside the partition refuses BEFORE committing
    val ex = intercept[Exception] {
      TxTable.overwritePartition(spark, table,
        Seq((7L, "b", 70.0)).toDF("id", "p", "x"), "a")
    }
    ex.getMessage should include("violate")
    TxTable.currentVersion(spark, table) shouldBe 2
    // time travel still sees the pre-replace partition
    TxTable.readVersion(spark, table, 1).count() shouldBe 3L
  }

  test("overwritePartition refuses unpartitioned and hidden-transform layouts") {
    val flat = freshTable()
    TxTable.commit(Seq((1L, "a", 1.0)).toDF("id", "p", "x"), flat)
    val ex = intercept[Exception] {
      TxTable.overwritePartition(spark, flat,
        Seq((1L, "a", 1.0)).toDF("id", "p", "x"), "a")
    }
    ex.getMessage should include("not hive-partitioned")
  }

  test("null-count skipping is conservative: untracked and mixed files always kept") {
    val table = freshTable()
    // v1: tracked, no nulls; v2: tracked, all null; v3: tracked, mixed;
    // v4: UNTRACKED (no nullCols) — must stay a candidate for both
    TxTable.commit(Seq((1L, Some(1.0))).toDF("id", "x").coalesce(1), table,
      nullCols = Seq("x"), countRows = true)
    TxTable.commit(Seq((2L, None: Option[Double])).toDF("id", "x").coalesce(1),
      table, nullCols = Seq("x"), countRows = true)
    TxTable.commit(Seq((3L, Some(3.0)), (4L, None)).toDF("id", "x").coalesce(1),
      table, nullCols = Seq("x"), countRows = true)
    TxTable.commit(Seq((5L, Some(5.0))).toDF("id", "x").coalesce(1), table)
    val v = TxTable.currentVersion(spark, table)
    TxTable.prunedFilesByNull(spark, table, v, "x", true).size shouldBe 3 // v2,v3,v4
    TxTable.prunedFilesByNull(spark, table, v, "x", false).size shouldBe 3 // v1,v3,v4
    TxTable.readWhereNull(spark, table, "x", true).select("id").collect()
      .map(_.getLong(0)).sorted shouldBe Seq(2L, 4L)
    TxTable.readWhereNull(spark, table, "x", false).select("id").collect()
      .map(_.getLong(0)).sorted shouldBe Seq(1L, 3L, 5L)
  }

  test("null counts carry through compaction-free ops and survive clone") {
    val table = freshTable()
    TxTable.commit(Seq((1L, None: Option[Double])).toDF("id", "x").coalesce(1),
      table, nullCols = Seq("x"), countRows = true)
    TxTable.commit(Seq((2L, Some(2.0))).toDF("id", "x").coalesce(1), table,
      nullCols = Seq("x"), countRows = true)
    val clone = freshTable()
    TxTable.cloneShallow(spark, table, clone)
    // the clone's borrowed files keep their null stats → same pruning
    TxTable.prunedFilesByNull(spark, clone, 1, "x", true).size shouldBe 1
    TxTable.readWhereNull(spark, clone, "x", false).count() shouldBe 1L
  }
}
