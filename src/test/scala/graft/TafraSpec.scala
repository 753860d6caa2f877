package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Agg, Tafra}

/** Core frame surface (SURVEY.md §2 #1-20, #22, #24-26): each reference
  * method exercised against hand-checked expectations.
  */
class TafraSpec extends SparkSpec {
  import spark.implicits._

  private def people: Tafra = Tafra(
    Seq((1L, "ann", 30, 100.0), (2L, "bob", 25, 50.0), (3L, "cyd", 30, 75.0),
        (4L, "dan", 25, 25.0)).toDF("id", "name", "age", "bal"))

  test("select prunes and preserves order") {
    val t = people.select(Seq("name", "id"))
    t.columns shouldBe Seq("name", "id")
  }

  test("shape / size / ndim metadata (reference base.py:1182-1226)") {
    people.shape shouldBe ((4L, 4))
    people.size shouldBe 16L
    people.ndim shouldBe 2
  }

  test("select of unknown column fails like the reference KeyError") {
    val e = intercept[IllegalArgumentException](people.select(Seq("nope")))
    e.getMessage should include("nope")
  }

  test("rename maps names, keeps data") {
    val t = people.rename(Map("id" -> "pid", "bal" -> "balance"))
    t.columns shouldBe Seq("pid", "name", "age", "balance")
    t.df.agg(sum("balance")).as[Double].head() shouldBe 250.0
  }

  test("delete drops columns") {
    people.delete(Seq("age", "bal")).columns shouldBe Seq("id", "name")
  }

  test("update adds and replaces a column") {
    val t = people.update("age2", col("age") * 2).update("age", lit(0))
    t.df.agg(sum("age2"), sum("age")).collect().head.toSeq shouldBe Seq(220L, 0L)
  }

  test("updateDtypes casts") {
    val t = people.updateDtypes(Map("age" -> "double", "id" -> "string"))
    t.dtypes("age") shouldBe "DoubleType"
    t.dtypes("id") shouldBe "StringType"
  }

  test("coalesceCol fills from successive fallbacks") {
    val t = Tafra(Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v"))
      .coalesceCol("v", Seq(lit(-1.0)))
    canon(t.df) shouldBe Seq(Seq("1", "5.0"), Seq("2", "-1.0")).sortBy(_.mkString("|"))
  }

  test("filter + head with total order is deterministic") {
    val t = people.filter(col("age") === 30).head(1, Seq(col("id")))
    rowsOf(t.df).map(_.getLong(0)) shouldBe Seq(1L)
  }

  test("sort orders rows") {
    people.sort(Seq(col("bal").desc)).df.select("name").as[String].collect().toSeq shouldBe
      Seq("ann", "cyd", "bob", "dan")
  }

  test("distinct removes duplicate rows") {
    Tafra(Seq(1, 1, 2).toDF("x")).distinct().rows shouldBe 2
  }

  test("union validates names and dtypes like the reference") {
    val a = Tafra(Seq((1, "x")).toDF("id", "s"))
    val b = Tafra(Seq((2, "y")).toDF("id", "s"))
    a.union(b).rows shouldBe 2
    val renamed = Tafra(Seq((2, "y")).toDF("id2", "s"))
    intercept[IllegalArgumentException](a.union(renamed))
    val retyped = Tafra(Seq((2L, "y")).toDF("id", "s"))
    intercept[IllegalArgumentException](a.union(retyped))
  }

  test("groupBy aggregates with named fns") {
    val t = people.groupBy(Seq("age"), Seq(Agg("n", "count", "id"), Agg("sum_bal", "sum", "bal")))
    canon(t.df) shouldBe Seq(Seq("25", "2", "75.0"), Seq("30", "2", "175.0"))
  }

  test("approx_median returns an actual group member at the median position") {
    // unlike exact median (which interpolates between the two middle
    // values), the sketch returns a real data point — assert membership
    // and that it brackets the exact median
    val t = people.groupBy(Seq("age"), Seq(
      Agg("m", "approx_median", "bal"), Agg("lo", "min", "bal"), Agg("hi", "max", "bal"),
      Agg("vals", "collect_set", "bal")))
    t.df.collect().foreach { r =>
      val m = r.getDouble(r.fieldIndex("m"))
      r.getAs[Seq[Double]]("vals") should contain(m)
      m should (be >= r.getDouble(r.fieldIndex("lo")) and be <= r.getDouble(r.fieldIndex("hi")))
    }
  }

  test("CsvSource infers and promotes dtypes like the reference (int → double → string)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_promote").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "d.csv"),
      "a,b,c\n1,1,1\n2,2.5,x\n3,3,3\n")
    val t = graft.sources.CsvSource.read(spark, dir)
    t.dtypes("a") shouldBe "IntegerType"  // all ints stay int
    t.dtypes("b") shouldBe "DoubleType"   // int + float promotes
    t.dtypes("c") shouldBe "StringType"   // unparseable promotes to string
  }

  test("groupBy with unknown agg fn names the known set") {
    val e = intercept[IllegalArgumentException](
      people.groupBy(Seq("age"), Seq(Agg("z", "frobnicate", "bal"))).df.collect())
    e.getMessage should include("frobnicate")
  }

  test("transform broadcasts group agg back to every row (no join)") {
    val t = people.transform(Seq("age"), Seq(Agg("age_total", "sum", "bal")))
    t.rows shouldBe 4  // row count preserved
    rowsOf(t.df.filter(col("name") === "ann")).head.getAs[Double]("age_total") shouldBe 175.0
  }

  test("iterateBy runs per-group logic in executors") {
    val out = StructType(Seq(StructField("age", IntegerType), StructField("names", StringType)))
    val t = people.iterateBy(Seq("age"))(out) { (k, rows) =>
      Iterator.single(Row(k.getInt(0), rows.map(_.getString(1)).toSeq.sorted.mkString(",")))
    }
    canon(t.df) shouldBe Seq(Seq("25", "bob,dan"), Seq("30", "ann,cyd"))
  }

  test("innerJoin equi + duplicate-column rule (left wins)") {
    val left = Tafra(Seq((1L, "L1"), (2L, "L2")).toDF("id", "tag"))
    val right = Tafra(Seq((1L, "R1", 9.0), (3L, "R3", 7.0)).toDF("rid", "tag", "w"))
    val j = left.innerJoin(right, Seq(("id", "rid", "==")))
    j.columns shouldBe Seq("id", "tag", "rid", "w") // right's colliding `tag` dropped
    rowsOf(j.df).head.getString(1) shouldBe "L1"    // left's value kept
  }

  test("innerJoin theta residual ops") {
    val a = Tafra(Seq((1, 10), (2, 20)).toDF("k", "v"))
    val b = Tafra(Seq((1, 5), (1, 15), (2, 25)).toDF("k2", "w"))
    val j = a.innerJoin(b, Seq(("k", "k2", "=="), ("v", "w", ">")))
    canon(j.df) shouldBe Seq(Seq("1", "10", "1", "5"))
  }

  test("innerJoin validates dtype compatibility like the reference") {
    val a = Tafra(Seq((1, "x")).toDF("k", "s"))
    val b = Tafra(Seq((1L, "y")).toDF("k2", "t"))
    intercept[IllegalArgumentException](a.innerJoin(b, Seq(("k", "k2", "=="))))
  }

  test("innerJoin rejects unknown op") {
    val a = Tafra(Seq((1, 2)).toDF("k", "v"))
    intercept[IllegalArgumentException](a.innerJoin(a, Seq(("k", "k", "~"))))
  }

  test("leftJoin keeps unmatched left rows with nulls") {
    val left = Tafra(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val right = Tafra(Seq((1L, 9.0)).toDF("rid", "w"))
    val j = left.leftJoin(right, Seq(("id", "rid", "==")))
    j.rows shouldBe 2
    rowsOf(j.df.filter(col("id") === 2)).head.isNullAt(3) shouldBe true
  }

  test("crossJoin is the full cartesian product") {
    val a = Tafra(Seq(1, 2).toDF("x"))
    val b = Tafra(Seq("p", "q", "r").toDF("y"))
    a.crossJoin(b).rows shouldBe 6
  }

  test("join select filters output columns") {
    val left = Tafra(Seq((1L, "a")).toDF("id", "s"))
    val right = Tafra(Seq((1L, 9.0)).toDF("rid", "w"))
    left.innerJoin(right, Seq(("id", "rid", "==")), select = Seq("id", "w"))
      .columns shouldBe Seq("id", "w")
  }

  test("rowMap applies a typed per-row function") {
    val out = StructType(Seq(StructField("id", LongType), StructField("nm", StringType)))
    val t = people.select(Seq("id", "name")).rowMap(out) { r =>
      Row(r.getLong(0) * 10, r.getString(1).toUpperCase)
    }
    canon(t.df).head shouldBe Seq("10", "ANN")
  }

  test("pipe and >> chain frame functions") {
    import Tafra.TafraOps
    val double = (t: Tafra) => t.update("bal", col("bal") * 2)
    val viaPipe = people.pipe(double).df.agg(sum("bal")).as[Double].head()
    val viaOp = (people >> double).df.agg(sum("bal")).as[Double].head()
    viaPipe shouldBe 500.0
    viaOp shouldBe 500.0
  }

  test("parquet round trip (to_* / from_* surface)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/t"
    people.toParquet(dir)
    val back = Tafra.readParquet(spark, dir)
    canon(back.df) shouldBe canon(people.df)
  }

  test("csv round trip via toCsv") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/t"
    people.toCsv(dir)
    val back = graft.sources.CsvSource.read(spark, dir)
    back.rows shouldBe 4
    back.dtypes("id") shouldBe "IntegerType" // inferSchema promoted from string
  }

  test("toRecords / toLocalIterator materialize driver-side") {
    people.toRecords.length shouldBe 4
    var n = 0
    val it = people.toLocalIterator
    while (it.hasNext) { it.next(); n += 1 }
    n shouldBe 4
  }

  test("fromRecords builds a frame from rows + schema") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val t = Tafra.fromRecords(spark, schema, Seq(Row(1L, "a"), Row(2L, null)))
    t.rows shouldBe 2
    t.dtypes("v") shouldBe "StringType"
  }

  test("pformat aligns columns; toHtml escapes and tabulates") {
    val t = people.sort(Seq(col("name"))).pipe(p => Tafra(p.df.limit(2)))
    val txt = t.pformat()
    txt.linesIterator.toSeq.length shouldBe 4 // header + sep + 2 rows
    txt should include("name (StringType)")
    val html = Tafra(spark.sql("SELECT '<b>x</b>' AS v")).toHtml()
    html should include("<table>")
    html should include("&lt;b&gt;x&lt;/b&gt;")
  }

  test("pformat honors indent, width, and depth like the reference knobs") {
    val t = Tafra(Seq((1L, Seq(1, 2, 3, 4, 5))).toDF("id", "xs"))
    val txt = t.pformat(indent = 2, width = 30, depth = Some(2))
    txt.linesIterator.foreach { l =>
      l should startWith("  ")
      l.length should be <= 30
    }
    txt should include("[1, 2, …]")
  }

  test("iterrows / itertuples / itercols mirror the reference iterators") {
    val t = people.sort(Seq(col("id"))).select(Seq("id", "name"))
    t.iterrows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    t.itertuples.next() shouldBe Seq(1L, "ann")
    val cols = t.itercols.toSeq
    cols.map(_._1) shouldBe Seq("id", "name")
    cols.head._2.toSeq shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("colMap / keyMap map over column arrays") {
    val t = people.select(Seq("age", "bal"))
    t.colMap(_.length).toSeq shouldBe Seq(4, 4)
    val m = t.keyMap(v => v.map(x => x.asInstanceOf[Number].doubleValue()).sum).toMap
    m("age") shouldBe 110.0
    m("bal") shouldBe 250.0
  }

  test("dict surface: keys / values / items / get") {
    val t = people.select(Seq("id", "name"))
    t.keys shouldBe Seq("id", "name")
    t.values.map(_.length) shouldBe Seq(4, 4)
    t.items.map(_._1) shouldBe Seq("id", "name")
    t.get("name").get.toSet shouldBe Set("ann", "bob", "cyd", "dan")
    t.get("missing") shouldBe None
  }

  test("toList / toArray / toColumnMap export like to_list / to_array / to_tuple") {
    val t = people.sort(Seq(col("id"))).select(Seq("id", "age"))
    val byCol = t.toList()
    byCol.length shouldBe 2
    byCol.head.toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    val rowMajor = t.toArray(Seq("age"))
    rowMajor.map(_.toSeq) shouldBe Array(Seq(30), Seq(25), Seq(30), Seq(25))
    t.toColumnMap()("age").toSeq shouldBe Seq(30, 25, 30, 25)
    intercept[IllegalArgumentException](t.toList(Seq("nope")))
  }

  test("fromDataFrame / asTafra / fromSeries interop constructors") {
    import Tafra.DataFrameOps
    val df = Seq((1, "x")).toDF("a", "b")
    Tafra.fromDataFrame(df).columns shouldBe Seq("a", "b")
    df.asTafra.rows shouldBe 1
    val s = Tafra.fromSeries(spark, "score", "double", Seq(1.5, 2.5, null))
    s.columns shouldBe Seq("score")
    s.dtypes("score") shouldBe "DoubleType"
    s.rows shouldBe 3
  }

  test("parseObjectDtypes converts fully-parseable string columns only") {
    val t = Tafra(Seq(
      ("1", "1.5", "true", "abc", "7"),
      ("2", "x", "false", "def", null)).toDF("ints", "notnum", "bools", "strs", "optint"))
      .parseObjectDtypes()
    t.dtypes("ints") shouldBe "LongType"
    t.dtypes("notnum") shouldBe "StringType"  // one unparseable value → stays
    t.dtypes("bools") shouldBe "BooleanType"
    t.dtypes("strs") shouldBe "StringType"
    t.dtypes("optint") shouldBe "LongType"    // nulls don't block parsing
    t.df.agg(sum("ints")).head().getLong(0) shouldBe 3L
  }

  test("partitioned parquet write prunes directories on partition filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    people.toParquet(dir, Seq("age"))
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "age=30")) shouldBe true
    val back = Tafra.readParquet(spark, dir).filter(col("age") === 30)
    back.rows shouldBe 2
    // partition filter prunes at planning: only the age=30 directory scans
    back.df.queryExecution.executedPlan.toString should include("PartitionFilters")
  }

  test("bucketed tables join without an exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    people.writeBucketed("graft_people_bkt", Seq("id"), 4, Seq("id"), Some(s"$tmp/p"))
    people.select(Seq("id", "bal")).rename(Map("id" -> "rid", "bal" -> "bal2"))
      .writeBucketed("graft_people_bkt2", Seq("rid"), 4, Seq("rid"), Some(s"$tmp/q"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Tafra.readTable(spark, "graft_people_bkt")
        .innerJoin(Tafra.readTable(spark, "graft_people_bkt2"), Seq(("id", "rid", "==")))
      j.rows shouldBe 4
      (j.df.queryExecution.executedPlan.toString should not).include("Exchange hashpartitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("sampleHash is reproducible, partition-independent, and key-consistent") {
    val big = Tafra(spark.range(0, 2000).toDF("id"))
    val s1 = big.sampleHash(0.3, Seq("id")).df.collect().map(_.getLong(0)).toSet
    val s2 = big.df.repartition(7).asInstanceOf[org.apache.spark.sql.DataFrame]
    val s2t = Tafra(s2).sampleHash(0.3, Seq("id")).df.collect().map(_.getLong(0)).toSet
    s1 shouldBe s2t // same rows regardless of partitioning
    s1.size.toDouble / 2000 shouldBe 0.3 +- 0.05
    // different seed → different slice
    val s3 = big.sampleHash(0.3, Seq("id"), seed = 7).df.collect().map(_.getLong(0)).toSet
    s3 should not be s1
  }

  test("sampleHashWeighted: w=1 keeps all, w=0 drops all, kept sets nest as weight grows") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val base = spark.range(0, 2000).toDF("id")
    def kept(w: Double): Set[Long] =
      Tafra(base.withColumn("w", lit(w))).sampleHashWeighted("w", Seq("id"))
        .df.collect().map(_.getLong(0)).toSet
    kept(1.0).size shouldBe 2000
    kept(0.0).size shouldBe 0
    val k25 = kept(0.25); val k50 = kept(0.5)
    k25.size.toDouble / 2000 shouldBe 0.25 +- 0.05
    k50.size.toDouble / 2000 shouldBe 0.5 +- 0.05
    k25.subsetOf(k50) shouldBe true // thresholds nest: a row kept at w stays kept at w' > w
    // per-row weights act independently: evens at 1.0 all keep, odds at 0 all drop
    val mixed = Tafra(base.withColumn("w",
        when(col("id") % 2 === 0, lit(1.0)).otherwise(lit(0.0))))
      .sampleHashWeighted("w", Seq("id")).df.collect().map(_.getLong(0))
    mixed.length shouldBe 1000
    all(mixed.map(_ % 2)) shouldBe 0L
  }

  test("JSONL round trip preserves rows and types, with and without an explicit schema") {
    import org.apache.spark.sql.types.StructType
    val src = Tafra(Seq((1L, "a b", 2.5), (2L, "c \"quoted\" d", -0.5))
      .toDF("id", "txt", "score"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    src.toJsonl(dir)
    val ddl = "id bigint, txt string, score double"
    val withSchema = Tafra.readJsonl(spark, dir, Some(StructType.fromDDL(ddl)))
      .select(Seq("id", "txt", "score"))
    canon(withSchema.df) shouldBe canon(src.df)
    // names + types match; nullability legitimately differs (JSON rows
    // may omit fields, Seq-derived columns are non-null)
    withSchema.df.dtypes.toSeq shouldBe src.df.dtypes.toSeq
    // inference path agrees on this data too
    canon(Tafra.readJsonl(spark, dir).select(Seq("id", "txt", "score")).df) shouldBe canon(src.df)
  }

  test("sampleBy keeps per-stratum fractions") {
    val t = Tafra((1 to 1000).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("i", "g"))
    val s = t.sampleBy("g", Map[Any, Double]("a" -> 1.0, "b" -> 0.0))
    val gs = s.df.select("g").as[String].collect().toSet
    gs shouldBe Set("a")
    s.rows shouldBe 500
  }

  test("readSql reads a live database via JDBC, plain and partitioned") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    try st.execute("DROP TABLE emp") catch { case _: java.sql.SQLException => () }
    st.execute("CREATE TABLE emp (id INT, name VARCHAR(20), sal DOUBLE)")
    (1 to 10).foreach(i => st.execute(s"INSERT INTO emp VALUES ($i, 'n$i', ${i * 10.0})"))
    st.close(); conn.close()

    val t = Tafra.readSql(spark, url, "SELECT id, name, sal FROM emp WHERE id <= 8")
    t.rows shouldBe 8
    t.df.agg(sum("sal")).head().getDouble(0) shouldBe 360.0

    // partitioned range read (the scale path of read_sql_chunks)
    val tp = Tafra.readSql(spark, url, "SELECT id, sal FROM emp",
      partitionColumn = Some("id"), lowerBound = 1, upperBound = 11, numPartitions = 4)
    tp.df.rdd.getNumPartitions shouldBe 4
    tp.rows shouldBe 10
    tp.df.agg(sum("sal")).head().getDouble(0) shouldBe 550.0
  }

  test("splitByHash: deterministic, partition-independent, near-requested proportions") {
    val big = Tafra(spark.range(0, 4000).toDF("id"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = big.splitByHash(splits, Seq("id")).df
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Tafra(big.df.repartition(13)).splitByHash(splits, Seq("id")).df
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b // content-addressed: same key, same split, any layout
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    counts("train").toDouble / 4000 shouldBe 0.8 +- 0.03
    counts("val").toDouble / 4000 shouldBe 0.1 +- 0.03
    counts("test").toDouble / 4000 shouldBe 0.1 +- 0.03
  }

  test("sampleHashBy keeps deterministic per-stratum fractions and drops unlisted strata") {
    val t = Tafra((0L until 2000L).map(i => (i, s"s${i % 2}")).toDF("id", "g"))
    val mixed = t.sampleHashBy("g", Map("s0" -> 1.0, "s1" -> 0.25), Seq("id"))
    val byG = mixed.df.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byG("s0").size shouldBe 1000 // fraction 1.0 keeps everything
    byG("s1").size.toDouble / 1000 shouldBe 0.25 +- 0.05
    // deterministic: identical kept set on a reshuffled layout
    val again = Tafra(t.df.repartition(11)).sampleHashBy("g", Map("s0" -> 1.0, "s1" -> 0.25), Seq("id"))
      .df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    again shouldBe mixed.df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // unlisted stratum drops
    t.sampleHashBy("g", Map("s0" -> 1.0), Seq("id"))
      .df.select("g").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("s0")
  }

  test("mixToBudget: derived fractions cap at 1, nest as budgets grow, unbudgeted drop") {
    // 2 strata × 1000 rows × 10 tokens each = 10000 tokens per stratum
    val t = Tafra((0L until 2000L).map(i => (i, s"s${i % 2}", 10L))
      .toDF("id", "g", "n_tok"))
    def keep(budgets: Map[String, Long]): Map[String, Set[Long]] =
      t.mixToBudget("g", "n_tok", budgets, Seq("id")).df.select("id", "g").collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val m = keep(Map("s0" -> 100000L, "s1" -> 2500L))
    m("s0").size shouldBe 1000 // budget ≥ total → frac caps at 1.0
    m("s1").size.toDouble / 1000 shouldBe 0.25 +- 0.05
    (keep(Map("s0" -> 100000L)) contains "s1") shouldBe false // unbudgeted drops
    // kept sets nest as the budget grows
    val small = keep(Map("s1" -> 1000L))("s1")
    small.subsetOf(m("s1")) shouldBe true
    small.size should be < m("s1").size
  }

  test("semiJoin keeps matched rows un-widened; antiJoin keeps the complement") {
    val orders = Tafra(Seq((1L, 9.0), (1L, 3.0), (3L, 5.0)).toDF("cust", "amt"))
    val semi = people.semiJoin(orders, Seq(("id", "cust", "==")))
    semi.columns shouldBe people.columns // never widens
    // id 1 matches TWICE but appears once: no fan-out
    semi.df.select("id").collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 3L)
    val anti = people.antiJoin(orders, Seq(("id", "cust", "==")))
    anti.df.select("id").collect().map(_.getLong(0)).sorted shouldBe Seq(2L, 4L)
    // dtype validation still applies
    intercept[IllegalArgumentException](
      people.semiJoin(orders, Seq(("name", "cust", "=="))))
  }

  test("percentileRank equals cume_dist, computed over the value histogram") {
    import graft.functions.Profile
    val df = Seq(("a", 10), ("a", 20), ("a", 20), ("a", 30),
                 ("b", 5), ("b", 7)).toDF("g", "v")
    val out = Profile.percentileRank(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // ties share the at-or-below fraction, exactly like cume_dist
    out.count(_ == ("a", 20, 0.75)) shouldBe 2
    out should contain("a", 10, 0.25)
    out should contain("a", 30, 1.0)
    out should contain("b", 5, 0.5)
    out should contain("b", 7, 1.0)
    val viaWindow = df.withColumn("pct",
      cume_dist().over(org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    out.sorted shouldBe viaWindow
  }

  test("ORC round-trip is lossless and filters push into the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_").toString
    people.toOrc(dir)
    val back = Tafra.readOrc(spark, dir)
    back.df.orderBy("id").collect().map(_.toSeq) shouldBe
      people.df.orderBy("id").collect().map(_.toSeq)
    val plan = back.filter(col("age") > 26).df.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThan(age,26)")
  }

  test("sampleWeightedTopK: exact counts, weight-proportional selection, deterministic") {
    // stratum of 2000 rows: half weight 10, half weight 1 → the
    // heavy half should win far more than half of a k=200 sample
    val t = Tafra((0L until 2000L).map(i => (i, "g", if (i < 1000) 10.0 else 1.0))
      .toDF("id", "g", "w"))
    val kept = t.sampleWeightedTopK(200, Seq("g"), "w", Seq("id")).df
      .collect().map(r => r.getLong(0)).toSet
    kept.size shouldBe 200
    val heavy = kept.count(_ < 1000L)
    heavy should be > 150 // E[heavy] ≈ 183 under A-ES with 10:1 weights
    // deterministic: the same call selects the identical set
    t.sampleWeightedTopK(200, Seq("g"), "w", Seq("id")).df
      .collect().map(_.getLong(0)).toSet shouldBe kept
  }

  test("madOutliers flags only the planted extreme; robust to the outlier itself") {
    import graft.functions.Profile
    // 20 values near 100 plus one at 10000: median/MAD ignore the spike
    val df = ((1 to 20).map(i => (i.toLong, "g", 95L + (i % 11))) :+ (99L, "g", 10000L))
      .toDF("id", "g", "v")
    val out = Profile.madOutliers(df, "g", "v").collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    out(99L) shouldBe true
    out.count(_._2) shouldBe 1 // nothing else flagged
  }

  test("corrMatrix matches built-in Pearson corr on unit-grid data; one agg in plan") {
    import graft.functions.Profile
    val rnd3 = new scala.util.Random(5)
    // values on the 0.01 grid → quantization is lossless
    val rows = (0 until 500).map { _ =>
      val x = rnd3.nextInt(5000) / 100.0
      (x, x * 3 + rnd3.nextInt(1000) / 100.0, rnd3.nextInt(100) / 100.0)
    }
    val df = rows.toDF("x", "y", "z")
    val out = Profile.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    out.size shouldBe 3
    out(("x", "y")) shouldBe df.stat.corr("x", "y") +- 1e-9
    out(("x", "z")) shouldBe df.stat.corr("x", "z") +- 1e-9
    out(("y", "z")) shouldBe df.stat.corr("y", "z") +- 1e-9
    out(("x", "y")) should be > 0.9 // the planted linear dependence shows
  }

  test("sampleTopKByHash: exact stratum counts, nesting, WindowGroupLimit pushdown") {
    val t = Tafra((0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "g"))
    def keep(k: Int): Map[String, Set[Long]] =
      t.sampleTopKByHash(k, Seq("g"), Seq("id")).df.collect()
        .map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val k10 = keep(10)
    k10.values.map(_.size).toSet shouldBe Set(10) // exact count per stratum
    val k5 = keep(5)
    k5.foreach { case (g, s) => s.subsetOf(k10(g)) shouldBe true } // nests
    // quota pruned before the shuffle: the rn <= k filter pushes down
    t.sampleTopKByHash(10, Seq("g"), Seq("id")).df
      .queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  test("pivot widens, unpivot melts back; absent combos are NULL cells") {
    val t = Tafra(Seq(("p1", "A", 10.0), ("p1", "A", 5.0), ("p1", "B", 2.0),
                      ("p2", "B", 7.0)).toDF("k", "s", "v"))
    val wide = t.pivot(Seq("k"), "s", Seq("A", "B"), Agg("total", "sum", "v"))
    wide.columns.head shouldBe "k"
    wide.columns.size shouldBe 3 // k + one per pivot value
    val rows = wide.df.collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    rows("p1") shouldBe ((15.0, 2.0))
    rows("p2")._1.asInstanceOf[AnyRef] shouldBe null // no A rows → NULL cell, not 0
    rows("p2")._2 shouldBe 7.0
    // melt back: every (k, value-col) cell becomes a row, NULLs kept
    val long = wide.unpivot(Seq("k"), wide.columns.drop(1), "s", "total")
    long.columns shouldBe Seq("k", "s", "total")
    long.rows shouldBe 4
    long.df.where(col("total").isNull).count() shouldBe 1
    // round trip: non-null long rows = the original groupBy
    val back = long.df.where(col("total").isNotNull)
      .select("k", "s", "total").collect().map(_.toSeq).toSet
    back shouldBe Set(Seq("p1", "A", 15.0), Seq("p1", "B", 2.0), Seq("p2", "B", 7.0))
  }

}
