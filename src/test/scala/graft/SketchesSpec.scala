package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.operators.Upsert
import graft.sources.BinaryDir

/** Sketches (SURVEY.md §2 #60-61), CDC upsert (#62), binaryFile ingest
  * (#63): the sketch laws (upper bound, mergeability, error bound at
  * the configured sizes), the merge semantics matrix, and the raw-file
  * round trip.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def keysDF(freq: Map[String, Int]) =
    freq.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")

  test("count-min estimates are exact-or-over, never under") {
    val freq = Map("a" -> 100, "b" -> 50, "c" -> 3, "d" -> 1)
    val df = keysDF(freq)
    val sk = Sketches.cmsBuild(df, "k", depth = 4, width = 64)
    val est = Sketches.cmsEstimate(sk, df.distinct(), "k", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, n) <- freq) est(k) should be >= n.toLong
    // width 64 over 4 distinct keys: collisions vanishingly unlikely,
    // and with depth 4 the MIN needs a collision in EVERY row to drift
    est shouldBe freq.map { case (k, n) => k -> n.toLong }
    // unseen key estimates 0 via the left join
    val unseen = Sketches.cmsEstimate(sk, Seq("zz").toDF("k"), "k", depth = 4, width = 64)
    unseen.collect().head.getLong(1) shouldBe 0L
  }

  test("count-min sketches MERGE: cell-wise sum of shard sketches equals the full build") {
    val df = (1 to 400).map(i => s"k${i % 37}").toDF("k")
    val (h1, h2) = (df.filter(md5(col("k")).substr(1, 1) < "8"),
                    df.filter(md5(col("k")).substr(1, 1) >= "8"))
    val merged = Sketches.cmsBuild(h1, "k").unionByName(Sketches.cmsBuild(h2, "k"))
      .groupBy("j", "cell").agg(sum("cnt").as("cnt"))
    canon(merged) shouldBe canon(Sketches.cmsBuild(df, "k"))
  }

  test("HLL registers MERGE by max; estimate lands within 5% at p=10 on 5k keys") {
    val df = (1 to 5000).map(i => s"user_$i").toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "k", 10), 10)
      .collect().head.getAs[Double]("est")
    est shouldBe 5000.0 +- 250.0
    // shard registers merge with MAX — same registers as the full pass
    val (h1, h2) = (df.filter(org.apache.spark.sql.functions.length(col("k")) <= 6),
                    df.filter(org.apache.spark.sql.functions.length(col("k")) > 6))
    val merged = Sketches.hllRegisters(h1, "k", 10)
      .unionByName(Sketches.hllRegisters(h2, "k", 10))
      .groupBy("bucket").agg(max("r").as("r"))
    canon(merged) shouldBe canon(Sketches.hllRegisters(df, "k", 10))
  }

  test("grouped HLL registers equal the per-group single-table build") {
    // ≥ 2.5·m keys per group — the raw estimator's valid range (no
    // small-range LinearCounting correction by documented contract)
    val df = (1 to 15000).map(i => (s"g${i % 3}", s"user_${i % 5000}")).toDF("g", "k")
    val grouped = Sketches.hllRegistersBy(df, Seq("g"), "k", 10)
    for (g <- Seq("g0", "g1", "g2")) {
      canon(grouped.filter(col("g") === g).select("bucket", "r")) shouldBe
        canon(Sketches.hllRegisters(df.filter(col("g") === g), "k", 10))
    }
    // per-group estimates carry through the same arithmetic; each group
    // holds every key (gcd(3, 5000) = 1 → residues cover all of them)
    val est = Sketches.hllEstimateBy(grouped, Seq("g"), 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    est.keySet shouldBe Set("g0", "g1", "g2")
    all(est.values.map(_ / 5000.0)) should (be >= 0.9 and be <= 1.1)
  }

  test("HLL estimate is insensitive to duplication (registers are max, not sum)") {
    val once = (1 to 500).map(i => s"u$i").toDF("k")
    val dup = once.union(once).union(once)
    canon(Sketches.hllRegisters(dup, "k", 10)) shouldBe canon(Sketches.hllRegisters(once, "k", 10))
  }

  test("quantileState merges split-invariantly and bounds quantile error by 2^-subBits") {
    import graft.functions.Sketches
    val rnd = new scala.util.Random(61)
    // log-spread positive values + a negative band; two keys
    val rows = (1 to 4000).map { i =>
      val k = if (i % 3 == 0) "a" else "b"
      val mag = math.exp(rnd.nextDouble() * 10) // 1 .. ~22000
      (i.toLong, k, if (i % 17 == 0) -mag else mag)
    }
    val df = rows.toDF("id", "k", "v")
    def canon(st: org.apache.spark.sql.DataFrame) = st.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.quantileState(df, Seq("k"), "v")
    // ANY split merges back to the direct state, bit for bit
    val parts = (0 until 3).map(p =>
      Sketches.quantileState(df.filter(col("id") % 3 === p), Seq("k"), "v"))
    canon(Sketches.mergeQuantileStates(parts, Seq("k"))) shouldBe canon(direct)
    canon(Sketches.mergeQuantileStates(parts.reverse, Seq("k"))) shouldBe canon(direct)
    // state is BOUNDED: far fewer bins than distinct values
    val nBins = direct.count()
    val nVals = df.select("k", "v").distinct().count()
    nBins.toDouble should be < nVals.toDouble / 3
    // error bound: the estimate is the type-1 quantile's value
    // truncated toward zero to 6 significant bits
    for ((pn, pd) <- Seq((1L, 2L), (9L, 10L), (99L, 100L))) {
      val est = Sketches.quantileOf(direct, Seq("k"), pn, pd)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      for (k <- Seq("a", "b")) {
        val vs = rows.filter(_._2 == k)
          .map(x => math.floor(x._3 * 1e6 + 0.5) / 1e6).sorted
        val exact = vs(((vs.size * pn + pd - 1) / pd - 1).toInt)
        math.abs(est(k) - exact) should be <= math.abs(exact) * math.pow(2, -5) + 1e-6
      }
    }
  }

  test("applyChanges: insert, update, delete, latest-wins, tie-break, passthrough") {
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("id", "status", "price")
    val changes = Seq(
      (2L, 1L, "U", "X", 21.0), (2L, 2L, "U", "Y", 22.0),  // latest (seq 2) wins
      (3L, 5L, "D", "-", 0.0),                             // delete key 3
      (4L, 1L, "I", "N", 40.0),                            // insert new key
      (5L, 7L, "U", "Z", 50.0), (5L, 7L, "D", "-", 0.0))   // seq tie: U > D
      .toDF("id", "seq", "op", "status", "price")
    val out = Upsert.applyChanges(base, changes, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    out shouldBe Set(
      (1L, "A", 10.0),   // untouched passthrough
      (2L, "Y", 22.0),   // latest update applied
      (4L, "N", 40.0),   // insert (base had no key)
      (5L, "Z", 50.0))   // same-seq U beats D
  }

  test("applyChanges is idempotent: re-applying the same feed is a no-op") {
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0)).toDF("id", "status", "price")
    val changes = Seq((1L, 3L, "U", "U1", 11.0), (2L, 3L, "D", "-", 0.0))
      .toDF("id", "seq", "op", "status", "price")
    val once = Upsert.applyChanges(base, changes, "id", "seq", "op")
    val twice = Upsert.applyChanges(once, changes, "id", "seq", "op")
    canon(twice) shouldBe canon(once)
  }

  test("binaryFile round trip: materialized text files scan back with exact bytes") {
    val docs = Seq((7L, "hello spark"), (8L, "binary\nsource"), (9L, ""))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_binspec_").toString
    BinaryDir.materializeText(docs, dir)
    val got = BinaryDir.ingest(spark, dir, "doc_*.txt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // the empty doc is skipped by contract: a 0-byte file would get no
    // scan split anyway (see BinaryDir scaladoc)
    val want = docs.filter("doc_id <> 9").select(
        concat(lit("doc_"), col("doc_id"), lit(".txt")),
        org.apache.spark.sql.functions.length(col("text")).cast("long"), md5(col("text")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    got shouldBe want
    // re-materializing a DIFFERENT set cleans stale files first
    BinaryDir.materializeText(Seq((1L, "only")).toDF("doc_id", "text"), dir)
    BinaryDir.ingest(spark, dir, "doc_*.txt").count() shouldBe 1L
  }
}
