package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Similarity

/** Round-5 curation additions: blocklist census, leakage-safe k-fold,
  * ANN recall audit, and the k-means|| oversampling round — verified
  * against planted corpora and driver-side replications.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- blocklist census ----

  test("blocklistCensus counts case-insensitive substring occurrences, drops misses") {
    val docs = Seq(
      (1L, "Spark and SPARK and sparkles"),        // 3 hits incl. substring+case
      (2L, "a window dup here, window dupes there"), // phrase hits twice
      (3L, "nothing to see")
    ).toDF("doc_id", "text")
    val out = TextFunctions.blocklistCensus(docs, Seq("spark", "window dup", "zzz"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    out shouldBe Map((1L, "spark") -> 3, (2L, "window dup") -> 2)
  }

  test("blocklistCensus counts non-overlapping left-to-right like SQL replace") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextFunctions.blocklistCensus(docs, Seq("aa"))
      .collect().map(r => r.getInt(2))
    out.toSeq shouldBe Seq(2)
  }

  // ---- k-fold ----

  test("kfoldByHash never splits a user across folds and populates every fold") {
    val df = SparkEntry.queries("q195_kfold")(spark, "/root/testdata/sf0.001")
    df.groupBy("user_id").agg(countDistinct("fold").as("nf"))
      .filter(col("nf") > 1).count() shouldBe 0
    df.select("fold").distinct().count() shouldBe 5
    df.agg(min("fold"), max("fold")).head match {
      case r => (r.getInt(0), r.getInt(1)) shouldBe (0, 4)
    }
  }

  // ---- ANN recall audit ----

  test("recallAudit reports perfect recall when every cell is probed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.recallAudit(emb, emb.filter(col("vec_id") < 5),
        k = 5, ncells = 8, nprobe = 8)
      .collect()
    out.length shouldBe 5
    all(out.map(_.getDouble(2))) shouldBe 1.0
  }

  test("recallAudit hit counts are bounded by k and cover every query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.recallAudit(emb, emb.filter(col("vec_id") < 8), k = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.keySet shouldBe (0L until 8L).toSet
    all(out.values) should be <= 10
    all(out.values) should be >= 0
  }

  // ---- mergeable aggregate states ----

  test("mergeAggStates of any batch split equals the from-scratch state") {
    import graft.operators.Upsert
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map(i =>
      (s"k${i % 7}", math.floor(rnd.nextDouble() * 2000 - 1000) / 8))
    val df = rows.toDF("k", "v")
    val direct = Upsert.aggState(df, Seq("k"), "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // three-way split by hash of the value, merged in two different orders
    val parts = (0 until 3).map(p => Upsert.aggState(
      df.filter(abs(hash(col("v"))) % 3 === p), Seq("k"), "v"))
    for (order <- Seq(parts, parts.reverse)) {
      val merged = Upsert.mergeAggStates(order, Seq("k")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      merged shouldBe direct
    }
  }

  test("mergeAggStates passes through keys absent from one side") {
    import graft.operators.Upsert
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v")
    val b = Seq(("y", 4.0), ("z", 8.0)).toDF("k", "v")
    val m = Upsert.mergeAggStates(
        Seq(Upsert.aggState(a, Seq("k"), "v"), Upsert.aggState(b, Seq("k"), "v")), Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    m shouldBe Map("x" -> (1L, 1000000L), "y" -> (2L, 6000000L), "z" -> (1L, 8000000L))
  }

  // ---- k-means|| oversampling ----

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("kmeansOversample matches a driver-computed Bahmani round exactly") {
    val rnd = new scala.util.Random(23)
    val vecs = (1L to 80L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val l = 8
    val got = Similarity.kmeansOversample(df, ncells = 4, l = l)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    // driver replication with the operator's exact arithmetic
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(4).map(_._2)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = vecs.map { case (id, v) =>
      val (mcos, cell) = seeds.zipWithIndex.map { case (s, c) => (cos(v, s), c) }
        .maxBy { case (c, cell) => (c, -cell) }
      val d = 1.0 - mcos
      (id, cell, math.floor(d * d * 1e12 + 0.5).toLong)
    }
    val cost = scored.map(_._3).sum.toDouble
    val want = scored.flatMap { case (id, cell, d2q) =>
      val frac = java.lang.Long.parseLong(md5hex(id.toString).take(15), 16).toDouble /
        1152921504606846976.0
      if (frac < l.toDouble * d2q.toDouble / cost) Some((id, cell, d2q.toDouble / 1e12))
      else None
    }.toSet
    got shouldBe want
    // seeds have d² = 0 and can never be re-picked; the round keeps some rows
    want.map(_._1).intersect(
      vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(4).map(_._1).toSet
    ) shouldBe Set.empty
    want should not be empty
  }
}
