package graft

import org.apache.spark.sql.functions._

import graft.operators.{Rolling, Similarity}

/** Round-5 additions: Page's CUSUM change-point scores (closed prefix
  * form ≡ recurrence) and centroid-distance embedding outliers vs a
  * driver-computed reference.
  */
class CusumOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("cusum prefix form equals Page's recurrence on random walks") {
    val rnd = new scala.util.Random(29)
    val rows = for (k <- Seq("a", "b"); i <- 1 to 200) yield
      (k, i.toLong * 10, (k.hashCode % 3).toLong, math.floor(rnd.nextDouble() * 2000) / 10)
    val df = rows.map { case (k, t, _, v) => (k, t, v) }.toDF("k", "t", "v")
    val out = Rolling.cusum(df, "k", "t", "v", target = 100.0, h = 500.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap

    for (k <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == k).sortBy(_._2)
      var sPos = 0L; var sNeg = 0L
      for ((_, t, _, v) <- vs) {
        val dev = math.floor(v * 1000000L + 0.5).toLong - 100000000L
        sPos = math.max(0L, sPos + dev)
        sNeg = math.max(0L, sNeg - dev)
        val (hi, lo, flag) = out((k, t))
        hi shouldBe sPos
        lo shouldBe sNeg
        flag shouldBe (sPos > 500000000L || sNeg > 500000000L)
      }
    }
  }

  test("cusum detects a planted sustained mean shift that single spikes don't trip") {
    // 50 on-target points, then 50 points shifted +3 (each tiny, sum large)
    val rows = (1 to 50).map(i => ("k", i.toLong, 10.0)) ++
      (51 to 100).map(i => ("k", i.toLong, 13.0))
    val out = Rolling.cusum(rows.toDF("k", "t", "v"), "k", "t", "v",
      target = 10.0, h = 100.0)
      .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    (1 to 50).foreach(out(_) shouldBe false)
    out(100) shouldBe true // 50 × +3 = +150 cumulative > h = 100
  }

  test("cusum runs in one exchange and one sort per plan") {
    val df = (1 to 40).map(i => ("k", i.toLong, 1.0)).toDF("k", "t", "v")
    val p = Rolling.cusum(df, "k", "t", "v", 1.0, 5.0)
      .queryExecution.executedPlan.toString
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    // all three running aggregates share one window spec → one sort
    p.linesIterator.count(_.contains("Sort [")) shouldBe 1
  }

  test("centroidOutliers matches a driver-computed nearest-centroid assignment") {
    val rnd = new scala.util.Random(37)
    val vecs = (1L to 40L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, minCos = "0.3", ncells = 4,
      vecCol = "embedding", idCol = "vec_id")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3))).toMap

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(4).map(_._2)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((id, v) <- vecs) {
      val scored = seeds.zipWithIndex.map { case (s, c) => (cos(v, s), c) }
      val (bestCos, bestCell) = scored.maxBy { case (c, cell) => (c, -cell) }
      out(id)._1 shouldBe bestCell
      out(id)._2 shouldBe BigDecimal(bestCos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
      // flag: cosine quantized to 6 decimals below the 0.3 threshold
      val flagged = BigDecimal(bestCos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) < BigDecimal("0.3")
      out(id)._3 shouldBe flagged
    }
  }
}
