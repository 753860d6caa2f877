package graft

import org.apache.spark.sql.functions._

import graft.operators.{Rolling, Similarity}

/** Round-5 additions: label-conformity (mislabel) scoring and
  * seasonal-baseline residual anomalies.
  */
class ConformitySeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("labelConformity scores own-label centroid cosine; flags the planted mislabel") {
    // label 0 clusters near +e1, label 1 near +e2; vector 99 claims
    // label 0 but points along e2 → low conformity
    def v(x: Float, y: Float) = Array(x, y, 0.1f, 0.1f)
    val vecs = Seq(
      (1L, v(1.0f, 0.1f), 0), (2L, v(0.9f, 0.2f), 0), (3L, v(1.1f, 0.0f), 0),
      (11L, v(0.1f, 1.0f), 1), (12L, v(0.0f, 0.9f), 1),
      (99L, v(0.05f, 1.2f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelConformity(vecs, minCos = "0.8")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 11L, 12L, 99L)
    Seq(1L, 2L, 3L, 11L, 12L).foreach { id => out(id)._2 shouldBe false }
    out(99L)._2 shouldBe true
    out(99L)._1 should be < out(1L)._1
  }

  test("labelConformity matches a driver-computed centroid cosine") {
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 30L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2 - 1), (i % 3).toInt))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelConformity(df, minCos = "0.0")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // driver reference: exact quantized means → float centroid → cosine
    val cents = vecs.groupBy(_._3).map { case (l, vs) =>
      val n = vs.size
      l -> (0 until 6).map { d =>
        val s = vs.map(v => math.floor(v._2(d).toDouble * 1e12 + 0.5).toLong).sum
        (s.toDouble / 1e12 / n).toFloat
      }
    }
    for ((id, arr, l) <- vecs) {
      val c = cents(l)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until 6) {
        dot += arr(i).toDouble * c(i).toDouble
        na += arr(i).toDouble * arr(i).toDouble
        nb += c(i).toDouble * c(i).toDouble
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      out(id) shouldBe BigDecimal(cos)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
  }

  test("seasonalAnomaly flags deviation from the hour-of-day mean, not the global mean") {
    val hour = 3600000000L
    // key k: hour 0 runs near 100, hour 1 near 10; a 100-valued event
    // at hour 1 is a big anomaly even though 100 is the GLOBAL norm
    val rows = Seq(
      ("k", 0L * hour + 1, 100.0), ("k", 0L * hour + 2, 101.0),
      ("k", 0L * hour + 3, 99.0),
      ("k", 1L * hour + 1, 10.0), ("k", 1L * hour + 2, 11.0),
      ("k", 1L * hour + 3, 9.0), ("k", 1L * hour + 4, 10.0),
      ("k", 1L * hour + 5, 12.0),
      ("k", 1L * hour + 6, 100.0), // planted: hour-1 mean ≈ 23.7
      // next day, hour 0 again → same bucket as day-1 hour 0
      ("k", 24L * hour + 5, 98.0))
    val out = Rolling.seasonalAnomaly(
      rows.toDF("k", "t", "v"), "k", "t", "v", threshold = 20.0)
      .select("t", "is_anomaly")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    out(1L * hour + 6) shouldBe true // |100 − 23.67| ≫ 20
    Seq(1, 2, 3).foreach(i => out(0L * hour + i) shouldBe false)
    // normal hour-1 traffic stays under: |10 − 23.67| < 20
    out(1L * hour + 1) shouldBe false
  }

  test("seasonalAnomaly hour buckets wrap across days") {
    val hour = 3600000000L
    val rows = Seq(("k", 5L * hour, 1.0), ("k", 29L * hour, 1.0))
    val out = Rolling.seasonalAnomaly(rows.toDF("k", "t", "v"), "k", "t", "v", 1.0)
    out.select("hod").distinct().collect().map(_.getInt(0)).toSeq shouldBe Seq(5)
  }

  test("seasonalDecompose recovers a planted pure rhythm: flat trend, exact slot means, zero residual") {
    val hour = 3600000000L
    // y(h) = 100 + (h mod 24): pure daily rhythm, no growth, no noise.
    // Interior trend = the cycle mean 111.5; seasonal(k) = k − 11.5;
    // residual = 0 wherever the 24h frame is full.
    val rows = (0 until 96).map(h =>
      (h.toLong * hour + 1, 100.0 + (h % 24).toDouble))
    val df = rows.toDF("tus", "v").select(
      org.apache.spark.sql.functions.timestamp_micros(col("tus")).as("ts"), col("v"))
    val out = Rolling.seasonalDecompose(df, "ts", "v").collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 3600,
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    out.size shouldBe 96
    // edges: first 12 and last 11 hours have no full frame
    (0L until 12L).foreach(h => out(h)._1 shouldBe None)
    (85L until 96L).foreach(h => out(h)._1 shouldBe None)
    (12L until 85L).foreach { h =>
      out(h)._1.get shouldBe 111.5 +- 1e-9
      out(h)._3.get shouldBe 0.0 +- 1e-9
    }
    // seasonal(k) = k − 11.5 on every row of slot k
    (0L until 96L).foreach { h =>
      out(h)._2 shouldBe ((h % 24) - 11.5) +- 1e-9
    }
  }
}
