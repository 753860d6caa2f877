package graft

import org.apache.spark.sql.functions._

import graft.functions.Profile
import graft.operators.Rolling

/** Round-10 batch 6: SPRT, Dunn's post-hoc, Bland–Altman, Sobel. */
class Round10gOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sprtBernoulli stops early on a clear signal and continues on a knife-edge") {
    // key "hot": 40 straight successes → h1 long before the end;
    // key "cold": 40 straight failures → h0;
    // key "mid": alternating, 6 observations → no decision yet
    val rows =
      (1 to 40).map(i => ("hot", i.toLong, true)) ++
      (1 to 40).map(i => ("cold", i.toLong, false)) ++
      (1 to 6).map(i => ("mid", i.toLong, i % 2 == 0))
    val out = Rolling.sprtBernoulli(rows.toDF("k", "t", "x"), "k", "t", "x",
        p0 = 0.5, p1 = 0.7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    out("hot")._2 shouldBe "h1"
    out("hot")._3 should be < 20L // crossed well before the end
    out("cold")._2 shouldBe "h0"
    out("mid")._2 shouldBe "continue"
    out("mid")._3 shouldBe -1L
  }

  test("sprt decision is the FIRST crossing, not the last state") {
    // 12 successes (crosses h1), then failures drag the llr back —
    // the recorded decision must stay h1 at its first-crossing n
    val rows = (1 to 12).map(i => ("k", i.toLong, true)) ++
      (13 to 60).map(i => ("k", i.toLong, false))
    val r = Rolling.sprtBernoulli(rows.toDF("k", "t", "x"), "k", "t", "x",
      p0 = 0.5, p1 = 0.7).head()
    r.getString(2) shouldBe "h1"
    r.getLong(3) should be <= 12L
  }

  test("dunnTest separates a shifted group and reports Bonferroni m") {
    val rows =
      (1 to 30).map(i => ("lo", i.toDouble)) ++
      (1 to 30).map(i => ("hi", i + 100.0)) ++
      (1 to 30).map(i => ("hi2", i + 100.5))
    val out = Profile.dunnTest(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(4),
        r.getLong(5))).toList
    out.head._4 shouldBe 3L // k=3 → 3 comparisons
    val hiLo = out.find(p => Set(p._1, p._2) == Set("hi", "lo")).get
    math.abs(hiLo._3) should be > 5.0   // clear separation
    val hiHi2 = out.find(p => Set(p._1, p._2) == Set("hi", "hi2")).get
    math.abs(hiHi2._3) should be < math.abs(hiLo._3)
  }

  test("blandAltman recovers a constant bias with tight limits") {
    // b = a − 2 exactly → mean_diff 2, sd 0-ish... add tiny jitter
    val rows = (1 to 50).map { i =>
      val a = 10.0 + (i % 5) * 0.1
      (a, a - 2.0 + (if (i % 2 == 0) 0.01 else -0.01))
    }
    val r = Profile.blandAltman(rows.toDF("a", "b"), "a", "b").head()
    r.getLong(0) shouldBe 50L
    r.getDouble(1) shouldBe (2.0 +- 1e-6)
    r.getDouble(2) shouldBe (0.01 +- 1e-3)
    r.getDouble(3) should be < 2.0
    r.getDouble(4) should be > 2.0
    r.getLong(5) shouldBe 0L // all pairs inside the limits
  }

  test("sobelMediation recovers a planted full mediation") {
    // m = 2x + noise, y = 3m + noise, x→y only through m:
    // a≈2, b≈3, indirect≈6, direct≈0, |z| large
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val x = rnd.nextInt(10).toDouble
      val m = 2.0 * x + rnd.nextGaussian() * 0.5
      val y = 3.0 * m + rnd.nextGaussian() * 0.5
      (x, m, y)
    }
    val r = Profile.sobelMediation(rows.toDF("x", "m", "y"), "x", "m", "y",
      unitScale = 1000L).head()
    r.getDouble(1) shouldBe (2.0 +- 0.05)  // a path
    r.getDouble(2) shouldBe (3.0 +- 0.05)  // b path
    math.abs(r.getDouble(3)) should be < 0.2 // direct ~ 0
    r.getDouble(4) shouldBe (6.0 +- 0.2)   // indirect
    math.abs(r.getDouble(5)) should be > 10.0
  }
}
