package graft

import org.apache.spark.sql.functions._

import graft.functions.{Eval, TermStats}

/** Round-10 batch 3 stats: calibration error, odds/risk ratios,
  * Heaps' law.
  */
class Round10dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("calibrationError: perfectly calibrated bins score ECE 0; miscalibration surfaces") {
    // bin [0.2,0.3): conf 0.25, accuracy 1/4 → gap 0; bin [0.8,0.9):
    // conf 0.85, accuracy 0 → gap 0.85
    val rows =
      Seq((0.25, true), (0.25, false), (0.25, false), (0.25, false)) ++
      Seq((0.85, false), (0.85, false))
    val out = Eval.calibrationError(rows.toDF("s", "y"), "s", "y", bins = 10)
      .collect().map(r => (r.getString(0), r)).toMap
    val byBin = Eval.calibrationError(rows.toDF("s", "y"), "s", "y", bins = 10)
      .filter(col("section") === "bin").collect()
      .map(r => r.getInt(1) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    byBin(2) shouldBe ((0.25, 0.25, 0.0))
    byBin(8)._3 shouldBe (0.85 +- 1e-9)
    // ECE = (4*0 + 2*0.85)/6
    out("total").getDouble(5) shouldBe (1.7 / 6.0 +- 1e-9)
  }

  test("calibrationError refuses out-of-range scores in-plan") {
    val bad = Seq((1.5, true)).toDF("s", "y")
    val ex = intercept[Exception] {
      Eval.calibrationError(bad, "s", "y").collect()
    }
    ex.getMessage should include("out of [0,1]")
  }

  test("oddsRiskBySegment matches the hand 2x2 and NULLs empty cells") {
    // seg A: a=2 b=1 c=1 d=2 → OR = 4, RR = (2/3)/(1/3) = 2
    val rows = Seq(
      ("A", true, true), ("A", true, true), ("A", true, false),
      ("A", false, true), ("A", false, false), ("A", false, false),
      ("B", true, true), ("B", false, false)) // b = c = 0 → NULL
    val out = Eval.oddsRiskBySegment(rows.toDF("g", "e", "o"), "g", "e", "o")
      .collect().map(r => r.getString(0) -> r).toMap
    out("A").getDouble(5) shouldBe (4.0 +- 1e-9)
    out("A").getDouble(6) shouldBe (2.0 +- 1e-9)
    // Woolf: ln 4 ± 1.96·sqrt(1/2+1/1+1/1+1/2)
    val se = math.sqrt(0.5 + 1.0 + 1.0 + 0.5)
    out("A").getDouble(7) shouldBe (math.log(4.0) - 1.96 * se +- 1e-6)
    out("A").getDouble(8) shouldBe (math.log(4.0) + 1.96 * se +- 1e-6)
    out("B").isNullAt(5) shouldBe true
  }

  test("heapsLaw recovers sub-linear growth on a vocab-expanding corpus and beta~0 on a fixed vocab") {
    // each doc introduces words ~ sqrt pattern: doc i has words w0..w_i
    // (new vocab every doc, growth sub-linear in tokens)
    val grow = (1 to 40).map { i =>
      (i.toLong, (0 to i).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val g = TermStats.heapsLaw(grow, points = 8).collect()
    val beta = g.head.getDouble(3)
    beta should be > 0.1
    beta should be < 1.0
    // growth points are monotone in both axes
    val pts = g.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    pts.sliding(2).forall(p => p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3) shouldBe true
    // fixed tiny vocab → beta ≈ 0
    val flat = (1 to 40).map(i => (i.toLong, "a b c a b c")).toDF("doc_id", "text")
    math.abs(TermStats.heapsLaw(flat, points = 8).head().getDouble(3)) should be < 0.02
  }
}
