package graft

import org.apache.spark.sql.functions._

import graft.functions.{Eval, Profile, TermStats}
import graft.operators.Similarity

/** Round-10 batch 2: Kendall τ-b, Cochran's Q, weighted Cohen's κ,
  * rank-biased overlap, sup-Chow structural break, Good–Turing.
  */
class Round10cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kendallTauB: perfect concordance, perfect discordance, tie correction") {
    val up = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 3.0, 30.0), (4L, 4.0, 40.0))
      .toDF("id", "x", "y")
    Eval.getClass // anchor
    val t1 = Profile.kendallTauB(up, "id", "x", "y").head()
    t1.getAs[Long]("concordant") shouldBe 6L
    t1.getAs[Double]("tau_b") shouldBe (1.0 +- 1e-9)
    val down = Seq((1L, 1.0, 40.0), (2L, 2.0, 30.0), (3L, 3.0, 20.0), (4L, 4.0, 10.0))
      .toDF("id", "x", "y")
    Profile.kendallTauB(down, "id", "x", "y").head()
      .getAs[Double]("tau_b") shouldBe (-1.0 +- 1e-9)
    // x ties: pairs within {1,1} are neither concordant nor discordant
    val tied = Seq((1L, 1.0, 1.0), (2L, 1.0, 2.0), (3L, 2.0, 3.0), (4L, 3.0, 4.0))
      .toDF("id", "x", "y")
    val t3 = Profile.kendallTauB(tied, "id", "x", "y").head()
    t3.getAs[Long]("ties_x") shouldBe 1L
    // C = 5, D = 0, n0 = 6, n1 = 1, n2 = 0 → tau = 5/sqrt(5*6)
    t3.getAs[Double]("tau_b") shouldBe (5.0 / math.sqrt(30.0) +- 1e-9)
  }

  test("kendallTauB refuses a series above maxRows in-plan") {
    val big = (1 to 50).map(i => (i.toLong, i.toDouble, i.toDouble))
      .toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Profile.kendallTauB(big, "id", "x", "y", maxRows = 10L).collect()
    }
    ex.getMessage should include("quadratic")
  }

  test("cochranQ matches the hand-computed statistic and NULLs when constant") {
    // blocks (rows) x 3 treatments:
    // T = (3, 1, 3), B = (3, 1, 1, 2), ΣB = 7, ΣB² = 15, ΣT² = 19
    // Q = 2·(3·19 − 49)/(3·7 − 15) = 16/6 = 8/3
    val df = Seq((1, 1, 1), (1, 0, 0), (0, 0, 1), (1, 0, 1))
      .toDF("a", "b", "c")
    val r = Eval.cochranQ(df, Seq("a", "b", "c")).head()
    r.getAs[Long]("n_blocks") shouldBe 4L
    r.getAs[Long]("df") shouldBe 2L
    r.getAs[Double]("q_stat") shouldBe (8.0 / 3.0 +- 1e-8)
    val const = Seq((1, 1, 1), (0, 0, 0)).toDF("a", "b", "c")
    Eval.cochranQ(const, Seq("a", "b", "c")).head()
      .isNullAt(3) shouldBe true
  }

  test("cohenKappaWeighted: perfect agreement 1, quadratic near-miss discount") {
    val perfect = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    Eval.cohenKappaWeighted(perfect, "a", "b").head()
      .getAs[Double]("kappa_w") shouldBe (1.0 +- 1e-9)
    // same marginals, one rating off by 1 vs off by 3: quadratic
    // weighting must punish the distant disagreement harder
    val near = Seq((0L, 1L), (1L, 0L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    val far = Seq((0L, 3L), (1L, 1L), (2L, 2L), (3L, 0L)).toDF("a", "b")
    val kNear = Eval.cohenKappaWeighted(near, "a", "b").head().getAs[Double]("kappa_w")
    val kFar = Eval.cohenKappaWeighted(far, "a", "b").head().getAs[Double]("kappa_w")
    kNear should be > kFar
  }

  test("rboOverlap: identical lists 1, disjoint lists 0, top-weighted asymmetry") {
    def rk(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }.toDF("doc_id", "rank")
    val a = rk(Seq(1L, 2L, 3L, 4L, 5L))
    Similarity.rboOverlap(a, rk(Seq(1L, 2L, 3L, 4L, 5L)), "doc_id", "rank",
        p = 0.9, depth = 5).head().getAs[Double]("rbo_ext") shouldBe (1.0 +- 1e-9)
    Similarity.rboOverlap(a, rk(Seq(6L, 7L, 8L, 9L, 10L)), "doc_id", "rank",
        p = 0.9, depth = 5).head().getAs[Double]("rbo_ext") shouldBe (0.0 +- 1e-9)
    // swapping ranks 1-2 must hurt more than swapping 4-5
    val swapTop = Similarity.rboOverlap(a, rk(Seq(2L, 1L, 3L, 4L, 5L)),
      "doc_id", "rank", p = 0.9, depth = 5).head().getAs[Double]("rbo_ext")
    val swapTail = Similarity.rboOverlap(a, rk(Seq(1L, 2L, 3L, 5L, 4L)),
      "doc_id", "rank", p = 0.9, depth = 5).head().getAs[Double]("rbo_ext")
    swapTop should be < swapTail
    swapTail should be < 1.0
  }

  test("supChow localizes a planted slope break") {
    // slope 0 for days 1-15, slope 2 for days 16-30 — the best split
    // must land at the hinge (day 15 or 16) with a large F
    val rows = (1 to 15).map(d => (d.toLong, 10.0)) ++
      (16 to 30).map(d => (d.toLong, 10.0 + 2.0 * (d - 15)))
    val df = rows.toDF("day", "v")
    val r = Profile.supChow(df, "day", "v", margin = 3).head()
    r.getAs[Long]("n") shouldBe 30L
    r.getAs[Long]("break_at") should (be(15L) or be(16L))
    r.getAs[Double]("f_stat") should be > 50.0
    r.getAs[Double]("slope_pre") shouldBe (0.0 +- 0.05)
    r.getAs[Double]("slope_post") shouldBe (2.0 +- 0.05)
  }

  test("goodTuring: Zipf-ish corpus yields Turing-shaped discounts and the unseen row") {
    // doc corpus with hapaxes (r=1), doubletons (r=2) and a head word
    val docs = Seq(
      "alpha alpha alpha alpha beta beta gamma delta",
      "alpha alpha beta epsilon zeta",
      "alpha eta theta"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TermStats.goodTuring(docs, topR = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // unseen row: r=0 carries N1 and ln(N1/N)
    val n1 = out(0L).getLong(1)
    n1 should be >= 1L
    out(0L).isNullAt(2) shouldBe true
    val nTok = 8 + 5 + 3
    out(0L).getDouble(3) shouldBe
      (math.log(n1.toDouble / nTok) +- 1e-6)
    // smoothed log r* is monotone in r (the LGT fit is a power law)
    val seen = out.toSeq.filter(_._1 > 0).sortBy(_._1).map(_._2.getDouble(2))
    seen.sliding(2).forall(p => p.length < 2 || p(0) < p(1)) shouldBe true
  }
}
