package graft

import org.apache.spark.sql.functions._

import graft.functions.{Eval, NaiveBayes, Profile, TermStats}
import graft.operators.Rolling

/** Round-10 statistical/IR additions: Page–Hinkley drift, Naive Bayes
  * classification, quantile normalization, McNemar, IPW ATE,
  * permutation test, OLS influence, partial correlation, V-measure,
  * query-likelihood Dirichlet ranking.
  */
class Round10bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageHinkley flags a mean shift and not a flat series") {
    // flat at 1.0 for 20 points, then jumps to 5.0 for 10 — PH must
    // stay quiet pre-shift and fire after; a second all-flat key
    // never fires.
    val rows =
      (1 to 20).map(i => ("shift", i.toLong, 1.0)) ++
      (21 to 30).map(i => ("shift", i.toLong, 5.0)) ++
      (1 to 30).map(i => ("flat", i.toLong, 2.0))
    val df = rows.toDF("k", "t", "v")
    val out = Rolling.pageHinkley(df, "k", "t", "v", delta = 0.01, lambda = 2.0)
      .select("k", "t", "is_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    out.filter(_._1 == "flat").forall(!_._3) shouldBe true
    out.filter(r => r._1 == "shift" && r._2 <= 20).forall(!_._3) shouldBe true
    out.filter(r => r._1 == "shift" && r._2 > 22).exists(_._3) shouldBe true
  }

  test("pageHinkley statistic is m - running min(0, m) and non-negative") {
    val df = (1 to 10).map(i => ("k", i.toLong, math.sin(i.toDouble)))
      .toDF("k", "t", "v")
    val ph = Rolling.pageHinkley(df, "k", "t", "v", delta = 0.0, lambda = 1.0)
      .select("ph").collect().map(_.getLong(0))
    all(ph) should be >= 0L
  }

  test("naive bayes separates a trivially separable vocabulary") {
    // class a docs say only "apple", class b only "banana" — test docs
    // classify perfectly; the confusion matrix is diagonal.
    val train = Seq(
      (1L, "a", "apple apple apple"), (2L, "a", "apple apple"),
      (3L, "b", "banana banana"), (4L, "b", "banana banana banana")
    ).toDF("doc_id", "lang", "text")
    val test0 = Seq(
      (10L, "a", "apple"), (11L, "b", "banana"), (12L, "a", "apple apple")
    ).toDF("doc_id", "lang", "text")
    val cm = NaiveBayes.trainScoreConfusion(train, test0, "lang", "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    cm shouldBe Set(("a", "a", 2L), ("b", "b", 1L))
  }

  test("naive bayes zero-token test doc takes the prior argmax, ties lexicographic") {
    // equal priors (2 docs each) → zero-token doc breaks the score tie
    // to the lexicographically smallest label "a".
    val train = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "y")
    ).toDF("doc_id", "lang", "text")
    val test0 = Seq((10L, "b", "")).toDF("doc_id", "lang", "text")
    val cm = NaiveBayes.trainScoreConfusion(train, test0, "lang", "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    cm shouldBe Array(("b", "a", 1L))
  }

  test("quantileNormalize maps each bin to the cross-group bin-mean reference") {
    // two groups, two bins of two rows each; reference(bin) = mean of
    // the two group means. g1 bin1 {1,2} bin2 {3,4}; g2 bin1 {10,20}
    // bin2 {30,40} → ref bin1 = (1.5+15)/2 = 8.25, bin2 = (3.5+35)/2.
    val df = Seq(
      ("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g1", 4.0),
      ("g2", 10.0), ("g2", 20.0), ("g2", 30.0), ("g2", 40.0)
    ).zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      .toDF("g", "v", "id")
    val out = Profile.quantileNormalize(df, "g", "v", "id", bins = 2)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    out(("g1", 1)) shouldBe ((2L, 1.5, 8.25))
    out(("g2", 1)) shouldBe ((2L, 15.0, 8.25))
    out(("g1", 2)) shouldBe ((2L, 3.5, 19.25))
    out(("g2", 2)) shouldBe ((2L, 35.0, 19.25))
  }

  test("mcnemar counts cells and applies the continuity correction") {
    // pairs: n00=1, n01=4, n10=1, n11=2 → chi2 = (|4-1|-1)²/5 = 0.8
    val df = Seq(
      (0, 0), (0, 1), (0, 1), (0, 1), (0, 1), (1, 0), (1, 1), (1, 1)
    ).toDF("a", "b")
    val r = Eval.mcnemar(df, "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((1L, 4L, 1L, 2L))
    r.getDouble(4) shouldBe (0.8 +- 1e-9)
  }

  test("mcnemar with no discordant pairs yields NULL chi2") {
    val df = Seq((1, 1), (0, 0)).toDF("a", "b")
    Eval.mcnemar(df, "a", "b").head().isNullAt(4) shouldBe true
  }

  test("ipwAte matches the hand-computed estimate and drops no-positivity strata") {
    // stratum s1: e = 2/4; treated y {10, 20} weight 1/e = 2;
    // control y {2, 4} weight 1/(1-e) = 2 →
    // ATE_s1 = (10·2 + 20·2 − 2·2 − 4·2)/4 = 48/4 = 12.
    // stratum s2: all treated → excluded from the ATE rows.
    val df = Seq(
      ("s1", true, 10.0), ("s1", true, 20.0),
      ("s1", false, 2.0), ("s1", false, 4.0),
      ("s2", true, 100.0), ("s2", true, 200.0)
    ).toDF("s", "t", "y")
    val out = Eval.ipwAte(df, "s", "t", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    out("s1") shouldBe ((4L, 2L, Some(12.0)))
    out("_ate") shouldBe ((4L, 2L, Some(12.0))) // pooled over kept rows only
    out should not contain key("s2") // no per-stratum row for the violation...
    out("_dropped") shouldBe ((2L, 0L, None)) // ...but its rows are reported
  }

  test("permutationTestDiff: exact observed diff, p-value identity, null case") {
    // group a mean 10, group b mean 4 → observed_diff = 6; p_value
    // must equal (1 + n_extreme)/(reps + 1) exactly.
    val df = Seq(
      ("a", 8.0, 1L), ("a", 12.0, 2L), ("b", 3.0, 3L), ("b", 5.0, 4L),
      ("c", 99.0, 5L) // non-member group is filtered out
    ).toDF("g", "v", "id")
    val r = Eval.permutationTestDiff(df, "g", "v", "a", "b", "id", reps = 40)
      .head()
    r.getDouble(0) shouldBe (6.0 +- 1e-9)
    r.getLong(1) shouldBe 40L
    val (nx, p) = (r.getLong(2), r.getDouble(3))
    p shouldBe (((1.0 + nx) / 41.0) +- 1e-9)
    // identical groups → |perm diff| ≥ 0 for every NON-degenerate
    // replicate (one-side-empty relabelings yield NULL and drop, the
    // DuckDB division-by-zero contract) — p stays near 1
    val same = Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("b", 5.0, 3L), ("b", 5.0, 4L))
      .toDF("g", "v", "id")
    val r2 = Eval.permutationTestDiff(same, "g", "v", "a", "b", "id", reps = 20)
      .head()
    r2.getDouble(3) shouldBe (((1.0 + r2.getLong(2)) / 21.0) +- 1e-9)
    r2.getDouble(3) should be > 0.8
  }

  test("olsInfluence ranks the off-line outlier first with near-zero residual elsewhere") {
    // y = 2x exactly except x=10 where y jumps off the line — that
    // point must top the Cook's D triage list.
    val pts = (1 to 9).map(i => (i.toLong, i.toDouble, 2.0 * i)) :+
      (10L, 10.0, 40.0)
    val df = pts.toDF("id", "x", "y")
    val out = Profile.olsInfluence(df, "x", "y", "id", topK = 3).collect()
    out.head.getLong(0) shouldBe 10L
    out.head.getInt(1) shouldBe 1
    out.head.getDouble(4) should be > out(1).getDouble(4) // strict top
  }

  test("partialCorr removes a pure confounder") {
    // x = z + small unique wiggle, y = -z + distinct wiggle: raw
    // r(x,y) is strongly negative purely through z; conditioning on z
    // must collapse it toward 0. unitScale=100 → pick exact centiles.
    val rows = Seq(
      (1.01, -0.97, 1.0), (2.03, -2.02, 2.0), (2.96, -3.01, 3.0),
      (4.02, -3.97, 4.0), (4.97, -5.03, 5.0), (6.01, -5.96, 6.0),
      (7.04, -7.02, 7.0), (7.98, -8.03, 8.0)
    )
    val df = rows.toDF("x", "y", "z")
    val res = Profile.partialCorr(df, "x", "y", "z").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).toList
    val xy = res.find(t => t._1 == "x" && t._2 == "y").get
    xy._3 shouldBe "z"
    xy._5 should be < -0.99          // raw correlation ≈ −1 via z
    math.abs(xy._4) should be < 0.8  // conditioned: mostly wiggle noise
    math.abs(xy._4) should be < math.abs(xy._5)
  }

  test("vMeasure: perfect match scores 1s; all-in-one cluster splits hom/com") {
    val perfect = Seq(("a", "k1"), ("a", "k1"), ("b", "k2"), ("b", "k2"))
      .toDF("c", "k")
    val p = Eval.vMeasure(perfect, "c", "k").head()
    p.getDouble(4) shouldBe (1.0 +- 1e-9) // homogeneity
    p.getDouble(5) shouldBe (1.0 +- 1e-9) // completeness
    p.getDouble(6) shouldBe (1.0 +- 1e-9) // v
    val lumped = Seq(("a", "k"), ("a", "k"), ("b", "k"), ("b", "k"))
      .toDF("c", "k")
    val l = Eval.vMeasure(lumped, "c", "k").head()
    l.getDouble(4) shouldBe (0.0 +- 1e-9) // one cluster, mixed classes
    l.getDouble(5) shouldBe (1.0 +- 1e-9) // each class in one cluster
    l.getDouble(6) shouldBe (0.0 +- 1e-9)
  }

  test("qlDirichletRank: tf-dominant doc ranks first; absent terms still smoothed") {
    val docs = Seq(
      (1L, "hash hash hash join"),
      (2L, "hash scan"),
      (3L, "filter project sort"), // no query term → not a candidate
      (4L, "join")
    ).toDF("doc_id", "text")
    val out = TermStats.qlDirichletRank(docs, Seq("hash", "join", "scan"),
        mu = 10.0, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    out.map(_._1).toSet shouldBe Set(1L, 2L, 4L)         // candidates only
    // doc 2 hits 2 of 3 terms, docs 1 and 4 hit 2 and 1
    out.find(_._1 == 2L).get._3 shouldBe 2L
    out.find(_._1 == 4L).get._3 shouldBe 1L
    // every score is a full 3-term sum (absent terms contribute):
    // all finite, strictly ordered by rank
    val byRank = out.sortBy(_._4)
    byRank.map(_._2).forall(s => !s.isNaN && !s.isInfinite) shouldBe true
    byRank.sliding(2).forall(p => p(0)._2 >= p(1)._2) shouldBe true
  }
}
