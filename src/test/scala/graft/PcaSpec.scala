package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("principalComponent recovers a planted dominant axis") {
    // points spread along (1,1,0,0)/√2 with small noise in other dims:
    // projections must order by the position along the axis
    val rnd = new scala.util.Random(5)
    val pts = (1L to 60L).map { i =>
      val s = (i.toDouble - 30.5) / 10.0
      val v = Array.tabulate(4)(d =>
        (if (d < 2) s + rnd.nextGaussian() * 0.01
         else rnd.nextGaussian() * 0.01).toFloat)
      (i, v)
    }
    val out = Similarity.principalComponent(pts.toDF("vec_id", "embedding"),
        dims = 4, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // correlation of projection with the planted coordinate is ~±1
    val xs = pts.map { case (i, v) => (v(0) + v(1)).toDouble }
    val ys = pts.map { case (i, _) => out(i) }
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
    val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
    math.abs(cov / (sx * sy)) should be > 0.999
  }

  test("principalComponent projections are centered: they sum to ~0") {
    val rnd = new scala.util.Random(23)
    val pts = (1L to 40L).map(i => (i, Array.fill(6)(rnd.nextFloat())))
    val out = Similarity.principalComponent(pts.toDF("vec_id", "embedding"),
        dims = 6, iters = 3)
      .agg(sum("proj")).head().getDouble(0)
    // exact centering is only up to quantization of the means (1e-6 per
    // element) and the 1e-6 output rounding
    math.abs(out) should be < 0.01
  }

  test("pca plan: ONE moment aggregation pass, projection map-only behind the rebalance") {
    val df = SparkEntry.queries("q185_pca_project")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // the moment pass ran eagerly at build time (model artifact, like
    // IVF centroids); the returned SCORING plan is a pure projection
    // with the axis inlined as literals — one pinned exchange, no agg,
    // no window, no join
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    p should include("REPARTITION_BY_NUM")
    (p should not).include("Window")
    (p should not).include("Join")
    (p should not).include("HashAggregate")
  }
}
