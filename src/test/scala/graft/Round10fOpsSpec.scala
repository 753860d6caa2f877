package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Rolling, Similarity}

/** Round-10 batch 5: MMR selection, k-truss, periodogram. */
class Round10fOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("mmrSelect trades relevance for diversity") {
    // query 0 at e1; ids 1,2 are near-duplicates close to the query;
    // id 3 is orthogonal-ish but still relevant; plain top-2 would
    // take {1,2}, MMR with lambda 0.7 must take {1, 3}
    val rows = Seq(
      (0L, vec(1.0, 0.0, 0.0)),
      (1L, vec(0.99, 0.1, 0.0)),
      (2L, vec(0.98, 0.12, 0.0)),
      (3L, vec(0.7, 0.0, 0.7)),
      (4L, vec(-1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(rows, 0L, poolK = 4, selectK = 2,
        lambdaNum = 1, lambdaDen = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    out(0) shouldBe ((1, 1L)) // most relevant first
    out(1)._2 shouldBe 3L     // diversity beats the near-dup of pick 1
    // lambda = 1 → pure relevance: {1, 2}
    val pure = Similarity.mmrSelect(rows, 0L, poolK = 4, selectK = 2,
      lambdaNum = 1, lambdaDen = 1).collect().map(_.getLong(1))
    pure shouldBe Array(1L, 2L)
  }

  test("kTruss keeps the clique, drops the chain, and converges") {
    // a 4-clique (every edge on 2 triangles) + a pendant chain
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val pairs = (clique ++ chain).toDF("a", "b")
    val out = Graph.kTruss(pairs, "a", "b", k = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    out.keySet shouldBe clique.toSet
    all(out.values) shouldBe 2L
    // k = 5 needs 3 triangles per edge — the 4-clique dies entirely
    Graph.kTruss(pairs, "a", "b", k = 5).count() shouldBe 0L
  }

  test("kTruss on a triangle-free graph empties at k=3") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    Graph.kTruss(path, "a", "b", k = 3).count() shouldBe 0L
    // k = 2 needs support >= 0: everything survives
    Graph.kTruss(path, "a", "b", k = 2).count() shouldBe 3L
  }

  test("periodogram finds a planted period") {
    // pure 12-step cosine over 96 points: power concentrates at P=12
    val rows = (0 until 96).map(t =>
      (t.toLong, 5.0 + 2.0 * math.cos(2.0 * math.Pi * t / 12.0)))
    val out = Rolling.periodogram(rows.toDF("t", "v"), "t", "v",
        Seq(6, 8, 12, 16, 24))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getInt(2)))
    out.find(_._3 == 1).get._1 shouldBe 12
    val byP = out.map(r => r._1 -> r._2).toMap
    byP(12) should be > 10.0 * byP(8)  // sharp peak
    byP(12) should be > 10.0 * byP(24)
  }

  test("periodogram on white-ish flat series has no dominant spike") {
    val rows = (0 until 64).map(t => (t.toLong, 3.0)).toDF("t", "v")
    val out = Rolling.periodogram(rows, "t", "v", Seq(4, 8, 16))
      .collect().map(_.getDouble(1))
    all(out) should be < 1e-6 // centered constant series: zero power
  }
}
