package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Graph
import graft.plans.HyperplaneBucket

/** Round-5 additions over vectors/graphs/digests: signed random
  * projection (native kernel vs driver reference and codegen), the
  * mergeable content digest's algebra, and deterministic label
  * propagation vs a driver-simulated reference.
  */
class VectorGraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- randomProject ----

  test("randomProject matches a driver-computed projection with the shared sign matrix") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 20L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val out = df.select(col("id"), VectorFunctions.randomProject(col("v"), 4, 8).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val signs = HyperplaneBucket.signMatrix(4, 8, 7)
    for ((id, v) <- vecs) {
      val expect = (0 until 4).map { p =>
        var dot = 0.0
        for (d <- 0 until 8) dot += v(d).toDouble * signs(p * 8 + d)
        dot
      }
      out(id) shouldBe expect
    }
  }

  test("randomProject compiles into WholeStageCodegen (no interpreted fallback)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a literal Seq would be ConvertToLocalRelation-folded (evaluated
      // interpreted at plan time) — use a range scan so codegen runs
      val df = spark.range(4)
        .select(expr("array_repeat(cast(id as float), 8)").as("v"))
        .select(VectorFunctions.randomProject(col("v"), 4, 8).as("p"))
      val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      codegen should include("vec_random_project")
      (codegen should not).include("Found 0 WholeStageCodegen")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("cosine over projections approximates original cosine (JL property)") {
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 60L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val proj = df.select(col("id"), col("v"),
      VectorFunctions.randomProject(col("v"), 16, 64).as("p"))
    val a = proj.select(col("id").as("ia"), col("v").as("va"), col("p").as("pa"))
    val b = proj.select((col("id") - 1).as("ia"), col("v").as("vb"), col("p").as("pb"))
    val errs = a.join(b, Seq("ia"))
      .select(abs(VectorFunctions.cosine(col("va"), col("vb"))
        - VectorFunctions.cosineHof(col("pa"), col("pb"))).as("err"))
      .collect().map(_.getDouble(0))
    // 16 random directions: mean cosine error well under 0.25 on gaussians
    (errs.sum / errs.length) should be < 0.25
  }

  // ---- contentDigest ----

  test("contentDigest is partition-order-insensitive and shard-mergeable") {
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "s")
    def dig(d: org.apache.spark.sql.DataFrame) = {
      val r = new graft.core.Tafra(d).contentDigest(Seq("id", "s")).df.collect().head
      (r.getLong(0), BigInt(r.getString(1)), BigInt(r.getString(2)))
    }
    val whole = dig(df)
    val shard1 = dig(df.filter(col("id") <= 200))
    val shard2 = dig(df.filter(col("id") > 200))
    whole._1 shouldBe shard1._1 + shard2._1
    whole._2 shouldBe shard1._2 + shard2._2
    whole._3 shouldBe shard1._3 + shard2._3
    // repartitioning never changes the digest
    dig(df.repartition(13)) shouldBe whole
  }

  test("contentDigest distinguishes null position and null vs empty string") {
    def dig(rows: Seq[(Option[String], Option[String])]) = {
      val df = rows.toDF("a", "b")
      new graft.core.Tafra(df).contentDigest(Seq("a", "b")).df
        .collect().head.getString(1)
    }
    val nullRight = dig(Seq((Some("x"), None)))
    val nullLeft = dig(Seq((None, Some("x"))))
    val emptyRight = dig(Seq((Some("x"), Some(""))))
    nullRight should not be nullLeft
    nullRight should not be emptyRight
  }

  // ---- labelPropagation ----

  test("labelPropagation matches a driver-simulated sync LPA with min-tie votes") {
    // two 4-cliques joined by one bridge edge, plus an isolated pair
    val cliqueA = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val cliqueB = for (a <- 11 to 14; b <- (a + 1) to 14) yield (a.toLong, b.toLong)
    val pairs = (cliqueA ++ cliqueB ++ Seq((4L, 11L), (21L, 22L))).toDF("a", "b")
    for (iters <- Seq(1, 2, 3)) {
      val out = Graph.labelPropagation(pairs, "a", "b", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // driver simulation of the same algorithm
      val edges = (cliqueA ++ cliqueB ++ Seq((4L, 11L), (21L, 22L)))
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      var labels = edges.map(_._1).distinct.map(n => n -> n).toMap
      for (_ <- 0 until iters) {
        labels = edges.groupBy(_._1).map { case (n, es) =>
          val votes = es.map(e => labels(e._2))
            .groupBy(identity).map { case (l, v) => (l, v.size) }
          n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }
      out shouldBe labels
    }
  }

  test("labelPropagation separates bridge-joined cliques that components would merge") {
    val cliqueA = for (a <- 1 to 5; b <- (a + 1) to 5) yield (a.toLong, b.toLong)
    val cliqueB = for (a <- 11 to 15; b <- (a + 1) to 15) yield (a.toLong, b.toLong)
    val pairs = (cliqueA ++ cliqueB ++ Seq((5L, 11L))).toDF("a", "b")
    val out = Graph.labelPropagation(pairs, "a", "b", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to its own min label; the barbell stays split
    (1 to 5).map(n => out(n.toLong)).toSet shouldBe Set(1L)
    (12 to 15).map(n => out(n.toLong)).toSet shouldBe Set(11L)
  }

  test("every Graph operator releases its input caches before returning (r8)") {
    // after each call + materialization, the only persisted RDDs added
    // are localCheckpoint artifacts (result/round frames the plan still
    // references until GC) — never an unreleased input persist
    val cliqueA = for (a <- 1 to 6; b <- (a + 1) to 6) yield (a.toLong, b.toLong)
    val cliqueB = for (a <- 11 to 15; b <- (a + 1) to 15) yield (a.toLong, b.toLong)
    val pairs = (cliqueA ++ cliqueB ++ Seq((5L, 11L), (6L, 12L))).toDF("a", "b")
    val seeds = Seq(1L, 11L).toDF("node")
    val labels = Seq((1L, 1L), (2L, 1L), (11L, 11L)).toDF("node", "community")
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "pageRank" -> (() => Graph.pageRank(pairs, "a", "b", iters = 2)),
      "personalizedPageRank" -> (() => Graph.personalizedPageRank(pairs, "a", "b", seeds, iters = 2)),
      "hits" -> (() => Graph.hits(pairs, "a", "b", iters = 2)),
      "jaccardLinkPrediction" -> (() => Graph.jaccardLinkPrediction(pairs, "a", "b")),
      "raLinkPrediction" -> (() => Graph.raLinkPrediction(pairs, "a", "b")),
      "triangleCounts" -> (() => Graph.triangleCounts(pairs, "a", "b")),
      "clusteringCoefficient" -> (() => Graph.clusteringCoefficient(pairs, "a", "b")),
      "labelPropagation" -> (() => Graph.labelPropagation(pairs, "a", "b", iters = 2)),
      "modularity" -> (() => Graph.modularity(pairs, "a", "b", labels)),
      "assortativity" -> (() => Graph.assortativity(pairs, "a", "b")),
      "bfsDistances" -> (() => Graph.bfsDistances(pairs, "a", "b", seeds)),
      "kCore" -> (() => Graph.kCore(pairs, "a", "b", 3)),
      "degreeTailAlpha" -> (() => Graph.degreeTailAlpha(pairs, "a", "b", k = 3)))
    for ((name, op) <- ops) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val df = op()
      df.count()
      // RDD.isLocallyCheckpointed is private[spark] — reflect in
      val isCkpt = classOf[org.apache.spark.rdd.RDD[_]]
        .getDeclaredMethod("isLocallyCheckpointed")
      isCkpt.setAccessible(true)
      val leaked = spark.sparkContext.getPersistentRDDs
        .filter { case (id, _) => !before(id) }
        .values.filterNot(r => isCkpt.invoke(r).asInstanceOf[Boolean])
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} non-checkpoint persisted RDD(s): " +
        leaked.map(_.toString).mkString("; "))
    }
  }
}
