package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class KmeansSplitSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansStep matches a driver-computed Lloyd update") {
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 50L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(df, ncells = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
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
    val assign = vecs.map { case (id, v) =>
      val (_, cell) = seeds.zipWithIndex.map { case (s, c) => (cos(v, s), c) }
        .maxBy { case (c, cell) => (c, -cell) }
      (cell, v)
    }
    val byCell = assign.groupBy(_._1)
    for ((cell, members) <- byCell; d <- 0 until 6) {
      val n = members.size
      val s = members.map(m => math.floor(m._2(d).toDouble * 1e12 + 0.5).toLong).sum
      val (gotN, gotC) = out((cell, d + 1))
      gotN shouldBe n.toLong
      gotC shouldBe (s.toDouble / 1e12 / n) +- 1e-12
    }
    out.size shouldBe byCell.size * 6
  }

  test("kmeansStep drops empty cells and pulls centroids toward their members") {
    // two tight clusters far apart; 8 seed slots → most cells empty
    def near(base: Array[Float], r: scala.util.Random) =
      base.map(v => v + r.nextFloat() * 0.01f)
    val r = new scala.util.Random(9)
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val vecs = (1L to 20L).map(i => (i, near(if (i <= 10) a else b, r)))
    val out = Similarity.kmeansStep(vecs.toDF("vec_id", "embedding"), ncells = 8)
    // every emitted centroid row has members and lies on ONE of the two
    // planted cluster directions (cosine > 0.99 to a or b)
    out.filter(col("n_vecs") <= 0).count() shouldBe 0
    val cents = out.collect().groupBy(_.getInt(0)).map { case (cell, rows) =>
      cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(3))
    }
    def cosd(x: Seq[Double], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i).toDouble * y(i)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    cents.values.foreach { c =>
      math.max(cosd(c.toSeq, a), cosd(c.toSeq, b)) should be > 0.99
    }
  }

  test("kmeansTrain matches a driver-exact multi-round reference on planted clusters") {
    val r = new scala.util.Random(29)
    def near(base: Array[Float]) = base.map(v => v + r.nextFloat() * 0.2f - 0.1f)
    val a = Array(1.0f, 0.1f, 0.0f, 0.0f)
    val b = Array(0.0f, 0.1f, 1.0f, 0.0f)
    val c = Array(0.0f, 1.0f, 0.0f, 0.3f)
    val vecs = (1L to 30L).map(i =>
      (i, near(if (i % 3 == 0) a else if (i % 3 == 1) b else c)))
    val got = Similarity.kmeansTrain(vecs.toDF("vec_id", "embedding"),
        ncells = 3, iters = 3, stopMoveU = -1L)
      .collect()
      .map(r0 => (r0.getInt(0), r0.getInt(1), r0.getInt(2)) ->
        (r0.getLong(3), r0.getLong(4), BigInt(r0.getDecimal(5).toBigInteger)))
      .toMap

    // driver reference: IDENTICAL arithmetic, plain Scala
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def q12(v: Float): Long = math.floor(v.toDouble * 1e12 + 0.5).toLong
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(3).map(_._2.toSeq)
    var cents: Seq[Seq[Long]] = seeds.map(_.map(f => q12(f) / 1000000L))
    def cos(v: Array[Float], cent: Seq[Long]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- v.indices) {
        val x = v(i).toDouble; val y = cent(i).toFloat.toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ref = scala.collection.mutable.Map.empty[(Int, Int, Int), (Long, Long, BigInt)]
    for (round <- 1 to 3) {
      val assign = vecs.map { case (id, v) =>
        val (bc, cell) = cents.indices.map(i => (cos(v, cents(i)), i))
          .maxBy { case (cc, i) => (cc, -i) }
        (cell, v, bc)
      }
      val byCell = assign.groupBy(_._1).toSeq.sortBy(_._1)
      cents = byCell.map { case (cell, ms) =>
        val n = ms.size.toLong
        val inert = ms.map(m => BigInt(math.floor((1.0 - m._3) * 1e12 + 0.5).toLong)).sum
        val mu = (0 until 4).map { d =>
          val s = ms.map(m => BigInt(q12(m._2(d)))).sum
          (s / (BigInt(n) * 1000000)).toLong
        }
        (0 until 4).foreach(d => ref((round, cell, d + 1)) = (n, mu(d), inert))
        mu
      }
    }
    got shouldBe ref.toMap
  }

  test("kmeansTrain stops on the movement tolerance and nests deterministically") {
    val r = new scala.util.Random(31)
    val vecs = (1L to 40L).map(i => (i, Array.fill(4)(r.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    // an infinite tolerance stops after round 1 — the round still emits
    Similarity.kmeansTrain(df, ncells = 4, iters = 5, stopMoveU = Long.MaxValue)
      .select(max(col("round"))).head().getInt(0) shouldBe 1
    // deterministic: two runs collect identically
    val one = Similarity.kmeansTrain(df, ncells = 4, iters = 2).collect().toSeq
    val two = Similarity.kmeansTrain(df, ncells = 4, iters = 2).collect().toSeq
    one shouldBe two
    // the convergence curve: total inertia never increases round-over-round
    val inert = Similarity.kmeansTrain(df, ncells = 4, iters = 3, stopMoveU = -1L)
      .filter(col("dim") === 1)
      .groupBy("round").agg(sum(col("inertia_q")).as("i"))
      .orderBy("round").collect().map(_.getDecimal(1).doubleValue())
    inert.sliding(2).foreach { case Array(x, y) => y should be <= x }
  }

  test("grouped split never puts one user's events in two splits") {
    val df = SparkEntry.queries("q191_grouped_split")(spark, "/root/testdata/sf0.001")
    df.groupBy("user_id").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count() shouldBe 0
    // all three splits are populated at sf0.001
    df.select("split").distinct().count() shouldBe 3
  }
}
