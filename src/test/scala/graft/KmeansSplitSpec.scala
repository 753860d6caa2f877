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

  test("grouped split never puts one user's events in two splits") {
    val df = SparkEntry.queries("q191_grouped_split")(spark, "/root/testdata/sf0.001")
    df.groupBy("user_id").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count() shouldBe 0
    // all three splits are populated at sf0.001
    df.select("split").distinct().count() shouldBe 3
  }
}
