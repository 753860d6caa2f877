package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, SkewJoin}
import graft.functions.{TextFunctions => T}

/** Randomized equivalence checks (seeded, deterministic): each operator
  * against a brute-force reference implementation on random inputs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(421)

  test("saltedEquiJoin is row-for-row equivalent to the plain join on random data") {
    for (_ <- 1 to 5) {
      val ls = Seq.fill(rnd.nextInt(12) + 1)((rnd.nextInt(6).toLong, rnd.nextInt(100)))
      val rs = Seq.fill(rnd.nextInt(12) + 1)((rnd.nextInt(6).toLong, rnd.nextInt(100).toString))
      val nsalts = rnd.nextInt(5) + 1
      // random threshold: exercises all-cold, all-hot, and mixed splits
      val hotThreshold = rnd.nextInt(4) + 1L
      val l = ls.toDF("k", "lv")
      val r = rs.toDF("rk", "rv")
      canon(SkewJoin.saltedEquiJoin(l, r, "k", "rk", nsalts,
        hotThreshold = hotThreshold)) shouldBe
        canon(l.join(r, l("k") === r("rk")))
      canon(SkewJoin.saltedEquiJoin(l, r, "k", "rk", nsalts, how = "left",
        hotThreshold = hotThreshold)) shouldBe
        canon(l.join(r, l("k") === r("rk"), "left"))
    }
  }

  test("asofJoin equals the brute-force latest-at-or-before on random data") {
    for (_ <- 1 to 5) {
      // unique (key, time) per side: duplicate right times make "the"
      // latest row ill-defined for any implementation
      val ls = Seq.fill(rnd.nextInt(15) + 1)((rnd.nextInt(4).toLong, rnd.nextInt(50).toLong)).distinct
      val rs = Seq.fill(rnd.nextInt(15) + 1)((rnd.nextInt(4).toLong, rnd.nextInt(50).toLong))
        .distinctBy(identity)
      val l = ls.toDF("k", "t")
      val r = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "rt", "pay")
      val got = AsofJoin.asofJoin(l, r, "k", "t", "rt", Seq("rt", "pay")).collect()
        .map(x => ((x.getLong(0), x.getLong(1)),
          if (x.isNullAt(2)) None else Some((x.getLong(2), x.getLong(3))))).toMap
      val expected = ls.map { case (k, t) =>
        val cand = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt <= t }
        (k, t) -> cand.sortBy { case ((_, rt), _) => rt }.lastOption
          .map { case ((_, rt), i) => (rt, i.toLong) }
      }.toMap
      got shouldBe expected
    }
  }

  test("components equals brute-force union-find on random graphs") {
    import graft.operators.Dedup
    for (_ <- 1 to 4) {
      val n = rnd.nextInt(20) + 2
      val edges = Seq.fill(rnd.nextInt(25) + 1)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min node of each component
        val expected = nodes.map(v => v -> find(v)).toMap
        val got = Dedup.components(edges.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        got shouldBe expected
      }
    }
  }

  test("wordNGrams emits exactly the consecutive joined token windows") {
    val vocab = Seq("a", "bb", "ccc", "d1", "e")
    for (_ <- 1 to 8) {
      val toks = Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
      val n = rnd.nextInt(4) + 1
      val got = Seq(toks).toDF("w")
        .select(T.wordNGrams(col("w"), n)).as[Seq[String]].head()
      val expected = if (toks.length < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq
      got shouldBe expected
    }
  }
}
