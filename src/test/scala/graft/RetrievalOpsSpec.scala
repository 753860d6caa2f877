package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Layout, TermStats}
import graft.operators.{Dedup, Rolling}

/** Round-5 retrieval/structure additions: BM25 ranking,
  * sorted-neighborhood blocking, sequence-gap detection, and the
  * per-file pruning audit — verified against first-principles
  * references and naive-form equivalence properties.
  */
class RetrievalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bm25Rank ----

  test("bm25Rank matches a driver-computed BM25 on a planted corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),          // tf(cat)=2, dl=3
      (2L, "cat mouse mouse bird"), // tf(cat)=1, dl=4
      (3L, "dog dog dog dog"),      // no query terms
      (4L, "cat")                   // tf(cat)=1, dl=1
    ).toDF("doc_id", "text")
    val out = TermStats.bm25Rank(docs, Seq("cat"), topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(3))).toMap

    val n = 4.0; val avgdl = 12.0 / 4.0
    val dfT = 3.0
    val idf = BigDecimal(math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(tf: Long, dl: Long): Double = {
      val c = idf * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
      val q = BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      q.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.keySet shouldBe Set(1L, 2L, 4L) // doc 3 has no query term
    out(1L)._1 shouldBe score(2, 3) +- 1e-9
    out(2L)._1 shouldBe score(1, 4) +- 1e-9
    out(4L)._1 shouldBe score(1, 1) +- 1e-9
    // short doc with one hit outranks long doc with one hit (length norm)
    out(4L)._2 should be < out(2L)._2
    // rank 1 = highest score
    val best = out.minBy(_._2._2)
    best._2._1 shouldBe out.values.map(_._1).max +- 1e-12
  }

  test("bm25Rank caps output at topK with deterministic tie order") {
    val docs = (1L to 20L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val out = TermStats.bm25Rank(docs, Seq("x"), topK = 5).collect()
    out.length shouldBe 5
    // identical scores → ties broken by doc_id ascending
    out.sortBy(_.getInt(3)).map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  // ---- sortedNeighborhood ----

  test("sortedNeighborhood equals the naive global-window form on random keys") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 300L).map { i =>
      val s = (1 to 8).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (i, s)
    }
    val df = rows.toDF("id", "k")
    for (w <- Seq(1, 3, 7)) {
      val fast = Dedup.sortedNeighborhood(df, "k", "id", w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val naive = {
        val idx = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, i.toLong + 1) }
        (for {
          (ia, xa) <- idx; (ib, xb) <- idx
          d = xb - xa if d >= 1 && d <= w
        } yield (ia, ib, d)).toSet
      }
      fast shouldBe naive
    }
  }

  test("sortedNeighborhood skips a constant key prefix and survives non-ASCII keys") {
    // ALL keys share 'Customer#' — without the min/max prefix skip the
    // 3-codepoint code is constant and every row lands in ONE bucket
    // (single-task sort); with it, order must still equal the naive
    // form. Alphabet mixes 1-, 2-, and 3-byte BMP codepoints to
    // exercise the 21-bit weight spacing (byte weights could invert).
    val rnd = new scala.util.Random(17)
    val alphabet = "abλд€"
    val rows = (1L to 200L).map { i =>
      (i, "Customer#" + (1 to 6).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = rows.toDF("id", "k")
    val fast = Dedup.sortedNeighborhood(df, "k", "id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = {
      val idx = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
        .map { case ((id, _), i) => (id, i.toLong + 1) }
      (for {
        (ia, xa) <- idx; (ib, xb) <- idx
        d = xb - xa if d >= 1 && d <= 4
      } yield (ia, ib, d)).toSet
    }
    fast shouldBe naive
  }

  test("sortedNeighborhood plans bucket-partitioned windows only (no global sort window)") {
    val df = (1L to 50L).map(i => (i, s"k$i")).toDF("id", "k")
    val plan = Dedup.sortedNeighborhood(df, "k", "id", 3)
      .queryExecution.optimizedPlan.toString
    // every Window node must partition on the bucket column
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      l should include("_b")
    }
  }

  // ---- Rolling.gaps ----

  test("gaps equals the naive per-key lead form, across buckets and negatives") {
    val rnd = new scala.util.Random(23)
    val rows = for {
      k <- Seq("a", "b"); _ <- 1 to 120
    } yield (k, (rnd.nextInt(400) - 100).toLong) // negatives + dups
    val df = rows.toDF("k", "id")
    for (width <- Seq(7L, 64L)) {
      val fast = Rolling.gaps(df, "k", "id", width)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val naive = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val ids = rs.map(_._2).distinct.sorted
        ids.zip(ids.drop(1)).collect {
          case (a, b) if b - a > 1 => (k, a + 1, b - 1, b - a - 1)
        }
      }.toSet
      fast shouldBe naive
    }
  }

  test("gaps spans entirely-missing buckets as one gap") {
    // ids 1 and 1000 with width 10: gap [2, 999] crosses ~100 empty buckets
    val df = Seq(("k", 1L), ("k", 1000L)).toDF("g", "id")
    val out = Rolling.gaps(df, "g", "id", 10L).collect()
    out.length shouldBe 1
    (out.head.getLong(1), out.head.getLong(2), out.head.getLong(3)) shouldBe (2L, 999L, 998L)
  }

  // ---- Layout.fileStats ----

  test("fileStats proves z-order locality: per-file ranges are narrow in BOTH dims") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 4096).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("a", "b")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_filestats_test"
    Layout.zorderLayout(df, "a", "b", nFiles = 16)
      .write.mode("overwrite").parquet(out)
    val stats = Layout.fileStats(spark, out, Seq("a", "b")).collect()
    stats.map(_.getAs[Long]("n_rows")).sum shouldBe 4096L
    // average per-file span in each dim well under the global span (256):
    // a z-curve over 16 files of a 256x256 grid keeps both spans bounded
    def spans(lo: String, hi: String) =
      stats.map(r => r.getAs[Long](hi) - r.getAs[Long](lo))
    val spanA = spans("min_a", "max_a"); val spanB = spans("min_b", "max_b")
    (spanA.sum.toDouble / spanA.length) should be < 200.0
    (spanB.sum.toDouble / spanB.length) should be < 200.0
    // and no file is empty
    stats.foreach(_.getAs[Long]("n_rows") should be > 0L)
  }
}
