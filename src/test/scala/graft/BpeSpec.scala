package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.Packing

/** The merges-table BPE tokenizer (SURVEY.md §2 #38b): learner
  * determinism, encode semantics, the pasted-constant sync contract,
  * and the distributed counter.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("Merges constant IS the learner's output on the seed text (no drift, no external vocab)") {
    Bpe.learnMerges(Bpe.SeedText, 48) shouldBe Bpe.Merges
  }

  test("learnMergesDistributed equals the driver learner, merge for merge") {
    // the seed text split across documents — the distributed trainer
    // must learn the IDENTICAL ordered merge table the driver
    // reference does (counts are corpus-global, so the doc split is
    // invisible); also exercises 1-char words (the 'a' in the seed)
    val docs = Bpe.SeedText.split("\n").zipWithIndex
      .map { case (line, i) => (i.toLong, line) }.toSeq.toDF("doc_id", "text")
    val got = Bpe.learnMergesDistributed(docs, nMerges = 20).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    val ref = Bpe.learnMerges(Bpe.SeedText, 20).zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
    got.toSeq shouldBe ref
    // pair_count of rank 1 equals the brute-force count of its pair
    val r1 = Bpe.learnMergesDistributed(docs, nMerges = 1).collect().head
    val (a1, b1) = (r1.getString(1), r1.getString(2))
    val brute = Bpe.SeedText.toLowerCase.trim.split("\\s+")
      .map(w => w.map(_.toString).toVector.sliding(2)
        .count(p => p.length == 2 && p(0) == a1 && p(1) == b1)).sum
    r1.getLong(3) shouldBe brute.toLong
  }

  test("encodeWord: rank-by-rank merging, seen and unseen words") {
    // fully merged seed words collapse to one symbol
    Bpe.encodeWord("the") shouldBe Vector("the")
    Bpe.encodeWord("streaming") shouldBe Vector("streaming") // rank 44 completes it
    Bpe.encodeWord("streamer") shouldBe Vector("stream", "er") // partial subwords
    // unseen word decomposes into learned subword units, lossless
    val toks = Bpe.encodeWord("shuffleboard")
    toks.mkString shouldBe "shuffleboard"
    toks.length should be < "shuffleboard".length // merges actually fired
    // a word with no applicable merges stays characters
    Bpe.encodeWord("zzz") shouldBe Vector("z", "z", "z")
    Bpe.encodeWord("") shouldBe Vector()
  }

  test("encodeWord equals the textbook lowest-rank-first loop on random words") {
    // rank-by-rank (the SQL-replayable form) must agree with the
    // classic "merge the lowest-ranked adjacent pair present" algorithm
    val ranks = Bpe.Merges.zipWithIndex.toMap
    def classic(word: String): Vector[String] = {
      var toks = word.map(_.toString).toVector
      var go = true
      while (go) {
        val cand = toks.zip(toks.drop(1)).flatMap(p => ranks.get(p).map(r => (r, p)))
        if (cand.isEmpty) go = false
        else {
          val (_, best) = cand.minBy(_._1)
          toks = {
            val buf = Vector.newBuilder[String]; var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && (toks(i), toks(i + 1)) == best) {
                buf += toks(i) + toks(i + 1); i += 2
              } else { buf += toks(i); i += 1 }
            }
            buf.result()
          }
        }
      }
      toks
    }
    val rnd = new scala.util.Random(13)
    val alpha = "theandsrwiogulcmpy"
    val words = Seq.fill(300)((0 until (rnd.nextInt(12) + 1))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    words.foreach { w => Bpe.encodeWord(w) shouldBe classic(w) }
  }

  test("bpeCount matches a driver-side brute force and never inflates past character count") {
    val docs = Seq(
      (1L, "the engine shuffles the data"),
      (2L, "query plans prune columns"),
      (3L, "zzz qqq"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = Bpe.bpeCount(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def brute(t: String): (Long, Long) = {
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      (ws.length.toLong, ws.map(w => Bpe.encodeWord(w).size.toLong).sum)
    }
    got(4L) shouldBe ((0L, 0L)) // empty text: no words on either engine
    got(1L) shouldBe brute("the engine shuffles the data")
    got(2L) shouldBe brute("query plans prune columns")
    got(3L) shouldBe ((2L, 6L))
    // BPE can only merge: counts sit between word count and char count
    got.values.foreach { case (ws, bpe) => bpe should be >= ws }
  }

  test("packCounted denominated in BPE tokens: offsets are the BPE prefix sums") {
    val docs = (0L until 10L)
      .map(i => (i, Seq.fill((i % 3 + 1).toInt)("streaming the shuffle").mkString(" ")))
      .toDF("doc_id", "text")
    val counts = Bpe.bpeCount(docs).select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
    val packed = Packing.packCounted(counts, capacity = 8, nShards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // "streaming the shuffle" = streaming, the, shuffle = 3 BPE tokens
    packed.foreach { case (d, _, n, _, _) => n shouldBe 3L * (d % 3 + 1) }
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.head._4 shouldBe 0L
      sorted.zip(sorted.scanLeft(0L)(_ + _._3)).foreach { case ((_, _, _, off, chunk), expect) =>
        off shouldBe expect
        chunk shouldBe off / 8
      }
    }
  }
}
