package graft

import org.apache.spark.sql.functions._

import graft.functions.TermStats
import graft.operators.{Behavior, Multimodal}

/** Round-5 additions: WAV header parse vs real decode, within-session
  * path mining vs a driver reference, and the Zipf rank-frequency fit
  * on a planted power law.
  */
class PathsZipfSpec extends SparkSpec {
  import spark.implicits._

  test("wavHeaderMeta agrees with the real AudioSystem decode") {
    val docs = Seq((1L, "short"), (2L, "a longer audio body to encode here"))
      .toDF("doc_id", "text")
    val payload = Multimodal.withAudioPayload(docs)
    val meta = Multimodal.wavHeaderMeta(payload).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    val full = Multimodal.decodeAudioFeatures(payload)
      .select("doc_id", "n_samples", "sample_rate")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    for ((id, (isWav, ch, rate, bits, dataBytes)) <- meta) {
      isWav shouldBe true
      ch shouldBe 1
      bits shouldBe 8
      rate shouldBe full(id)._2
      dataBytes shouldBe full(id)._1 // 8-bit mono: one byte per sample
    }
  }

  test("topPaths counts only within-session windows, with deterministic ranking") {
    val gap = 100L
    // user 1, session A: a b c d  → abc, bcd ; session B (after gap): a b c → abc
    // user 2, one session: a b c → abc
    val evs = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "c", 3L), (1L, 40L, "d", 4L),
      (1L, 500L, "a", 5L), (1L, 510L, "b", 6L), (1L, 520L, "c", 7L),
      (2L, 5L, "a", 8L), (2L, 6L, "b", 9L), (2L, 7L, "c", 10L)
    ).toDF("user_id", "tus", "event_type", "event_id")
    val out = Behavior.topPaths(evs, "user_id", "tus", "event_type",
      gapUs = gap, n = 3, topK = 10, tieCols = Seq("event_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    out("a>b>c") shouldBe ((3L, 1))
    out("b>c>d") shouldBe ((1L, 2))
    out.keySet shouldBe Set("a>b>c", "b>c>d") // no window ever crosses the gap
  }

  test("zipfFit recovers ~-1 slope on a planted 1/r power law") {
    val terms = (1 to 50).flatMap { r =>
      val c = math.max(1, math.round(2000.0 / r).toInt)
      Seq.fill(c)(f"t$r%03d")
    }
    val docs = terms.grouped(200).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val row = TermStats.zipfFit(docs, topN = 50).collect().head
    row.getAs[Long]("n_terms") shouldBe 50L
    row.getAs[Double]("slope") shouldBe -1.0 +- 0.05
    row.getAs[Double]("r2") should be > 0.99
  }
}
