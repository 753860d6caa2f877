package graft

import org.apache.spark.sql.functions._

import graft.functions.Profile
import graft.operators.{Multimodal, Similarity}

/** Round-5 additions: hard-negative mining, GIF header metadata, and
  * m-estimate target encoding.
  */
class NegativesEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("hardNegatives returns only different-label neighbors, ranked by cosine") {
    // two tight clusters; labels assigned so each cluster MIXES labels —
    // every anchor's nearest same-cluster neighbors include both labels
    val rnd = new scala.util.Random(3)
    def near(base: Array[Float]) = base.map(v => v + rnd.nextFloat() * 0.01f)
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val vecs = (0 until 10).map(i => (i.toLong, near(a), i % 2)) ++
      (10 until 20).map(i => (i.toLong, near(b), i % 2))
    val out = Similarity.hardNegatives(vecs.toDF("vec_id", "embedding", "label"),
      k = 3, nbits = 4, dim = 4)
    val rows = out.collect()
    rows.length should be > 0
    val labels = vecs.map(v => v._1 -> v._3).toMap
    rows.foreach { r =>
      labels(r.getLong(0)) should not be labels(r.getLong(1))
      r.getInt(3) should be <= 3
    }
    // ranks are dense per anchor starting at 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.map(_.getInt(3)).sorted shouldBe (1 to rs.length)
    }
    // negatives come from the anchor's own cluster (cos near 1)
    rows.map(_.getDouble(2)).min should be > 0.9
  }

  test("gif header parse agrees with the real decoder") {
    val docs = Seq((1L, "some text payload"), (2L, "x" * 321)).toDF("doc_id", "text")
    val withGif = Multimodal.withGifPayload(docs)
    val out = Multimodal.gifHeaderMeta(withGif)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getInt(3), r.getInt(4))).toMap
    // decode each payload with ImageIO and compare dims
    val decoded = withGif.collect().map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      r.getLong(0) -> (img.getWidth, img.getHeight)
    }.toMap
    out.keySet.foreach { id =>
      out(id)._1 shouldBe true
      (out(id)._2, out(id)._3) shouldBe decoded(id)
    }
    // geometry rule: n % 320 + 1 wraps past 320 bytes
    out(2L)._2 shouldBe 2
  }

  test("targetEncode shrinks small categories toward the global prior") {
    // prior = mean(all) ; category "rare" has one extreme value
    val df = (Seq.fill(50)(("common", 10.0)) :+ (("rare", 1000.0)))
      .toDF("cat", "v")
    val out = Profile.targetEncode(df, "cat", "v", m = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val prior = (50 * 10.0 + 1000.0) / 51
    // rare: (1000 + 10*prior) / 11 — far below its raw mean of 1000
    out("rare")._2 shouldBe ((1000.0 + 10 * prior) / 11) +- 1e-4
    out("rare")._2 should be < 200.0
    // common barely moves
    out("common")._2 shouldBe ((500.0 + 10 * prior) / 60) +- 1e-4
    out("common")._1 shouldBe 50L
  }

  test("targetEncode with m=0 is the exact per-category mean") {
    val df = Seq(("a", 1.5), ("a", 2.5), ("b", 4.0)).toDF("cat", "v")
    val out = Profile.targetEncode(df, "cat", "v", m = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("a") shouldBe 2.0 +- 1e-9
    out("b") shouldBe 4.0 +- 1e-9
  }

  test("targetEncodeOof fold-f rows equal targetEncode trained without fold f — the leakage contract") {
    val rnd = new scala.util.Random(53)
    val rows = (1 to 400).map(i =>
      (s"c${i % 7}", i % 4, math.floor(rnd.nextDouble() * 3000 - 1500) / 16))
    val df = rows.toDF("cat", "fold", "v")
    val oof = Profile.targetEncodeOof(df, "cat", "v", "fold", m = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    for (f <- 0 to 3) {
      val loo = Profile.targetEncode(df.filter(col("fold") =!= f), "cat", "v", m = 10)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      for (((cat, fold), (n, e)) <- oof if fold == f) {
        n shouldBe loo(cat)._1
        e shouldBe loo(cat)._2 +- 1e-6
      }
    }
    // tampering with fold f's targets must not move fold f's encodings
    val tampered = df.withColumn("v",
      when(col("fold") === 2, col("v") * 1000).otherwise(col("v")))
    val oof2 = Profile.targetEncodeOof(tampered, "cat", "v", "fold", m = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    for (((cat, fold), _) <- oof if fold == 2)
      oof2((cat, 2)) shouldBe oof((cat, 2))._2 +- 1e-9
  }

  test("targetEncodeOof: a single-fold category encodes to the out-of-fold prior with n_oof = 0") {
    val df = (Seq.fill(20)(("common", 0, 10.0)) ++ Seq.fill(20)(("common", 1, 20.0)) :+
      (("lonely", 0, 999.0))).toDF("cat", "fold", "v")
    val out = Profile.targetEncodeOof(df, "cat", "v", "fold", m = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // fold 0 excluded → prior over fold 1 only = 20.0; lonely has no
    // out-of-fold mass, so it lands exactly on the prior
    out(("lonely", 0)) shouldBe ((0L, 20.0))
  }
}
