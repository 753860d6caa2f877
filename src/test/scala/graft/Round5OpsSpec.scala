package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.operators.{AsofJoin, Behavior, Multimodal, Rolling}

/** Round-5 additions: autocorrelation, batch sessionization, last-touch
  * attribution, nearest as-of, audio/scene signatures, HLL set ops,
  * and the set-operation multiplicity arithmetic — each verified
  * against brute-force or first-principles references computed
  * driver-side on small planted corpora.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- point-in-time join (scd2 + asof composition) ----

  test("PIT join reads the dim state as of the fact time — never a future state, NULL before the first") {
    val upd = Seq((1L, 100L, 10L, "A"), (1L, 110L, 20L, "A"), (1L, 105L, 30L, "B"))
      .toDF("user_id", "event_id", "tus", "event_type")
    val periods = Rolling.scd2(upd, "user_id", "tus", "event_type", tieCols = Seq("event_id"))
      .select(col("user_id"), col("value").as("status"), col("valid_from").as("from_us"))
    // the repeated-A update compresses into ONE period starting at 10
    periods.collect().map(r => (r.getString(1), r.getLong(2))).sorted shouldBe
      Seq(("A", 10L), ("B", 30L))
    val facts = Seq((1L, 1L, 5L), (1L, 2L, 10L), (1L, 3L, 25L), (1L, 4L, 30L), (1L, 5L, 40L))
      .toDF("user_id", "event_id", "tus")
    val out = AsofJoin.asofJoin(facts, periods, "user_id", "tus", "from_us",
        Seq("status", "from_us"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    out shouldBe Map(1L -> null, 2L -> "A", 3L -> "A", 4L -> "B", 5L -> "B")
  }

  // ---- bitmap distinct ----

  test("bitmapDistinct is exact vs countDistinct and refuses negative ids") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 3000).map(_ => (s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val df = rows.toDF("g", "id")
    val out = Sketches.bitmapDistinct(df, "g", "id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((g, grp) <- rows.groupBy(_._1)) {
      out(g)._1 shouldBe grp.map(_._2).distinct.size.toLong
      out(g)._2 shouldBe grp.map(_._2 / 64).distinct.size.toLong
    }
    val ex = intercept[Exception] {
      Sketches.bitmapDistinct(Seq(("g", -1L)).toDF("g", "id"), "g", "id").collect()
    }
    ex.getMessage should include("alias")
  }

  // ---- JPEG header walk ----

  test("jpegHeaderMeta walks real ImageIO segments to the SOF frame") {
    import graft.operators.Multimodal
    val docs = Seq((1L, "x" * 17), (2L, "y" * 500), (3L, "z")).toDF("doc_id", "text")
    val out = Multimodal.jpegHeaderMeta(Multimodal.withJpegPayload(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getInt(3), r.getInt(4))).toMap
    for ((id, n) <- Seq((1L, 17L), (2L, 500L), (3L, 1L))) {
      out(id) shouldBe ((n, true, (n % 240 + 1).toInt, (n % 320 + 1).toInt))
    }
  }

  // ---- bitemporal as-of ----

  test("bitemporalAsOf separates known-then from corrected-later on both time axes") {
    import graft.operators.Upsert
    // (key, valid_from, tx, status): tx=5 is a late CORRECTION to valid=10
    val ch = Seq(
      (1L, 10L, 1L, "A"), (1L, 10L, 5L, "A2"), (1L, 20L, 3L, "B"), (1L, 30L, 9L, "C")
    ).toDF("k", "vf", "tx", "st")
    def asOf(t: Long, v: Long): Seq[(Long, String)] =
      Upsert.bitemporalAsOf(ch, "k", "vf", "tx", lit(t), lit(v))
        .collect().map(r => r.getLong(0) -> r.getString(3)).toSeq
    asOf(4, 25) shouldBe Seq(1L -> "B")   // before the correction arrived
    asOf(6, 25) shouldBe Seq(1L -> "B")   // correction is to an older validity
    asOf(6, 15) shouldBe Seq(1L -> "A2")  // same validity: later tx supersedes
    asOf(4, 15) shouldBe Seq(1L -> "A")   // as known then: the uncorrected value
    asOf(9, 100) shouldBe Seq(1L -> "C")
    asOf(0, 100) shouldBe Seq()           // nothing known yet
  }

  // ---- ORC roundtrip ----

  test("toOrc/readOrc roundtrips rows and schema exactly") {
    import graft.core.Tafra
    val df = Seq((1L, "a", 1.5, true), (2L, null.asInstanceOf[String], -0.25, false))
      .toDF("id", "s", "d", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec_").toString
    new Tafra(df).toOrc(dir)
    val back = Tafra.readOrc(spark, dir).df
    back.schema.map(f => (f.name, f.dataType)) shouldBe df.schema.map(f => (f.name, f.dataType))
    canon(back) shouldBe canon(df)
  }

  // ---- time-decay attribution ----

  test("timeDecayAttribution credits by exact dyadic half-life weights within the lookback") {
    import graft.operators.Behavior
    val day = 86400000000L
    val conv = Seq((1L, 10L * day, 90.0)).toDF("user_id", "tus", "value")
    val touches = Seq(
      (1L, 10L * day, "same_instant"),   // delta 0   -> w = 2^7 = 128
      (1L, 9L * day, "one_day"),          // delta 1d  -> w = 2^6 = 64
      (1L, 8L * day, "two_days"),         // delta 2d  -> w = 2^5 = 32
      (1L, 2L * day, "too_old"),          // delta 8d  -> outside lookback
      (1L, 11L * day, "future")           // after the conversion: never credited
    ).toDF("user_id", "tus", "channel")
    val out = Behavior.timeDecayAttribution(conv, touches, "user_id", "tus",
        "channel", "value", lookbackUs = 7L * day, halflifeUs = day)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // sw = 128 + 64 + 32 = 224; credits: 90·128/224, 90·64/224, 90·32/224
    out.keySet shouldBe Set("same_instant", "one_day", "two_days")
    out("same_instant")._2 shouldBe (90.0 * 128 / 224) +- 1e-6
    out("one_day")._2 shouldBe (90.0 * 64 / 224) +- 1e-6
    out("two_days")._2 shouldBe (90.0 * 32 / 224) +- 1e-6
    // total credit conserves the conversion value
    out.values.map(_._2).sum shouldBe 90.0 +- 1e-5
  }

  test("timeDecayAttribution merges duplicate-timestamp conversions before crediting") {
    import graft.operators.Behavior
    val day = 86400000000L
    val conv = Seq((1L, 5L * day, 10.0), (1L, 5L * day, 20.0)).toDF("user_id", "tus", "value")
    val touches = Seq((1L, 4L * day, "ch")).toDF("user_id", "tus", "channel")
    val out = Behavior.timeDecayAttribution(conv, touches, "user_id", "tus",
        "channel", "value", 7L * day, day).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 1L            // ONE credit row, not two
    out.head.getDouble(2) shouldBe 30.0 +- 1e-6
  }

  // ---- rendezvous hashing ----

  test("rendezvousShard matches a driver md5 argmax reference and moves ~1/(n+1) on growth") {
    import graft.functions.Layout
    val keys = (1 to 2000).map(_.toString)
    val df = keys.toDF("k")
    val out = df.select(col("k"), Layout.rendezvousShard(col("k"), 8).as("s8"),
        Layout.rendezvousShard(col("k"), 9).as("s9"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: Int, k: String): Long = {
      val d = md.digest(s"hrw|$s|$k".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def ref(k: String, n: Int): Int = (0 until n).maxBy(s => (h(s, k), s))
    keys.foreach { k => out(k) shouldBe ((ref(k, 8), ref(k, 9))) }
    // growth 8 -> 9 moves only the keys the new shard wins: ~1/9
    val moved = keys.count(k => out(k)._1 != out(k)._2)
    moved.toDouble / keys.size should be < 0.2
    moved should be > 0
    // every moved key moved TO the new shard (the HRW minimal-movement law)
    keys.filter(k => out(k)._1 != out(k)._2).foreach(k => out(k)._2 shouldBe 8)
    // all 8 shards populated
    keys.map(k => out(k)._1).distinct.size shouldBe 8
  }

  // ---- dyadic EWMA ----

  test("ewmaDyadic matches a driver-computed truncated kernel, incl. short leading frames") {
    import graft.operators.Rolling
    val rnd = new scala.util.Random(11)
    val rows = for (u <- 1 to 3; i <- 1 to 40) yield
      (u.toLong, (u * 1000 + i).toLong, i.toLong * 100L, math.floor(rnd.nextDouble() * 20000 - 10000) / 16)
    val df = rows.toDF("user_id", "event_id", "tus", "value")
    val out = Rolling.ewmaDyadic(df, "user_id", "tus", "value", "event_id", w = 16)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    for (u <- 1 to 3) {
      val series = rows.filter(_._1 == u).sortBy(r => (r._3, r._2))
      for ((row, idx) <- series.zipWithIndex) {
        val frame = series.slice(math.max(0, idx - 15), idx + 1).map(_._4)
        val m = frame.size
        val num = frame.zipWithIndex.map { case (v, j) =>
          BigInt(math.floor(v * 1e6 + 0.5).toLong) * BigInt(1L << (16 - m + j))
        }.sum
        val den = 65536.0 - math.pow(2.0, 16 - m)
        val exp = math.floor(num.toDouble / den / 1e6 * 1e9 + 0.5) / 1e9
        out(row._2) shouldBe exp +- 1e-12
      }
    }
  }

  test("ewmaDyadic weights halve per step back (planted impulse decays geometrically)") {
    import graft.operators.Rolling
    // value 1 at t=1, zeros after: ewma at row n (n<=16) = 2^(16-n)/(2^16-2^(16-n))
    val rows = (1 to 10).map(i => (1L, i.toLong, i.toLong, if (i == 1) 1.0 else 0.0))
    val out = Rolling.ewmaDyadic(rows.toDF("user_id", "event_id", "tus", "value"),
        "user_id", "tus", "value", "event_id", w = 16)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    for (n <- 1 to 10) {
      val wgt = math.pow(2.0, 16 - n)
      out(n.toLong) shouldBe (math.floor(wgt / (65536.0 - wgt) * 1e9 + 0.5) / 1e9) +- 1e-12
    }
  }

  // ---- RA link prediction ----

  test("raLinkPrediction matches brute force and drops known edges and hub neighbors") {
    import graft.operators.Graph
    // path 1-2-3-4 plus hub 9 connected to 1,2,3,4: with maxDeg=3 the
    // hub (deg 4) cannot serve as a common neighbor but still counts
    // as a known-edge endpoint
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
      .toDF("a", "b")
    val out = Graph.raLinkPrediction(pairs, "a", "b", maxDeg = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // deg: 1->2 (2,9), 2->3 (1,3,9), 3->3 (2,4,9), 4->2 (3,9), 9->4
    // candidate common neighbors (deg<=3): 1,2,3,4
    // (1,3) via w=2 (deg 3): cn=1, ra=333333333; edge absent -> kept
    // (2,4) via w=3 (deg 3): cn=1, ra=333333333; kept
    // (1,9),(2,9)... all hub pairs are existing edges -> dropped
    // (1,2) via w=9? hub excluded; (1,2) is an edge anyway
    out shouldBe Map((1L, 3L) -> (1L, 333333333L), (2L, 4L) -> (1L, 333333333L))
  }

  // ---- autocorr ----

  test("autocorr matches driver-computed Pearson on random series, NULL on degenerate") {
    val rnd = new scala.util.Random(7)
    val rows = for (u <- 1 to 4; i <- 1 to 30) yield
      (u.toLong, (u * 1000 + i).toLong, i.toLong * 1000L, math.floor(rnd.nextDouble() * 1000) / 10)
    // one constant-value user → zero variance → NULL acf
    val const = (1 to 10).map(i => (9L, (9000 + i).toLong, i.toLong * 1000L, 5.0))
    val df = (rows ++ const).toDF("user_id", "event_id", "tus", "value")
    val out = Rolling.autocorr(df, "user_id", "tus", "value", "event_id", lags = Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    def ref(u: Long, lag: Int): (Long, Option[Double]) = {
      val vs = (rows ++ const).filter(_._1 == u).sortBy(r => (r._3, r._2)).map(_._4)
      val q = vs.map(v => math.floor(v * 1000000L + 0.5).toLong)
      val pairs = q.dropRight(lag).zip(q.drop(lag))
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val acf = if (pairs.size >= 2 && vx > 0 && vy > 0)
        Some(BigDecimal((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      (pairs.size.toLong, acf)
    }
    for (u <- Seq(1L, 2L, 3L, 4L); lag <- Seq(1, 2)) {
      val (n, acf) = ref(u, lag)
      out((u, lag))._1 shouldBe n
      (out((u, lag))._2, acf) match {
        case (Some(a), Some(b)) => a shouldBe b +- 1e-9
        case (a, b) => a shouldBe b
      }
    }
    out((9L, 1))._2 shouldBe None // constant series: zero variance
  }

  // ---- batch sessionization ----

  test("sessionizeBatch splits on gaps > gapUs, events partition into sessions") {
    val gap = 100L
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 100L),   // gaps 50,50 → one session
      (1L, 4L, 300L),                                  // gap 200 → new session
      (1L, 5L, 301L),
      (2L, 6L, 0L)                                     // lone event
    ).toDF("user_id", "event_id", "tus")
    val out = Behavior.sessionizeBatch(ev, "user_id", "tus", gapUs = gap,
      tieCols = Seq("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.size shouldBe 3
    out((1L, 1L)) shouldBe ((0L, 100L, 3L))
    out((1L, 2L)) shouldBe ((300L, 301L, 2L))
    out((2L, 1L)) shouldBe ((0L, 0L, 1L))
  }

  test("sessionizeBatch property: a gap exactly equal to gapUs does NOT split") {
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 100L)).toDF("user_id", "event_id", "tus")
    Behavior.sessionizeBatch(ev, "user_id", "tus", gapUs = 100L,
      tieCols = Seq("event_id")).count() shouldBe 1L
  }

  // ---- last-touch attribution ----

  test("lastTouchAttribution credits the latest in-window touch; outside-lookback is NULL channel") {
    val conv = Seq((1L, 1000L, 10.0), (2L, 1000L, 20.0), (3L, 1000L, 40.0))
      .toDF("user_id", "tus", "value")
    val touches = Seq(
      (1L, 900L, "email"), (1L, 950L, "ad"),   // latest in window: ad
      (2L, 100L, "ad"),                        // outside 500-lookback → NULL
      (3L, 1000L, "search")                    // touch AT conversion time counts
    ).toDF("user_id", "tus", "channel")
    val out = Behavior.lastTouchAttribution(conv, touches,
      "user_id", "tus", "channel", "value", lookbackUs = 500L)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getDouble(2))).toMap
    out(Some("ad")) shouldBe ((1L, 10.0))
    out(Some("search")) shouldBe ((1L, 40.0))
    out(None) shouldBe ((1L, 20.0))
  }

  // ---- nearest as-of ----

  test("asofJoinNearest equals brute force incl. equidistant-tie-to-backward and tolerance") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 120).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong * 10))
      .distinct.map { case (k, t) => (k, t, s"L$k-$t") }
    val right = (1 to 80).map(_ => (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong * 10))
      .distinct.map { case (k, t) => (k, t, t * 7) }
    val l = left.toDF("k", "t", "tag")
    val r = right.toDF("k", "rt", "pay")
    val tol = 70L
    val out = AsofJoin.asofJoinNearest(l, r, "k", "t", "rt", Seq("rt", "pay"),
      tolerance = Some(lit(tol))).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    for ((k, t, _) <- left) {
      val cands = right.filter(c => c._1 == k && math.abs(c._2 - t) <= tol)
      val want = if (cands.isEmpty) None
        else Some(cands.minBy(c => (math.abs(c._2 - t), c._2))._2)
      withClue(s"k=$k t=$t: ") { out((k, t)) shouldBe want }
    }
  }

  test("asofJoinNearest prefers the backward row on an exact-distance tie") {
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L, "back"), (1L, 110L, "fwd")).toDF("k", "rt", "who")
    AsofJoin.asofJoinNearest(l, r, "k", "t", "rt", Seq("who"))
      .collect().head.getString(2) shouldBe "back"
  }

  // ---- audio signatures ----

  test("audioSignatures matches a first-principles reference on the raw bytes") {
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaZZZZZZZZZZZZZZZZ"),  // quiet half, loud half
      (2L, "aaaaaaaaaaaaaaaaZZZZZZZZZZZZZZZZ"),  // identical → same sig
      (3L, "mixed content with Varying LOUDNESS and quiet stretches here"),
      (4L, "")                                    // empty → sig 0
    ).toDF("doc_id", "text")
    val out = Multimodal.audioSignatures(Multimodal.withAudioPayload(docs))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def ref(text: String): (Long, Long) = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length.toLong
      if (n == 0) return (0L, 0L)
      val blocks = 16
      val bss = new Array[Long](blocks); val bn = new Array[Long](blocks)
      var gss = 0L
      for (p <- bytes.indices) {
        val a = (bytes(p) & 0xff) - 128
        val blk = (p.toLong * blocks / n).toInt
        bss(blk) += a.toLong * a; bn(blk) += 1; gss += a.toLong * a
      }
      var sig = 0L
      for (b <- 0 until blocks) if (bss(b) * n > gss * bn(b)) sig |= 1L << b
      (n, sig)
    }
    out(1L) shouldBe ref("aaaaaaaaaaaaaaaaZZZZZZZZZZZZZZZZ")
    out(3L) shouldBe ref("mixed content with Varying LOUDNESS and quiet stretches here")
    out(4L) shouldBe ((0L, 0L))
    out(1L) shouldBe out(2L) // identical clips collide
    // the loud half must dominate: its blocks carry the set bits
    val sig1 = out(1L)._2
    (sig1 >> 8) should not be 0L
    (sig1 & 0xff) shouldBe 0L
  }

  // ---- scene cuts ----

  test("videoSceneCuts matches the tiling-formula reference; uniform video has no cuts") {
    // 200 chars → 4 frames (64/64/64/8); uniform bytes → equal means → 0 cuts
    val uniform = "x" * 200
    // frame 0 = 'a'*64 (mean 97), frame 1 = 'z'*64 ... but the tail frame
    // tiles a short slice — compute the expected cuts from the same
    // integer formula the decoder uses
    val jumpy = "a" * 64 + "z" * 64 + "a" * 64 + "zz"
    val docs = Seq((1L, uniform), (2L, jumpy)).toDF("doc_id", "text")
    val out = Multimodal.videoSceneCuts(Multimodal.withVideoPayload(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap

    def ref(text: String): (Int, Int, Option[Int]) = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      val nf = math.min(n / 64 + 1, 8)
      val frames = (0 until nf).map { f =>
        val lo = f * 64
        val hi = if (f == nf - 1) n else (f + 1) * 64
        val slice = bytes.slice(lo, hi)
        val flen = slice.length
        if (flen == 0) (1L, 0L)
        else {
          val (w, h) = (flen % 320 + 1, flen % 240 + 1)
          val npix = (w * h).toLong
          val sliceSum = slice.map(b => (b & 0xff).toLong).sum
          val cycles = npix / flen
          val rem = (npix % flen).toInt
          (npix, cycles * sliceSum + slice.take(rem).map(b => (b & 0xff).toLong).sum)
        }
      }
      var cuts = 0; var first = -1
      for (f <- 1 until nf) {
        val (np, s) = frames(f); val (pp, ps) = frames(f - 1)
        if (math.abs(s * pp - ps * np) > 8 * np * pp) {
          cuts += 1; if (first < 0) first = f
        }
      }
      (nf, cuts, if (first < 0) None else Some(first))
    }
    out(1L) shouldBe ref(uniform)
    out(1L)._2 shouldBe 0
    out(2L) shouldBe ref(jumpy)
    out(2L)._2 should be >= 2
  }

  // ---- HLL set estimates ----

  test("hllSetEstimates: A=A collapses, disjoint sets intersect near zero, union = max-merge") {
    val a = Sketches.hllRegisters((1 to 3000).map(i => s"a$i").toDF("k"), "k")
    val b = Sketches.hllRegisters((1 to 3000).map(i => s"b$i").toDF("k"), "k")
    val same = Sketches.hllSetEstimates(a, a).collect().head
    same.getDouble(0) shouldBe same.getDouble(2) // est_a == est_union when B = A
    same.getDouble(3) shouldBe same.getDouble(0) +- 1e-6

    val disj = Sketches.hllSetEstimates(a, b).collect().head
    val (ea, eb, eu, ei) = (disj.getDouble(0), disj.getDouble(1), disj.getDouble(2), disj.getDouble(3))
    eu shouldBe (ea + eb) +- 0.2 * (ea + eb)   // ~6000 distinct
    math.abs(ei) should be < 0.2 * (ea + eb)   // near-zero intersection

    // union registers from the merged KEY SET equal the cellwise max
    val both = Sketches.hllRegisters(
      ((1 to 3000).map(i => s"a$i") ++ (1 to 3000).map(i => s"b$i")).toDF("k"), "k")
    val mergedMax = a.unionByName(b).groupBy("bucket").agg(max("r").as("r"))
    both.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap shouldBe
      mergedMax.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  // ---- rolling anomaly flags ----

  test("anomalies flags a planted spike, gives no verdict under minObs, and matches brute force") {
    val base = (1 to 20).map(i => (1L, i.toLong * 10L, 100.0 + (i % 3))) // tame baseline
    val spike = Seq((1L, 205L, 500.0))
    val young = Seq((2L, 10L, 1.0), (2L, 20L, 999.0)) // only 1 baseline obs → NULL
    val df = (base ++ spike ++ young).toDF("k", "tus", "v")
    val out = Rolling.anomalies(df, "k", "tus", "v", widthUs = 1000L, minObs = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toMap
    out((1L, 205L)) shouldBe Some(true)   // the spike
    out((1L, 200L)) shouldBe Some(false)  // a tame row with full baseline
    out((2L, 20L)) shouldBe None          // under minObs → no verdict

    // brute-force agreement on random data (quantized driver-side)
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map(i => (i.toLong % 3, rnd.nextInt(500).toLong,
      math.floor(rnd.nextDouble() * 10000) / 100))
    val d2 = rows.toDF("k", "tus", "v")
    val got = Rolling.anomalies(d2, "k", "tus", "v", widthUs = 100L, minObs = 3L, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getBoolean(4)))).toMap
    for ((k, t, v) <- rows.distinct) {
      val vq = (x: Double) => math.floor(x * 1000000L + 0.5).toLong
      val frame = rows.filter(r => r._1 == k && r._2 >= t - 100L && r._2 <= t)
      // baseline = frame minus ONE copy of this row
      val self = (k, t, v)
      val idx = frame.indexOf(self)
      val baseline = frame.patch(idx, Nil, 1).map(r => vq(r._3))
      val n = baseline.size.toLong
      val want: Option[Boolean] = if (n < 3) None else {
        val s = baseline.map(BigInt(_)).sum
        val ss = baseline.map(x => BigInt(x) * x).sum
        val dev = BigInt(n) * vq(v) - s
        Some(dev * dev > BigInt(4) * (BigInt(n) * ss - s * s))
      }
      // rows duplicated in the random draw collapse to one map entry;
      // compare whichever verdict the engine reported for the key
      got.get((k, t, v)).foreach { case (gn, gf) =>
        val dups = frame.count(_ == self) - 1
        if (dups == 0) { gn shouldBe n; gf shouldBe want }
      }
    }
  }

  // ---- distribution matching ----

  test("matchDistribution realizes the target marginal; binding stratum keeps everything") {
    // skewed raw mix: a=600, b=300, c=100 rows
    val rows = (1 to 600).map(i => (s"d$i", "a")) ++
      (601 to 900).map(i => (s"d$i", "b")) ++
      (901 to 1000).map(i => (s"d$i", "c")) ++
      (1001 to 1050).map(i => (s"d$i", "zz")) // unlisted → dropped
    val tf = new graft.core.Tafra(rows.toDF("doc_id", "source"))
    val target = Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5)
    val out = tf.matchDistribution("source", target, Seq("doc_id")).df.collect()
    val kept = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    kept.keySet shouldBe Set("a", "b", "c")
    // scale = min(600/0.2, 300/0.3, 100/0.5) = 200 → targets 40/60/100
    val fracs = out.map(r => r.getAs[String]("source") -> r.getAs[Double]("keep_frac")).toMap
    fracs("c") shouldBe 1.0 // binding stratum
    kept("c") shouldBe 100  // keeps everything
    fracs("a") shouldBe (200.0 * 0.2 / 600.0) +- 1e-12
    fracs("b") shouldBe (200.0 * 0.3 / 300.0) +- 1e-12
    // realized counts near the 40/60 targets (16-bit hash threshold)
    kept("a").toDouble shouldBe 40.0 +- 12.0
    kept("b").toDouble shouldBe 60.0 +- 14.0
  }

  // ---- KS drift ----

  test("ksDistance: disjoint distributions give D=1, interleaved give small D, known case exact") {
    val disj = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", 1000.0 + i))).toDF("g", "v")
    val d1 = functions.Profile.ksDistance(disj, "g", "a", "b", "v").collect().head
    d1.getDouble(0) shouldBe 1.0
    d1.getLong(2) shouldBe 50L

    val same = ((1 to 50) ++ (1 to 50)).map(i => ("a", i.toDouble))
      .zipWithIndex.map { case ((g, v), i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("g", "v")
    val d2 = functions.Profile.ksDistance(same, "g", "a", "b", "v").collect().head
    d2.getDouble(0) should be < 0.3

    // hand-computable: a={1,2,3,4}, b={3,4,5,6} → D peaks at v=2: |2/4-0|=0.5
    val known = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val d3 = functions.Profile.ksDistance(known, "g", "a", "b", "v").collect().head
    d3.getDouble(0) shouldBe 0.5
    d3.getDouble(1) shouldBe 2.0 // smallest peak value wins the tie
  }

  // ---- k-core ----

  test("kCore peels to the maximal min-degree-k subgraph; brute-force equal on random graphs") {
    // triangle {1,2,3} + pendant 3→4 + chain 5-6-7: only the triangle survives k=2
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val out = graft.operators.Graph.kCore(pairs, "a", "b", k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)

    val rnd = new scala.util.Random(17)
    val redges = (1 to 60).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val got = graft.operators.Graph.kCore(redges.toDF("a", "b"), "a", "b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var adj = redges.flatMap(e => Seq(e, e.swap)).toSet
    var changed = true
    while (changed) {
      val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val pruned = adj.filter(e => keep(e._1) && keep(e._2))
      changed = pruned.size != adj.size
      adj = pruned
    }
    val want = adj.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got shouldBe want
  }

  // ---- PSI ----

  test("psi: zero on identical histograms, hand-computable on a planted shift, dropped bins counted") {
    val same = ((1 to 100).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 100).map(i => ("b", (i % 10).toDouble))).toDF("g", "v")
    val r0 = functions.Profile.psi(same, "g", "a", "b", "v", 2.0).collect().head
    r0.getDouble(0) shouldBe 0.0
    r0.getLong(2) shouldBe 0L

    // a: bins {0: .8, 1: .2}; b: {0: .5, 1: .3, 2: .2} at width 1
    val av = Seq.fill(80)(0.5) ++ Seq.fill(20)(1.5)
    val bv = Seq.fill(50)(0.5) ++ Seq.fill(30)(1.5) ++ Seq.fill(20)(2.5)
    val df = (av.map(("a", _)) ++ bv.map(("b", _))).toDF("g", "v")
    val r = functions.Profile.psi(df, "g", "a", "b", "v", 1.0).collect().head
    def term(p: Double, q: Double) =
      BigDecimal((p - q) * math.log(p / q)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = BigDecimal((term(0.8, 0.5) + term(0.2, 0.3)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    r.getDouble(0) shouldBe want
    r.getLong(1) shouldBe 2L // bins 0 and 1 used
    r.getLong(2) shouldBe 1L // bin 2 exists only in b → dropped, flagged
  }

  // ---- global ordinal assignment ----

  test("globalIndex equals the global sort rank, contiguous, negative keys included") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i => (rnd.nextInt(2000).toLong - 1000L, i.toLong)).distinct
    val tf = new graft.core.Tafra(rows.toDF("k", "tie"))
    val out = tf.globalIndex("k", Seq("tie"), bucketWidth = 100L).df.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("tie")) -> r.getAs[Long]("global_idx")).toMap
    val want = rows.sortBy(identity).zipWithIndex.map { case (kv, i) => kv -> (i + 1L) }.toMap
    out shouldBe want
    out.values.toSeq.sorted shouldBe (1L to rows.size.toLong)
  }

  test("globalIndex ranks inside PARTITIONED windows — never one global window task") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "tie")
    val p = new graft.core.Tafra(df).globalIndex("k", Seq("tie"), 10L)
      .df.queryExecution.executedPlan.toString
    p should include("Exchange hashpartitioning(_b")
    // the row-level window must be partitioned by bucket; the only
    // unpartitioned window runs over the bucket-count table
    val rowWindows = p.linesIterator.filter(_.contains("row_number")).toList
    rowWindows should not be empty
    rowWindows.foreach(_ should include("windowspecdefinition(_b"))
  }

  // ---- winsorize ----

  test("winsorize clamps into the per-group exact percentile band and keeps every row") {
    val vals = (1 to 99).map(_.toDouble) :+ 100000.0 // one huge outlier in group a
    val df = (vals.map(("a", _)) ++ Seq(("b", 5.0), ("b", 6.0), ("b", 7.0))).toDF("g", "v")
    val out = functions.Profile.winsorize(df, "g", "v", 0.05, 0.95).collect()
    out.length shouldBe vals.size + 3
    val aCl = out.filter(_.getString(0) == "a").map(_.getAs[Double]("clamped"))
    // p95 of {1..99, 100000} via the p·(n−1) rule: rank 94.05 → 95.05;
    // the outlier must clamp to it, interior values stay put
    aCl.max shouldBe 95.05 +- 1e-9
    out.filter(r => r.getString(0) == "a" && r.getAs[Double]("v") == 50.0)
      .head.getAs[Double]("clamped") shouldBe 50.0
    // lows clamp up to p05
    aCl.min shouldBe (1.0 + 0.05 * 99) +- 1e-9
  }

  // ---- chi-square ----

  test("chiSquare matches the hand-computed 2x2 statistic; independent table gives 0") {
    // r1: A=30 B=10; r2: A=10 B=30 → e=20 everywhere → χ² = 4·(10²/20) = 20
    val skew = (Seq.fill(30)(("r1", "A")) ++ Seq.fill(10)(("r1", "B")) ++
      Seq.fill(10)(("r2", "A")) ++ Seq.fill(30)(("r2", "B"))).toDF("coh", "cat")
    val r = functions.Profile.chiSquare(skew, "coh", "cat").collect().head
    r.getDouble(0) shouldBe 20.0
    r.getLong(1) shouldBe 1L
    r.getLong(2) shouldBe 80L

    // perfectly proportional table → statistic exactly 0
    val indep = (Seq.fill(40)(("r1", "A")) ++ Seq.fill(20)(("r1", "B")) ++
      Seq.fill(20)(("r2", "A")) ++ Seq.fill(10)(("r2", "B"))).toDF("coh", "cat")
    functions.Profile.chiSquare(indep, "coh", "cat")
      .collect().head.getDouble(0) shouldBe 0.0
  }

  // ---- compaction plan ----

  test("compactionPlan groups by exclusive byte prefix; an oversized file claims its id span") {
    val files = Seq(("a", 3000L), ("b", 3000L), ("c", 10000L), ("d", 100L)).toDF("f", "sz")
    // exclusive prefixes: a=0, b=3000 → group 0; c=6000 → group 1; d=16000 → group 3
    val out = functions.Layout.compactionPlan(files, "f", "sz", 4096L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out shouldBe Map(0L -> ((2L, 6000L)), 1L -> ((1L, 10000L)), 3L -> ((1L, 100L)))
  }

  // ---- k-anonymity / l-diversity ----

  test("kAnonymity flags small groups and low-diversity groups") {
    val rows = Seq.fill(10)(("NY", "F", 1L)) ++ Seq.fill(10)(("NY", "F", 2L)) ++
      Seq.fill(2)(("SF", "M", 3L)) ++        // tiny group → k violation
      Seq.fill(10)(("LA", "F", 4L))          // one sensitive value → l violation
    val out = functions.Profile.kAnonymity(rows.toDF("city", "sex", "uid"),
      Seq("city", "sex"), "uid", k = 5L, l = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toMap
    out(("NY", "F")) shouldBe ((20L, 2L, 0, 0))
    out(("SF", "M")) shouldBe ((2L, 1L, 1, 1))
    out(("LA", "F")) shouldBe ((10L, 1L, 0, 1))
  }

  // ---- weighted percentile ----

  test("weightedPercentile: weight moves the crossing; uniform weights reduce to the step median") {
    val skew = Seq(("g", 1L, 1L), ("g", 10L, 9L)).toDF("grp", "v", "w")
    functions.Profile.weightedPercentile(skew, "grp", "v", "w", 1L, 2L)
      .collect().head.getLong(1) shouldBe 10L

    val rnd = new scala.util.Random(29)
    val rows = (1 to 300).map(_ => ("u", rnd.nextInt(50).toLong, 1L + rnd.nextInt(9)))
    val got = functions.Profile.weightedPercentile(rows.toDF("grp", "v", "w"),
      "grp", "v", "w", 3L, 4L).collect().head
    val total = rows.map(_._3).sum
    val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    var cum = 0L
    val want = byV.collectFirst { case (v, w0) if { cum += w0; cum * 4 >= total * 3 } => v }.get
    got.getLong(1) shouldBe want
    got.getLong(2) shouldBe total
  }

  // ---- schema-evolution read ----

  test("readParquetMerged unions evolved schemas; early rows surface NULL for late columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_spec_").toString
    Seq((1L, "a")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    Seq((2L, "b", "en")).toDF("id", "s", "lang").write.mode("append").parquet(dir)
    val out = graft.core.Tafra.readParquetMerged(spark, dir).df
    out.columns.toSet shouldBe Set("id", "s", "lang")
    out.count() shouldBe 2L
    out.filter(col("id") === 1L).head.getAs[String]("lang") shouldBe null
    out.filter(col("id") === 2L).head.getAs[String]("lang") shouldBe "en"
  }

  // ---- CMS join-size estimate ----

  test("cmsJoinSizeEstimate never underestimates; exact when keys don't collide") {
    import graft.functions.Sketches
    val rnd = new scala.util.Random(31)
    val as = Seq.fill(300)(rnd.nextInt(40).toLong)
    val bs = Seq.fill(200)(rnd.nextInt(40).toLong)
    val exact = {
      val bc = bs.groupBy(identity).view.mapValues(_.size).toMap
      as.map(k => bc.getOrElse(k, 0).toLong).sum
    }
    val est = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsBuild(as.toDF("k"), "k"), Sketches.cmsBuild(bs.toDF("k"), "k"))
      .collect().head.getAs[java.math.BigDecimal]("est").longValueExact()
    est should be >= exact
    // 40 distinct keys over 1024 cells: no in-row collision is certain
    // only per hash row, but the MIN over 4 independent rows lands on a
    // collision-free row with near-certainty for this key count
    est shouldBe exact
  }

  // ---- Gini ----

  test("gini: 0 on uniform, (n-1)/n on total concentration, matches the rank identity") {
    val uniform = (1 to 50).map(i => ("u", 7L, i.toLong)).toDF("g", "v", "id")
    functions.Profile.gini(uniform, "g", "v", "id")
      .collect().head.getDouble(2) shouldBe 0.0

    val conc = ((1 to 9).map(i => ("c", 0L, i.toLong)) :+ (("c", 100L, 10L))).toDF("g", "v", "id")
    functions.Profile.gini(conc, "g", "v", "id")
      .collect().head.getDouble(2) shouldBe 0.9 +- 1e-9

    val rnd = new scala.util.Random(37)
    val rows = (1 to 200).map(i => ("r", rnd.nextInt(1000).toLong, i.toLong))
    val got = functions.Profile.gini(rows.toDF("g", "v", "id"), "g", "v", "id")
      .collect().head.getDouble(2)
    val sorted = rows.map(_._2).sorted
    val n = sorted.size
    val sx = sorted.sum.toDouble
    val six = sorted.zipWithIndex.map { case (x, i) => x.toDouble * (i + 1) }.sum
    val want = BigDecimal((2 * six - (n + 1) * sx) / (n * sx))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    got shouldBe want +- 1e-9
  }

  // ---- plan shapes ----

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q129 unpivot is map-only: one Expand, no Exchange") {
    val p = plan("q129_unpivot")
    p should include("Expand")
    (p should not).include("Exchange")
  }

  test("q137 sessionize: gap flag and running session id share ONE exchange and ONE sort") {
    val p = plan("q137_batch_sessions")
    p.linesIterator.count(_.contains("Exchange hashpartitioning(user_id")) shouldBe 1
    p.linesIterator.count(_.contains("Sort [")) shouldBe 1
    p should include("partial_min") // session extents combine map-side
  }

  test("asofJoinNearest: both directional carries from ONE exchange (two sorts)") {
    val l = (1 to 50).map(i => (i.toLong % 5, i.toLong * 10)).toDF("k", "t")
    val r = (1 to 30).map(i => (i.toLong % 5, i.toLong * 13)).toDF("k", "rt")
    val p = AsofJoin.asofJoinNearest(l, r.withColumn("pay", col("rt") * 2),
      "k", "t", "rt", Seq("pay")).queryExecution.executedPlan.toString
    p.linesIterator.count(_.contains("Exchange hashpartitioning(k")) shouldBe 1
    p.linesIterator.count(_.contains("Sort [")) shouldBe 2
  }

  test("q132 autocorr: leads share one window sort, Pearson sums combine map-side") {
    val p = plan("q132_autocorr")
    p.linesIterator.count(_.contains("Sort [")) shouldBe 1
    p should include("partial_sum")
    p should include("partial_count")
  }

  test("q135 scene cuts stay inside the pinned codec rebalance: exactly one Exchange") {
    val p = plan("q135_scene_cuts")
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    p should include("REPARTITION_BY_NUM")
  }

  // ---- set-op multiplicity arithmetic (the q130 oracle rule) ----

  test("exceptAll/intersectAll equal per-key multiplicity arithmetic on random multisets") {
    val rnd = new scala.util.Random(3)
    val m1 = Seq.fill(400)(rnd.nextInt(40).toLong)
    val m2 = Seq.fill(250)(rnd.nextInt(40).toLong)
    val d1 = m1.toDF("k"); val d2 = m2.toDF("k")
    val c1 = m1.groupBy(identity).view.mapValues(_.size).toMap
    val c2 = m2.groupBy(identity).view.mapValues(_.size).toMap

    val ex = d1.exceptAll(d2).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exRef = c1.map { case (k, n) => k -> (n - c2.getOrElse(k, 0)).toLong }
      .filter(_._2 > 0)
    ex shouldBe exRef

    val in = d1.intersectAll(d2).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inRef = c1.flatMap { case (k, n) =>
      val m = math.min(n, c2.getOrElse(k, 0)).toLong
      if (m > 0) Some(k -> m) else None
    }
    in shouldBe inRef
  }
}
