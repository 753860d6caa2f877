package graft

import org.apache.spark.sql.functions._

import graft.functions.Profile
import graft.operators.{Behavior, Multimodal}

/** Round-5 additions: decode-free PNG header parse, streaming PSI
  * drift, inter-arrival cadence, and equi-depth quantile binning.
  */
class DriftMetaOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- pngHeaderMeta ----

  test("pngHeaderMeta agrees with the full ImageIO decode on every payload") {
    val docs = Seq((1L, "alpha beta"), (2L, "x"), (3L, "some longer text body here"))
      .toDF("doc_id", "text")
    val payload = Multimodal.withImagePayload(docs)
    val meta = Multimodal.pngHeaderMeta(payload)
      .select("doc_id", "is_png", "width", "height", "bit_depth", "color_type")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val full = Multimodal.decodeImageFeatures(payload)
      .select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    for ((id, (isPng, w, h, depth, color)) <- meta) {
      isPng shouldBe true
      (w, h) shouldBe full(id)
      depth shouldBe 8  // TYPE_BYTE_GRAY
      color shouldBe 0  // grayscale
    }
  }

  test("pngHeaderMeta is a pure projection over the payload (no codec stage after it)") {
    // parse applied to a relation that already HAS the payload column:
    // the meta pass adds no exchange and no object-serialization stage
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val stored = Multimodal.withImagePayload(docs)
    stored.write.mode("overwrite")
      .parquet(s"${System.getProperty("java.io.tmpdir")}/graft_pngmeta_test")
    val onDisk = spark.read
      .parquet(s"${System.getProperty("java.io.tmpdir")}/graft_pngmeta_test")
    val plan = Multimodal.pngHeaderMeta(onDisk).queryExecution.executedPlan.toString
    (plan should not).include("Exchange")
    (plan should not).include("MapPartitions")
  }

  // ---- streamPsiHourly ----

  test("streamPsiHourly flags the drifted hour and clears the conforming one") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_psi_test").toString
    val h = 3600000000L // one hour in micros
    val rnd = new scala.util.Random(41)
    // hour 0: values uniform over [0, 100); hour 1: identical shape;
    // hour 2: shifted to [200, 300) — a fully moved distribution
    val evs =
      (1 to 400).map(i => (i.toLong, (0L * h + i * 1000L) * 1000L, "a", rnd.nextInt(100).toDouble)) ++
      (1 to 400).map(i => (i.toLong, (1L * h + i * 1000L) * 1000L, "a", rnd.nextInt(100).toDouble)) ++
      (1 to 400).map(i => (i.toLong, (2L * h + i * 1000L) * 1000L, "a", 200.0 + rnd.nextInt(100)))
    evs.toDF("user_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = streaming.Events.streamPsiHourly(spark, dir, binWidth = 20.0)
      .collect().map(r => r.getTimestamp(0).getTime -> r).toMap
    out.size shouldBe 3
    val byHour = out.toSeq.sortBy(_._1).map(_._2)
    val psi0 = byHour(0).getDouble(1)
    val psi2 = byHour(2).getDouble(1)
    psi0 should be < 0.2   // same generator as the corpus bulk
    // the baseline CONTAINS hour 2 (1/3 weight on its bins), so the
    // drifted hour scores ~0.7, not the disjoint-support blowup — still
    // far past the 0.2 "investigate" line and an order above hour 0
    psi2 should be > 0.5
    psi2 should be > psi0 * 3
    // hour 2's own bins exist nowhere in hours 0-1, and vice versa:
    // dropped-bin accounting must see both directions
    byHour(2).getLong(3) should be > 0L // n_bins_dropped
    byHour(0).getLong(4) shouldBe 400L  // n_events
  }

  // ---- interArrival ----

  test("interArrival matches a driver-computed gap profile with tie-stable order") {
    val rows = Seq(
      (1L, 100L, 1L), (1L, 400L, 2L), (1L, 250L, 3L), (1L, 400L, 4L), // dup time → tie by id
      (2L, 10L, 5L), (2L, 20L, 6L),
      (3L, 7L, 7L)                                                     // single event: no gaps
    ).toDF("user_id", "tus", "event_id")
    val out = Behavior.interArrival(rows, "user_id", "tus", Seq("event_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // user 1 sorted: (100,1),(250,3),(400,2),(400,4) → gaps 150, 150, 0
    out(1L) shouldBe ((3L, 0L, 150L, 150.0))
    out(2L) shouldBe ((1L, 10L, 10L, 10.0))
    out.contains(3L) shouldBe false
  }

  // ---- quantileBins ----

  test("quantileBins produces near-equal-population buckets with the documented tie rule") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 1000).map(i => ("g", i.toLong, rnd.nextInt(10000).toDouble / 10))
    val df = rows.toDF("g", "id", "v")
    val out = Profile.quantileBins(df, "g", "v", k = 4)
      .groupBy("bin").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(1, 2, 3, 4)
    out.values.foreach(n => n.toDouble shouldBe 250.0 +- 30.0)
  }

  test("quantileBins assigns exactly by the cutoff-count rule") {
    // values 1..8, k=2: cutoff = median = 4.5; v <= 4.5 → bin 1
    val df = (1L to 8L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "v")
    val out = Profile.quantileBins(df, "g", "v", k = 2)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    (1L to 4L).foreach(out(_) shouldBe 1)
    (5L to 8L).foreach(out(_) shouldBe 2)
  }
}
