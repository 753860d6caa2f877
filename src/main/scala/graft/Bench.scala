package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Per-frame codec queries whose cost is per-byte CPU: 10× data
    * legitimately costs up to ~10× wall on a fixed-core box (scales
    * with executor count on a cluster, not a shuffle problem), so the
    * growth gate exempts them.
    */
  val CodecQueries: Set[String] = Set(
    "q33_multimodal", "q50_audio", "q54_video", "q127_image_sig",
    "q134_audio_sig", "q135_scene_cuts")

  /** The sf1 growth gate as a pure function (unit-testable): queries
    * whose 10×-data wall grew past `maxGrowth` — the signature of an
    * accidental quadratic (the PPJoin lesson: a 9.2× growth was a
    * real structural defect both earlier rounds' JSON recorded but
    * nothing ENFORCED). Queries under `minSecs` at sf1 are skipped
    * (sub-second timings on this host are noise-dominated), as are
    * the per-byte codec queries.
    */
  def growthViolations(base: Seq[(String, Double)], sf1: Seq[(String, Double)],
                       maxGrowth: Double, minSecs: Double = 1.0): Seq[String] = {
    val b = base.toMap
    sf1.collect {
      case (name, t1) if !CodecQueries.contains(name) && t1 >= minSecs &&
        b.get(name).exists(t0 => t0 > 0 && t1 / t0 > maxGrowth) =>
        f"$name: ${b(name)}%.2fs -> $t1%.2fs (${t1 / b(name)}%.1fx > $maxGrowth%.1fx)"
    }
  }
  /** Cross-round regression gate (unit-testable): queries whose wall
    * vs the PREVIOUS committed BENCH_LOCAL grew past `maxRatio` — the
    * round-6 lesson: per-query times recorded under host contention
    * drifted 1.4-6.8× on UNCHANGED queries and polluted the committed
    * record. Comparing min-of-3 against the previous min-of-3 catches a
    * real regression the moment it lands instead of one round later.
    * Sub-`minSecs` timings are noise-dominated and skipped, as are the
    * per-byte codec queries (same rationale as the growth gate).
    */
  def regressionViolations(prev: Map[String, Double], cur: Seq[(String, Double)],
                           maxRatio: Double, minSecs: Double = 0.5): Seq[String] =
    cur.collect {
      case (name, t1) if !CodecQueries.contains(name) && t1 >= minSecs &&
        prev.get(name).exists(t0 => t0 > 0 && t1 / t0 > maxRatio) =>
        f"$name: ${prev(name)}%.2fs -> $t1%.2fs (${t1 / prev(name)}%.1fx > $maxRatio%.1fx)"
    }

  /** Resolve the cross-round regression BASELINE file: an explicitly
    * pinned path wins; otherwise the first existing candidate. The
    * round-9 ratchet fix: comparing against the mutable BENCH_LOCAL
    * .json meant any interim bench run silently became the baseline —
    * a 10× family-wide delta was invisible to the gate because the
    * interim run had already absorbed it. The baseline must be the
    * previous round's COMMITTED record (BENCH_BASE.json, snapshotted
    * from the committed BENCH_LOCAL at round start and never written
    * by bench runs), with the mutable out file only as the
    * first-round fallback.
    */
  def resolveRegressionBase(pinned: Option[String], candidates: Seq[String],
                            exists: String => Boolean): Option[String] =
    pinned.filter(exists).orElse(candidates.find(exists))

  /** Per-query times from a previous BENCH_LOCAL line. The file carries
    * `"queries":{...}` before `"sf1_queries":{...}`, so keeping the
    * FIRST occurrence of each name yields the sf0.1 pass.
    */
  def parseBenchQueries(line: String): Map[String, Double] = {
    val pair = """"(q[^"]+)":([0-9]+(?:\.[0-9]+)?)""".r
    pair.findAllMatchIn(line).foldLeft(Map.empty[String, Double]) { (m, g) =>
      if (m.contains(g.group(1))) m else m + (g.group(1) -> g.group(2).toDouble)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    def timedPass(dir: String): Seq[(String, Double)] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Warmup pass (JIT + codegen-cache + parquet-footer warm) is timed
    // too: it's pessimistic for the min, so it can only help — a free
    // third sample against this host's multi-second steal/contention
    // waves, which two timed passes alone can straddle.
    def minOf3(dir: String, tag: String): Seq[(String, Double)] = {
      val passes = Seq(timedPass(dir), timedPass(dir), timedPass(dir))
      queries.indices.map { i =>
        val name = passes.head(i)._1
        val ts = passes.map(_(i)._2)
        val dt = ts.min
        System.err.println(
          f"[bench:$tag] $name%-24s $dt%8.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
        name -> dt
      }
    }
    // ms precision keeps the one-line JSON short enough to survive the
    // driver's bounded stdout-tail capture (full-precision doubles for
    // 100+ queries overflowed it → BENCH parsed:null in r3/r4)
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val results = minOf3(sfDir, sfDir.split('/').last)
    val total = results.map(_._2).sum

    // Standing scale-growth gate: when benching the driver's sf0.1 dir,
    // also run the FK-consistent dup-heavy 10× replica (materialized
    // once, marker-gated) so sub-linear growth is re-proven every round
    // in BENCH itself, not by an ad-hoc probe. SPARK_GRAFT_SF1=0 skips.
    val (sf1Fields, sf1Scalars, sf1Violations) =
      if (sfDir.endsWith("sf0.1") && sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0") {
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/target/sf1")
        ScaleUp.scale(spark, sfDir, sf1Dir, 10)
        val r1 = minOf3(sf1Dir, "sf1")
        val t1 = r1.map(_._2).sum
        val growth = if (total > 0) t1 / total else -1.0
        val maxGrowth = sys.env.getOrElse("SPARK_GRAFT_MAX_GROWTH", "8.0").toDouble
        val bad = growthViolations(results, r1, maxGrowth)
        val scalars = s""","sf1_total":${fmt(t1)},"sf1_growth":${fmt(growth)}"""
        (s"""$scalars,"sf1_queries":${json(r1)}""", scalars, bad)
      } else ("", "", Nil)
    // Cross-round regression check against the previous ROUND's
    // committed per-query record — NOT the mutable out file, which any
    // interim bench run overwrites (the round-8 lesson: the ratchet
    // compared against its own last run and a genuine 10× delta never
    // tripped it). The baseline used is recorded in the JSON. Reported
    // in the JSON and on stderr every run; hard-fails only under
    // SPARK_GRAFT_REGRESSION_STRICT=1 — unlike the sf1 growth gate
    // (structural, host-independent), a cross-round ratio embeds the
    // previous round's host weather, so by default it must not cost the
    // round its numbers.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    val maxRegression = sys.env.getOrElse("SPARK_GRAFT_MAX_REGRESSION", "1.5").toDouble
    val basePath = resolveRegressionBase(
      sys.env.get("SPARK_GRAFT_REGRESSION_BASE"),
      Seq("/root/repo/BENCH_BASE.json", outFile),
      p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    val regressions = basePath.toSeq.flatMap { p =>
      try {
        val prevLine = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
        // cross-SF comparisons are meaningless (an sf0.01 smoke run vs
        // the committed sf0.1 record flags noise): only ratio against a
        // baseline recorded at the SAME scale factor
        val prevSf = "\"sf\":\"([^\"]*)\"".r.findFirstMatchIn(prevLine).map(_.group(1))
        if (prevSf.exists(_ != sfDir)) Nil
        else regressionViolations(parseBenchQueries(prevLine), results, maxRegression)
      } catch { case scala.util.control.NonFatal(_) => Nil } // unreadable: no record
    }
    val baseField = basePath
      .map(p => s""","regression_base":"$p"""").getOrElse("")
    val regField =
      if (regressions.isEmpty) ""
      else s""","regressions":[${regressions.map(r => "\"" + r + "\"").mkString(",")}]"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${json(results)},"sf":"$sfDir"$sf1Fields$baseField$regField}"""
    // The complete JSON lands in a file (committed per round), immune to
    // any stdout tail truncation by the calling harness.
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // stdout gets ONE line guaranteed to fit the driver's 2000-char
    // stdout-tail capture (r3/r4 lost the headline total because ~190
    // per-query entries pushed it past the window): headline totals +
    // the slowest queries, capped by line length, with a pointer to the
    // full per-query file.
    val headlineCap = 1700
    val slowest = results.sortBy(-_._2)
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size}$sf1Scalars,"queries_full":"BENCH_LOCAL.json","queries":"""
    val entries = slowest.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val kept = new StringBuilder
    var n = 0
    while (n < entries.size && prefix.length + kept.length + entries(n).length + 2 < headlineCap) {
      if (n > 0) kept.append(',')
      kept.append(entries(n)); n += 1
    }
    println(prefix + "{" + kept + "}}")
    spark.stop()
    if (regressions.nonEmpty) {
      System.err.println(
        "[bench] cross-round regressions vs " + basePath.getOrElse("?") + " (>" +
        maxRegression + "x):\n  " + regressions.mkString("\n  "))
      if (sys.env.getOrElse("SPARK_GRAFT_REGRESSION_STRICT", "0") == "1") sys.exit(2)
    }
    // Growth gate LAST: the JSON is printed and the file written above,
    // so a violation costs the exit code, never the round's numbers.
    if (sf1Violations.nonEmpty) {
      System.err.println(
        "[bench] sf1 growth gate FAILED — superlinear non-codec queries:\n  " +
        sf1Violations.mkString("\n  "))
      sys.exit(1)
    }
  }
}
