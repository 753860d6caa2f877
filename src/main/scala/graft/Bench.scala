package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  /** Core-aware growth cap. At sf0.1 the suite is per-query fixed
    * overhead (planning + scheduling), which does NOT shrink with
    * cores, while the sf1 numerator is partly compute-bound and DOES:
    * the same query code measured at 8 cores posts a wall ratio up to
    * ~32/8 higher than at 32 cores (round-10: q322 1.50->19.16 s,
    * 12.8x, rc=1 with unchanged code). Scale the allowed growth by
    * baselineCpus/cpus so a low-core driver run doesn't fail the gate
    * on arithmetic rather than on a regression.
    */
  def effectiveMaxGrowth(maxGrowth: Double, cpus: Int, baselineCpus: Int = 32): Double =
    if (cpus >= baselineCpus || cpus <= 0) maxGrowth
    else maxGrowth * baselineCpus.toDouble / cpus

  /** One timed pass over `qs`: per-query wall seconds, with failures
    * recorded as -1.0 and returned by name. The q363 lesson: a silent
    * `catch { _ => -1L }` that still posted the elapsed time let a
    * crash masquerade as a 0.8 s query for half a round. A failure
    * must surface in the JSON and cost the exit code, never a timing.
    */
  def timedPass(spark: SparkSession, dir: String,
                qs: Seq[(String, (SparkSession, String) => DataFrame)])
      : Seq[(String, Double)] =
    qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(300))
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

  /** Fold N passes into (min-of-successes per query, queries that failed
    * at least one pass). A query failing ANY pass is reported failed —
    * same-JVM re-invocation crashes (the q363 class) only show up after
    * pass 1.
    */
  def foldPasses(passes: Seq[Seq[(String, Double)]])
      : (Seq[(String, Double)], Seq[String]) = {
    val names = passes.head.map(_._1)
    val byName = names.indices.map(i => names(i) -> passes.map(_(i)._2))
    val failed = byName.collect { case (n, ts) if ts.exists(_ < 0) => n }
    val ok = byName.collect { case (n, ts) if ts.forall(_ >= 0) => n -> ts.min }
    (ok, failed)
  }

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
    // Warmup pass (JIT + codegen-cache + parquet-footer warm) is timed
    // too: it's pessimistic for the min, so it can only help — a free
    // third sample against this host's multi-second steal/contention
    // waves, which two timed passes alone can straddle.
    def minOf3(dir: String, tag: String): (Seq[(String, Double)], Seq[String]) = {
      val passes = Seq(timedPass(spark, dir, queries), timedPass(spark, dir, queries),
        timedPass(spark, dir, queries))
      val (ok, failed) = foldPasses(passes)
      val byName = passes.map(_.toMap)
      queries.map(_._1).foreach { name =>
        val ts = byName.map(_(name))
        val dt = if (ts.exists(_ < 0)) -1.0 else ts.min
        System.err.println(
          f"[bench:$tag] $name%-24s $dt%8.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
      (ok, failed)
    }
    // ms precision keeps the one-line JSON short enough to survive the
    // driver's bounded stdout-tail capture (full-precision doubles for
    // 100+ queries overflowed it → BENCH parsed:null in r3/r4)
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val (results, failed) = minOf3(sfDir, sfDir.split('/').last)
    // Failed queries post NO timing and are excluded from the total —
    // they appear in "failed" and cost the exit code instead.
    val total = results.map(_._2).sum

    // Standing scale-growth gate: when benching the driver's sf0.1 dir,
    // also run the FK-consistent dup-heavy 10× replica (materialized
    // once, marker-gated) so sub-linear growth is re-proven every round
    // in BENCH itself, not by an ad-hoc probe. SPARK_GRAFT_SF1=0 skips.
    val (sf1Fields, sf1Scalars, sf1Violations, sf1Failed) =
      if (sfDir.endsWith("sf0.1") && sys.env.getOrElse("SPARK_GRAFT_SF1", "1") != "0") {
        val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/target/sf1")
        ScaleUp.scale(spark, sfDir, sf1Dir, 10)
        val (r1, f1) = minOf3(sf1Dir, "sf1")
        val t1 = r1.map(_._2).sum
        val growth = if (total > 0) t1 / total else -1.0
        // Core-aware: the gate's 8x was calibrated at 32 cores; a
        // low-core driver scaling run would otherwise rc=1 on compute-
        // bound queries with unchanged code (round-10 q322, 12.8x @ 8c).
        val maxGrowth = effectiveMaxGrowth(
          sys.env.getOrElse("SPARK_GRAFT_MAX_GROWTH", "8.0").toDouble,
          scala.util.Try(cpus.toInt).getOrElse(32))
        val bad = growthViolations(results, r1, maxGrowth)
        val scalars = s""","sf1_total":${fmt(t1)},"sf1_growth":${fmt(growth)}"""
        (s"""$scalars,"sf1_queries":${json(r1)}""", scalars, bad, f1)
      } else ("", "", Nil, Nil)
    val allFailed = (failed ++ sf1Failed).distinct
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
    val failField =
      if (allFailed.isEmpty) ""
      else s""","failed":[${allFailed.map(n => "\"" + n + "\"").mkString(",")}]"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${json(results)},"sf":"$sfDir"$sf1Fields$baseField$regField$failField}"""
    // The complete JSON lands in a file (committed per round), immune to
    // any stdout tail truncation by the calling harness.
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // All diagnostics go out BEFORE the compact stdout line: in rounds
    // 9/10 the driver's ~2000-char tail capture lost the JSON's head
    // because the regression/growth stderr report (plus sbt's trailing
    // [error]/[success] lines) was printed AFTER it. Order now:
    // stop Spark (its shutdown logs land first), emit stderr reports,
    // then print the compact JSON as the LAST stdout line.
    spark.stop()
    if (allFailed.nonEmpty)
      System.err.println("[bench] FAILED queries (no timing posted, excluded from total): " +
        allFailed.mkString(", "))
    if (regressions.nonEmpty)
      System.err.println(
        "[bench] cross-round regressions vs " + basePath.getOrElse("?") + " (>" +
        maxRegression + "x):\n  " + regressions.mkString("\n  "))
    if (sf1Violations.nonEmpty)
      System.err.println(
        "[bench] sf1 growth gate FAILED — superlinear non-codec queries:\n  " +
        sf1Violations.mkString("\n  "))
    // stdout gets ONE line guaranteed to fit the driver's ~2000-char
    // tail capture even with sbt's trailing [success]/[error] lines
    // (r9/r10 lost the head with a 1700-char cap): headline totals +
    // failures + the slowest queries, capped at 800 chars, with a
    // pointer to the full per-query file.
    val headlineCap = 800
    val slowest = results.sortBy(-_._2)
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size}$sf1Scalars$failField,"queries_full":"BENCH_LOCAL.json","queries":"""
    val entries = slowest.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val kept = new StringBuilder
    var n = 0
    while (n < entries.size && prefix.length + kept.length + entries(n).length + 2 < headlineCap) {
      if (n > 0) kept.append(',')
      kept.append(entries(n)); n += 1
    }
    println(prefix + "{" + kept + "}}")
    // Exit code: failures first (a crash must never look green), then
    // the structural growth gate, then the opt-in strict regression gate.
    if (allFailed.nonEmpty) sys.exit(3)
    if (sf1Violations.nonEmpty) sys.exit(1)
    if (regressions.nonEmpty &&
        sys.env.getOrElse("SPARK_GRAFT_REGRESSION_STRICT", "0") == "1") sys.exit(2)
  }
}
