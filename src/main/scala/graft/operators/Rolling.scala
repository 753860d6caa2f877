package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding time-range aggregation: per-key trailing-window count and
  * sum at EVENT granularity ("activity in the last N minutes as of
  * each event") — the rate-limit / rolling-engagement / feature-
  * engineering primitive, and the event-time counterpart of the
  * tumbling streaming window (q20), which only emits per-bucket rows.
  *
  * Spark design: ONE window with a RANGE frame over the epoch-micros
  * ordering column — one shuffle on the key, a per-key sort, then a
  * running frame scan. Deliberately NOT the band-join formulation: a
  * self-join within ±width replicates every row per candidate pair,
  * while a RANGE frame is linear in the input. Frame peers (equal
  * timestamps) are included symmetrically by SQL RANGE semantics, so
  * ties cannot make the result partitioning-dependent.
  *
  * Scale: window tasks are bounded per key. For a Zipf-hot key the q64
  * bucketed decomposition applies (coarse time bucket + boundary
  * carry-in, where the carry is the frame aggregate at the bucket
  * edge); at this corpus' per-user volumes the plain form is the right
  * plan. The sum runs over DECIMAL so frame-scan order can never
  * drift a double.
  */
object Rolling {

  /** Appends `n_win` (trailing count) and `sum_win` (trailing DECIMAL
    * sum of `valueCol`, cast to double) over the last `width` time
    * units (inclusive of the current row's instant) per `keyCol`.
    *
    * PLAIN vs BUCKETED selection rule: this form sorts each key in one
    * task — use it while no key is corpus-scaled. Probe a new source
    * once with `Behavior.hotKeyProbe(df, keyCol)`; if it reports
    * `use_bucketed`, switch to [[trailingBucketed]] (same output,
    * 2× row replication as the price of hot-key safety — don't pay it
    * by default).
    */
  def trailing(df: DataFrame, keyCol: String, timeCol: String,
               width: Long, valueCol: String): DataFrame = {
    require(width > 0, "width must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol))
      .rangeBetween(-width, 0)
    // decimal cast BEFORE the window: both aggregates then share one
    // Window node (an inline cast splits them into two frame scans)
    df.withColumn("_vd", col(valueCol).cast("decimal(18,4)"))
      .select(df.columns.map(col) :+
        count(lit(1)).over(w).as("n_win") :+
        sum(col("_vd")).over(w).cast("double").as("sum_win"): _*)
  }

  /** Hot-key decomposition shared by [[trailingBucketed]] /
    * [[anomaliesBucketed]]: every row appears once as itself and once
    * as a GHOST in the NEXT coarse time bucket (one map-side explode,
    * 2× rows). With `bucketWidth >= width`, every contributor to a
    * row's trailing [t−width, t] frame lives in the row's bucket or
    * the one before it, so a (key, bucket)-partitioned RANGE window
    * over natives+ghosts sees EXACTLY the plain per-key frame — and
    * each contributor exactly once (native copy serves same-bucket
    * targets, ghost copy next-bucket targets). Window tasks are
    * bounded by 2× a bucket's rows however hot the key.
    *
    * Why ghosts and not the asofJoinBucketed carry-in: an as-of carry
    * is ONE prefix value per bucket, but a trailing frame's lower edge
    * moves with every row — the boundary state is per-row, so the
    * previous bucket's rows themselves must be visible. 2× replication
    * is the standard price of the decomposition.
    */
  private def ghosted(df: DataFrame, timeCol: String, bucketWidth: Long): DataFrame = {
    val t = col(timeCol).cast("long")
    val b = ((t - pmod(t, lit(bucketWidth))) / bucketWidth).cast("long")
    df.withColumn("_gb", explode(array(
        struct(b.as("b"), lit(0).as("g")),
        struct((b + 1).as("b"), lit(1).as("g")))))
      .withColumn("_b", col("_gb.b")).withColumn("_ghost", col("_gb.g"))
      .drop("_gb")
  }

  /** [[trailing]] for Zipf-hot keys: identical output, window
    * partitioned by (key, coarse bucket) via [[ghosted]] so no task
    * ever sorts a hot key's full history. Property-tested equal to the
    * plain form; requires `bucketWidth >= width` (the two-bucket
    * coverage invariant).
    */
  def trailingBucketed(df: DataFrame, keyCol: String, timeCol: String,
                       width: Long, valueCol: String,
                       bucketWidth: Long): DataFrame = {
    require(width > 0, "width must be positive")
    require(bucketWidth >= width,
      s"bucketWidth ($bucketWidth) must be >= width ($width): a trailing frame " +
      "may span two buckets only if buckets are at least frame-wide")
    val g = ghosted(df.withColumn("_vd", col(valueCol).cast("decimal(18,4)")),
      timeCol, bucketWidth)
    val w = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(col(timeCol).cast("long")).rangeBetween(-width, 0)
    g.select(g.columns.map(col) :+
        count(lit(1)).over(w).as("n_win") :+
        sum(col("_vd")).over(w).cast("double").as("sum_win"): _*)
      .filter(col("_ghost") === 0)
      .select(df.columns.map(col) :+ col("n_win") :+ col("sum_win"): _*)
  }

  /** Per-key fixed-step resampling with as-of forward fill: a uniform
    * time grid (step `stepUs`, anchored at multiples of the step)
    * spanning each key's observed range, each grid instant carrying the
    * most recent observation at-or-before it — the irregular-events →
    * regular-series primitive (feature snapshots, charting, downstream
    * joins on aligned time).
    *
    * Scale shape: per-key bounds are ONE partial agg (two longs per
    * key survive the combine); the grid explodes MAP-SIDE from that
    * key-sized table (span/step rows per key, a caller-controlled
    * density, never event-scaled); the fill is [[AsofJoin.asofJoin]] —
    * the one-shuffle union+window machinery, no per-grid-point probe
    * join. Grid anchoring is pure integer arithmetic (`pmod`), exact
    * on epoch-micros longs in both engines — never a floor of a double
    * quotient, which can misround at exact step boundaries.
    *
    * Returns one row per (key, grid instant): left columns
    * (`keyCol`, `grid_ts`) plus `payload` columns from the most recent
    * event at-or-before the instant (never null here: the grid starts
    * at the first event, so a predecessor always exists — but the
    * machinery is left-outer like merge_asof).
    */
  def resample(events: DataFrame, keyCol: String, timeCol: String,
               stepUs: Long, payload: Seq[String]): DataFrame = {
    require(stepUs > 0, "stepUs must be positive")
    val step = lit(stepUs)
    val bounds = events.groupBy(keyCol)
      .agg(min(timeCol).as("_t0"), max(timeCol).as("_t1"))
      .select(col(keyCol),
        (col("_t0") + pmod(step - pmod(col("_t0"), step), step)).as("_g0"),
        (col("_t1") - pmod(col("_t1"), step)).as("_g1"))
    val grid = bounds.filter(col("_g0") <= col("_g1"))
      .select(col(keyCol), explode(sequence(col("_g0"), col("_g1"), step)).as("grid_ts"))
    AsofJoin.asofJoin(grid, events, keyCol, "grid_ts", timeCol, payload)
  }

  /** Time-weighted average (TWAP): per key, each observation weighted
    * by how long it REMAINED CURRENT (until the next observation) —
    * the correct mean for irregularly-sampled state (a price held for
    * an hour counts 60× a price held a minute; the row-mean is wrong
    * whenever sampling correlates with value). The last observation
    * has no successor and carries no weight (standard half-open
    * convention).
    *
    * One shuffle: a per-key `lead` window ordered by (time, `idCol`)
    * — the unique id breaks timestamp ties so peers order identically
    * in every engine/run — then a partial agg. Each value×duration
    * term quantizes to DECIMAL(27,6) before the sum (the q65 rule:
    * per-term quantization makes the aggregation order-insensitive);
    * durations sum as exact longs; the final division is one double
    * op mirrored by the oracle.
    */
  def twap(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
           idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    df.withColumn("_dur", lead(col(timeCol), 1).over(w) - col(timeCol))
      .filter(col("_dur").isNotNull)
      .withColumn("_term", (col(valueCol) * col("_dur")).cast("decimal(27,6)"))
      .groupBy(keyCol)
      .agg(sum("_term").as("_num"), sum("_dur").as("_den"),
           count(lit(1)).as("n_obs"))
      // round(…, 6): the decimal→double casts can differ by one ulp
      // between engines (two-step int128/scale conversion vs a
      // correctly-rounded BigDecimal), so the reported mean is
      // quantized like q67's scores rather than exposing the raw ulp
      .select(col(keyCol), col("n_obs"),
        round(col("_num").cast("double") / col("_den").cast("double"), 6).as("twap"))
  }

  /** Overlapping-interval merging (the "busy time" / coverage
    * reduction): per key, overlapping or touching intervals fuse into
    * islands; returns per key the island count and total covered
    * time — session coverage, machine utilization, dedup of
    * overlapping spans.
    *
    * The classic sweep as TWO window passes over one (key)-partitioned
    * sort (one shuffle, windows bounded per key): an interval starts a
    * new island iff its start exceeds the running max end of all
    * PRIOR intervals (rows-frame max, not just the previous row — an
    * engulfed interval must not re-open an island); the island id is
    * the running sum of those starts. Island extents then aggregate
    * with partial combines. All epoch-micros integer arithmetic —
    * exact in both engines.
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = df
      .withColumn("_pmax", max(col(endCol)).over(prior))
      .withColumn("_new",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L).otherwise(0L))
      .withColumn("_isl", sum(col("_new")).over(run))
    islands.groupBy(col(keyCol), col("_isl"))
      .agg(min(col(startCol)).as("_s"), max(col(endCol)).as("_e"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_islands"),
           sum(col("_e") - col("_s")).as("covered_us"))
  }

  /** Linear-decay weighted moving average: per key and row, the mean
    * of the trailing `k` observations weighted `k, k−1, …, 1` from
    * newest to oldest — the classic smoother that tracks level shifts
    * faster than a plain moving average without the infinite tail of
    * an EWMA (whose irrational decay powers also cannot be made
    * engine-exact; linear weights stay in integer arithmetic).
    *
    * The weight of frame row i depends on its DISTANCE from the
    * current row — naively not a window aggregate at all. The
    * decomposition: with per-key row numbers rn, weight = k−(rn−rnᵢ),
    * so Σwᵢvᵢ = (k−rn)·Σvᵢ + Σrnᵢvᵢ — two PLAIN frame sums (S1, S2)
    * over the same rows frame, combined per row afterwards. One
    * shuffle, one per-key sort shared by the row_number and both
    * frame sums; cost is linear in rows, never k× (the literal
    * k-lag-column form re-evaluates the frame per lag).
    *
    * Exactness: values quantize to integer micro-units map-side
    * (`floor(v·10⁶+0.5)` — IEEE-identical both engines), the frame
    * sums run as DECIMAL(38,0) over exact integers (rnᵢ·vqᵢ can pass
    * 2⁶³ on a 100 TB key history; decimal sums are also
    * order-insensitive), the weight denominator m·k−m(m−1)/2 is exact
    * long arithmetic on the frame count (short leading frames weight
    * correctly), and one final double division rounds at 1e-9.
    *
    * (timeCol, idCol) must total-order rows per key (the twap
    * contract) or frame membership itself is nondeterministic.
    */
  def wma(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
          idCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val f = w.rowsBetween(-(k - 1), 0)
    val vq = floor(col(valueCol) * 1000000L + 0.5).cast("long")
    val withRn = df
      .withColumn("_vq", vq)
      .withColumn("_rn", row_number().over(w))
    val sums = withRn
      .withColumn("_s1", sum(col("_vq").cast("decimal(38,0)")).over(f))
      .withColumn("_s2", sum((col("_vq").cast("decimal(38,0)")) * col("_rn")).over(f))
      .withColumn("_m", count(lit(1)).over(f))
    sums
      // `div`, not `/`: Spark's `/` is double division even on longs
      .withColumn("_wsum", col("_m") * k - expr("(_m * (_m - 1)) div 2"))
      .withColumn("wma",
        round(((lit(k) - col("_rn")) * col("_s1") + col("_s2")).cast("double") /
          col("_wsum").cast("double") / 1000000.0, 9))
      .drop("_vq", "_rn", "_s1", "_s2", "_m", "_wsum")
  }

  /** Dyadic-decay EWMA: per key and row, the exponentially weighted
    * mean of the trailing `w` observations with decay 1/2 — newest
    * weighs 2^(w−1), each older step halves. The [[wma]] Scaladoc
    * notes a general-α EWMA cannot be made engine-exact (irrational
    * decay powers); pinning α to 1/2 and truncating the tail at `w`
    * rows makes every weight an exact power of two and the whole
    * statistic integer arithmetic until one final division. The
    * truncation error is bounded by the dropped tail mass 2^−w
    * (≈1.5e-5 at the default w=16) — but that is a MODELING choice,
    * not error: the operator's contract IS the truncated kernel, and
    * the oracle computes the identical kernel.
    *
    * Shape: exponential weights admit no [[wma]]-style two-frame-sum
    * decomposition (2^rn overflows immediately), so the kernel is
    * unrolled as `w` lag terms over ONE shared window sort — same
    * shuffle/sort cost as a frame scan, O(w) work per row, each lag
    * term cast to DECIMAL(38,0) before scaling so arbitrarily large
    * micro-unit values cannot overflow mid-sum. Short leading frames
    * renormalize exactly: denominator 2^w − 2^(w−m) for m = min(rn,w)
    * observed rows, both engines computing it via IEEE-exact pow(2,k).
    *
    * (timeCol, idCol) must total-order rows per key (the twap
    * contract) or the lag sequence itself is nondeterministic.
    */
  def ewmaDyadic(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
                 idCol: String, w: Int = 16): DataFrame = {
    require(w >= 1 && w <= 62, s"w must be in [1, 62], got $w")
    val win = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val vq = floor(col(valueCol) * 1000000L + 0.5).cast("long")
    val terms = (0 until w).map { l =>
      val src = if (l == 0) col("_vq") else lag(col("_vq"), l).over(win)
      coalesce(src.cast("decimal(38,0)") * lit(1L << (w - 1 - l)), lit(0L).cast("decimal(38,0)"))
    }
    val num = terms.reduce(_ + _)
    df.withColumn("_vq", vq)
      .withColumn("_m", least(row_number().over(win), lit(w)))
      .withColumn("_num", num)
      .withColumn("ewma",
        round(col("_num").cast("double") /
          (lit((1L << w).toDouble) - pow(lit(2.0), lit(w) - col("_m"))) / 1000000.0, 9))
      .drop("_vq", "_m", "_num")
  }

  /** Trailing-window anomaly flags (SURVEY.md §2 #53l): per event,
    * is its value more than `k` standard deviations from the mean of
    * the key's OTHER observations in the trailing `widthUs` window? —
    * the streaming-telemetry outlier gate (spike detection, sensor
    * faults, fraud velocity) in its batch/backfill form. The current
    * row is excluded from its own baseline (an extreme value must not
    * mask itself); rows with fewer than `minObs` baseline points flag
    * NULL (no verdict), mirroring the oracle's CASE.
    *
    * Scale shape: ONE range-frame window (the q72 trailing shape —
    * shuffle on key, per-key sort, linear frame scan) computes count/
    * Σv/Σv² over [t−width, t]; the self-row subtracts out of each sum
    * afterwards, which keeps the frame bounds identical in both
    * engines (trailing-exclusive RANGE frames are where engine
    * dialects diverge).
    *
    * Exactness: the z-score gate NEVER compares floats — values
    * quantize to micro-units, sums run DECIMAL(38,0), and |v−μ|>k·σ
    * cross-multiplies to (n·vq−S)² > k²·(n·ΣvQ²−S²): pure decimal
    * integer arithmetic, engine-identical at every boundary. (Bounds:
    * |n·vq−S| ≤ 2·n·max|vq|, so the square stays inside 38 digits for
    * n·max|vq| < 10¹⁹ — a million-row window of 10¹²-quantized
    * values.)
    *
    * Plain vs bucketed: the [[trailing]] selection rule — probe once
    * with `Behavior.hotKeyProbe`; `use_bucketed` → [[anomaliesBucketed]].
    */
  def anomalies(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
                widthUs: Long, minObs: Long = 5L, k: Int = 3): DataFrame = {
    require(widthUs > 0 && minObs >= 2 && k >= 1,
      s"need widthUs>0, minObs>=2, k>=1; got $widthUs/$minObs/$k")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol))
      .rangeBetween(-widthUs, 0)
    anomalyMath(df.withColumn("_vq",
        floor(col(valueCol) * 1000000L + 0.5).cast("long")), w, minObs, k)
      .select(df.columns.map(col) :+ col("n_win") :+ col("is_anomaly"): _*)
  }

  /** [[anomalies]] for Zipf-hot keys: the [[trailingBucketed]] ghost
    * decomposition applied to the three anomaly sums — identical
    * flags, window tasks bounded by 2× a bucket's rows. Requires
    * `bucketWidth >= widthUs`.
    */
  def anomaliesBucketed(df: DataFrame, keyCol: String, timeCol: String,
                        valueCol: String, widthUs: Long, bucketWidth: Long,
                        minObs: Long = 5L, k: Int = 3): DataFrame = {
    require(widthUs > 0 && minObs >= 2 && k >= 1,
      s"need widthUs>0, minObs>=2, k>=1; got $widthUs/$minObs/$k")
    require(bucketWidth >= widthUs,
      s"bucketWidth ($bucketWidth) must be >= widthUs ($widthUs)")
    val g = ghosted(df.withColumn("_vq",
      floor(col(valueCol) * 1000000L + 0.5).cast("long")), timeCol, bucketWidth)
    val w = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(col(timeCol).cast("long")).rangeBetween(-widthUs, 0)
    anomalyMath(g, w, minObs, k)
      .filter(col("_ghost") === 0)
      .select(df.columns.map(col) :+ col("n_win") :+ col("is_anomaly"): _*)
  }

  /** The shared exact z-gate arithmetic over a trailing frame's
    * (count, Σvq, Σvq²) — see [[anomalies]] for the integer-exactness
    * argument. Expects `_vq` present; appends n_win / is_anomaly.
    */
  private def anomalyMath(withVq: DataFrame,
                          w: org.apache.spark.sql.expressions.WindowSpec,
                          minObs: Long, k: Int): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val withSums = withVq
      .select(withVq.columns.map(col) :+
        count(lit(1)).over(w).as("_cnt") :+
        sum(d38(col("_vq"))).over(w).as("_s") :+
        sum(d38(col("_vq")) * col("_vq")).over(w).as("_ss"): _*)
    val n = col("_cnt") - 1 // baseline excludes the current row
    val s = col("_s") - col("_vq")
    val ss = col("_ss") - d38(col("_vq")) * col("_vq")
    val dev = d38(n) * col("_vq") - s
    val vard = d38(n) * ss - s * s
    withSums
      .withColumn("n_win", n)
      .withColumn("is_anomaly",
        when(n >= minObs, dev * dev > lit(k.toLong * k) * vard))
  }

  /** Per-key lag-k autocorrelation (SURVEY.md §2 #53j): Pearson
    * correlation between a series and itself shifted by `lag` steps,
    * for each requested lag — the periodicity/burstiness signal behind
    * bot detection ("perfectly regular activity"), seasonality checks,
    * and feature screening for forecasting.
    *
    * Scale shape: ONE key-partitioned sort (the twap (time, id)
    * total-order contract) computes every lag's `lead` in the same
    * Window node; the per-lag (x, y) pairs then expand MAP-SIDE from
    * an inline struct array (rows × |lags|, no extra shuffle) and
    * reduce in one partial agg carrying the five Pearson sums. Nothing
    * is ever quadratic and no state outlives the agg combine.
    *
    * Exactness (the q96 corrMatrix pattern, grouped): values quantize
    * to integer micro-units via `floor(v·10⁶+0.5)` (IEEE-identical in
    * both engines), the five sums run as DECIMAL(38,0) over exact
    * longs (order-insensitive at any parallelism), and the Pearson
    * formula then runs in doubles cast from those exact sums in the
    * oracle's token order (q96's shape; sqrt and division are IEEE
    * correctly-rounded in both engines), rounded at 1e-9. Degenerate
    * groups (under 2 pairs, or zero variance on either side) emit NULL
    * acf, mirrored by the oracle's CASE.
    */
  def autocorr(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
               idCol: String, lags: Seq[Int] = Seq(1)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1, got $lags")
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val vq = floor(col(valueCol) * 1000000L + 0.5).cast("long")
    val withLeads = lags.foldLeft(df.withColumn("_x", vq)) { (d, k) =>
      d.withColumn(s"_y$k", lead(col("_x"), k).over(w))
    }
    val exploded = withLeads
      .select(col(keyCol), col("_x"), explode(
        array(lags.map(k => struct(lit(k).as("lag"), col(s"_y$k").as("y"))): _*))
        .as("_p"))
      .filter(col("_p.y").isNotNull)
      .select(col(keyCol), col("_p.lag").as("lag"),
        col("_x").cast("decimal(38,0)").as("x"),
        col("_p.y").cast("decimal(38,0)").as("y"))
    val sums = exploded.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
           sum("x").as("sx"), sum("y").as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("y") * col("y")).as("syy"),
           sum(col("x") * col("y")).as("sxy"))
    // the q96 corrMatrix op order exactly: every exact sum casts to
    // double FIRST, all arithmetic runs in doubles — deterministic on
    // identical inputs, token-mirrored by the oracle
    val n = col("n_pairs").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val cov = n * d("sxy") - d("sx") * d("sy")
    val vx = n * d("sxx") - d("sx") * d("sx")
    val vy = n * d("syy") - d("sy") * d("sy")
    sums.select(col(keyCol), col("lag"), col("n_pairs"),
      when(col("n_pairs") >= 2 && vx > 0 && vy > 0,
        round(cov / (sqrt(vx) * sqrt(vy)), 9)).as("acf"))
  }

  /** Per-key Ljung–Box portmanteau test (Ljung & Box, Biometrika'78):
    * is the series WHITE NOISE, or is there autocorrelation at ANY lag
    * up to m — the one-number companion to [[autocorr]]'s per-lag ACF
    * (which tests each lag in isolation). Q = n(n+2)·Σ_k ρ̂_k²/(n−k)
    * with ρ̂_k the standard ACF estimator
    * Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄)/Σ_t(x_t−x̄)² — under H₀ Q ~ χ²(m), so
    * a monitoring job thresholds Q once instead of m per-lag cutoffs.
    * The residual-diagnostics gate every forecasting pipeline runs.
    *
    * Scale shape: one key-partitioned sort computes every lag's `lag`
    * in the same Window node; per-lag cross products expand map-side
    * from an inline struct array and reduce in ONE partial agg
    * together with the global (n, Σx, Σx²) moments. Nothing quadratic,
    * no second shuffle.
    *
    * Exactness: values quantize to integer micro-units; every sum runs
    * as DECIMAL(38,0) over exact longs. ρ̂_k is assembled from the
    * n²-scaled exact integers (num_k·n² = n²·C_k − n·S·(A_k+B_k)
    * + (n−k)·S², den·n² = n²·SS − n·S²) so the ONLY doubles are the
    * final divisions and the fixed-order Q assembly the oracle
    * token-mirrors. Keys with n ≤ m+1 or zero variance emit NULL Q.
    */
  def ljungBox(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
               idCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val lags = 1 to maxLag
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col(idCol))
    val vq = floor(col(valueCol) * 1000000L + 0.5).cast("long")
    val withLags = lags.foldLeft(df.withColumn("_x", vq)) { (d, k) =>
      d.withColumn(s"_p$k", lag(col("_x"), k).over(w))
    }
    def dec38(c: Column): Column = c.cast("decimal(38,0)")
    val aggCols: Seq[Column] =
      sum(dec38(col("_x"))).as("s") +:
      sum(dec38(col("_x")) * dec38(col("_x"))).as("ss") +:
      lags.flatMap { k =>
        val p = col(s"_p$k")
        Seq(sum(when(p.isNotNull, dec38(col("_x")) * dec38(p))).as(s"c$k"),
            sum(when(p.isNotNull, dec38(col("_x")))).as(s"a$k"),
            sum(when(p.isNotNull, dec38(p))).as(s"b$k"))
      }
    val sums = withLags.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), aggCols: _*)
    val n2 = dec38(col("n")) * dec38(col("n"))
    val den = n2 * col("ss") - dec38(col("n")) * col("s") * col("s")
    val nd = col("n").cast("double")
    def rho(k: Int): Column =
      ((n2 * coalesce(col(s"c$k"), lit(0)) -
        dec38(col("n")) * col("s") * (coalesce(col(s"a$k"), lit(0)) + coalesce(col(s"b$k"), lit(0))) +
        (dec38(col("n")) - lit(k)) * col("s") * col("s")).cast("double")) /
        den.cast("double")
    // fixed-order Q assembly, token-mirrored by the oracle
    val q = lags.map(k => rho(k) * rho(k) / (nd - lit(k.toDouble)))
      .reduce(_ + _) * nd * (nd + lit(2.0))
    sums.select(col(keyCol), col("n"),
      when(col("n") > lit(maxLag + 1) && den.cast("double") > 0.0,
        round(q, 9)).as("lb_q"))
  }

  /** SCD2 history build (SURVEY.md §2 #65): compress a per-key change
    * log into validity periods — one row per RUN of consecutive equal
    * values with [valid_from, valid_to) bounds, valid_to NULL on the
    * open current row. The dimension-table shape every warehouse
    * keeps; also the state-timeline view of an event stream (which
    * plan/flag/status held when).
    *
    * Gaps-and-islands again ([[mergeIntervals]]'s kin) but keyed on
    * VALUE CHANGE, not overlap: new period iff the value differs from
    * `lag` (one key-partitioned sort both windows share); period id =
    * running sum of change flags; bounds aggregate with partial
    * combines, the close stitches via `lead` over the compressed
    * period rows (a second window, but over periods — corpus-row
    * volume never re-sorts).
    *
    * (timeCol, tieCols) must total-order rows per key (same contract
    * as twap's unique-id tiebreak — repeated raw timestamps otherwise
    * make run boundaries nondeterministic). `period_seq` (the run
    * index, 1-based) orders the history and is what the close-stitch
    * window sorts on — period start times CAN tie at a boundary,
    * period indices cannot.
    */
  def scd2(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
           tieCols: Seq[String] = Nil): DataFrame = {
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val periods = df
      .withColumn("_chg",
        when(lag(col(valueCol), 1).over(w).isNull ||
             lag(col(valueCol), 1).over(w) =!= col(valueCol), 1L).otherwise(0L))
      .withColumn("_per", sum(col("_chg")).over(run))
      .groupBy(col(keyCol), col("_per"))
      .agg(min(col(valueCol)).as("value"), // all equal within a run
           min(col(timeCol)).as("valid_from"),
           count(lit(1)).as("n_rows"))
    val wp = Window.partitionBy(keyCol).orderBy(col("_per"))
    periods.withColumn("valid_to", lead(col("valid_from"), 1).over(wp))
      .select(col(keyCol), col("value"), col("valid_from"), col("valid_to"),
        col("n_rows"), col("_per").as("period_seq"))
  }

  /** Two-sided CUSUM change-point scores (Page's test): per event, the
    * one-sided cumulative drift sums
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (vᵢ − target)) and the mirrored S⁻, plus a
    * crossing flag — THE sequential mean-shift detector (rolling
    * z-scores flag single spikes; CUSUM accumulates small sustained
    * shifts until they cross h). The recurrence looks iterative but
    * has a closed prefix form: S⁺ᵢ = cumᵢ − min_{j≤i} cumⱼ (and S⁻
    * mirrored with the running max), so the whole operator is ONE
    * key-partitioned (time, tieCols) sort carrying three running
    * window aggregates — no recursion, no UDAF, one exchange
    * (plan-asserted; recurrence ≡ prefix form property-tested).
    *
    * Everything is exact integer arithmetic: values and `target`
    * quantize to micro-units via floor(v·unitScale + 0.5) (IEEE-double
    * identical both engines), deviations/cusums are long sums, and the
    * `h` threshold compares in quantized units — no float boundary.
    */
  def cusum(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
            target: Double, h: Double, unitScale: Long = 1000000L,
            tieCols: Seq[String] = Nil): DataFrame = {
    require(h > 0, s"h must be positive, got $h")
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vq = floor(col(valueCol) * unitScale + 0.5).cast("long")
    val tq = math.floor(target * unitScale + 0.5).toLong
    val hq = math.floor(h * unitScale + 0.5).toLong
    df
      .withColumn("_dev", vq - lit(tq))
      .withColumn("_cum", sum(col("_dev")).over(w))
      // the prefix extremum must include the EMPTY prefix (cum₀ = 0):
      // S⁺ᵢ = cumᵢ − min(0, cum₁..cumᵢ), else a run that never dips
      // below zero reports S⁺ = 0 at its own start
      .withColumn("cusum_hi", col("_cum") - least(lit(0L), min(col("_cum")).over(w)))
      .withColumn("cusum_lo", greatest(lit(0L), max(col("_cum")).over(w)) - col("_cum"))
      .withColumn("is_shift", col("cusum_hi") > hq || col("cusum_lo") > hq)
      .drop("_dev", "_cum")
  }

  /** Page–Hinkley drift detection: [[cusum]]'s self-calibrating
    * sibling — CUSUM needs a KNOWN target mean; PH tests each point
    * against the series' own RUNNING mean, so it detects a mean shift
    * with no baseline parameter at all (the standard streaming-ML
    * drift monitor, e.g. river/MOA). devᵢ = xᵢ − μᵢ − δ with
    * μᵢ = mean(x₁..xᵢ); mᵢ = Σⱼ≤ᵢ devⱼ; drift when
    * mᵢ − min(0, m₁..mᵢ) > λ. Same one-exchange shape as cusum: one
    * key-partitioned sort carrying prefix aggregates — no recursion.
    *
    * Engine-exact arithmetic: values quantize to micro-unit longs;
    * μᵢ's division happens in a SINGLE double expression of exact
    * integers ((i·vqᵢ − cumᵢ)/(i·scale) − δ, identical shape both
    * engines), each deviation then RE-QUANTIZES to a long before the
    * prefix sum — so the accumulated PH statistic is an integer and
    * never drifts with summation order.
    */
  def pageHinkley(df: DataFrame, keyCol: String, timeCol: String,
                  valueCol: String, delta: Double, lambda: Double,
                  unitScale: Long = 1000000L,
                  tieCols: Seq[String] = Nil): DataFrame = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vq = floor(col(valueCol) * unitScale + 0.5).cast("long")
    val lamQ = math.floor(lambda * unitScale + 0.5).toLong
    df
      .withColumn("_vq", vq)
      .withColumn("_i", count(lit(1)).over(w))
      .withColumn("_cum", sum(col("_vq")).over(w))
      // dev = x − runningMean − δ, one double expression of exact ints
      .withColumn("_devq", floor(
        ((col("_i") * col("_vq") - col("_cum")).cast("double") /
          (col("_i").cast("double") * unitScale.toDouble) - lit(delta))
          * unitScale + 0.5).cast("long"))
      .withColumn("_m", sum(col("_devq")).over(w))
      .withColumn("ph", col("_m") - least(lit(0L), min(col("_m")).over(w)))
      .withColumn("is_drift", col("ph") > lamQ)
      .drop("_vq", "_i", "_cum", "_devq", "_m")
  }

  /** Seasonal-baseline residual anomalies: each event's deviation from
    * its (key, hour-of-day) mean — the detector for metrics with a
    * daily rhythm, where a raw threshold ([[anomalies]]' rolling z)
    * fires every peak hour and misses a quiet-hour spike. The flag is
    * |value − hourly mean| > threshold, evaluated EXACTLY: values
    * quantize to micro-unit longs, and the comparison cross-multiplies
    * (|n·v_q − Σ_q| > thr_q·n) so no division ever happens in the
    * decision — engine-exact at any count. The emitted baseline mean
    * is one double division of exact integers (correctly rounded,
    * identical both engines).
    *
    * Scale shape: the baseline is a (|keys|·24)-row partial agg that
    * BROADCASTS back — the event pass itself is map-only; no window,
    * no per-key sort, nothing keyed on time. Hour-of-day derives from
    * epoch micros by integer division (UTC).
    */
  def seasonalAnomaly(df: DataFrame, keyCol: String, timeCol: String,
                      valueCol: String, threshold: Double,
                      unitScale: Long = 1000000L): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val vq = floor(col(valueCol) * unitScale + 0.5).cast("long")
    val thrQ = math.floor(threshold * unitScale + 0.5).toLong
    // integer hour bucket — float division could round across an hour
    // boundary; `div` truncates, so times must be >= 0 (epoch micros)
    val hod = pmod(expr(s"$timeCol div 3600000000"), lit(24)).cast("int")
    val base = df.select(col(keyCol), hod.as("hod"), vq.as("_vq"))
      .groupBy(keyCol, "hod")
      .agg(sum("_vq").as("_sum"), count(lit(1)).as("_n"))
    df.withColumn("hod", hod).withColumn("_vq", vq)
      .join(broadcast(base), Seq(keyCol, "hod"))
      .select(col("*"),
        (col("_sum").cast("double") / col("_n")).as("base_mean"),
        (abs(col("_n") * col("_vq") - col("_sum")) > lit(thrQ) * col("_n"))
          .as("is_anomaly"))
      .drop("_vq", "_sum", "_n")
  }

  /** Classical additive seasonal decomposition of the hourly series:
    * y(h) = trend(h) + seasonal(hour-of-day) + residual(h) — the
    * series triage behind capacity planning and anomaly explanation
    * ("is the spike growth, rhythm, or noise?"), complementing
    * [[seasonalAnomaly]] (which flags against a static rhythm but
    * never separates trend from it).
    *
    *  - y: the hourly sum of `valueCol`, exactly (micro-unit longs);
    *  - trend: 24-hour centered moving average (rows −12..+11), NULL
    *    until the frame is full — the classical period-m MA;
    *  - seasonal: the mean DETRENDED deviation of the hour-of-day
    *    slot, over complete-trend rows only;
    *  - residual = y − trend − seasonal, NULL where trend is.
    *
    * Exactness: detrended deviations stay in exact ×24 integer units
    * (24·y_q − Σ24) with DECIMAL(38,0) slot sums; each output is ONE
    * double evaluation of exact integers in a mirrored op order,
    * rounded 1e-6.
    *
    * Scale shape: one partial agg corpus → hourly cells; every window
    * after that runs over the HOURLY SERIES — calendar-scaled
    * (a decade ≈ 9e4 rows), the documented metadata-scale exemption
    * for unpartitioned windows (§5) — and the 24-slot seasonal table
    * broadcasts back.
    */
  def seasonalDecompose(df: DataFrame, timeCol: String, valueCol: String,
                        unitScale: Long = 1000000L): DataFrame = {
    val hourly = df
      .groupBy(date_trunc("hour", col(timeCol)).as("hour_start"))
      .agg(sum(floor(col(valueCol).cast("double") * unitScale + 0.5).cast("long")).as("_yq"))
    val w24 = Window.partitionBy().orderBy(col("hour_start")).rowsBetween(-12, 11)
    val h = hourly
      .withColumn("_s24", sum(col("_yq")).over(w24))
      .withColumn("_c24", count(lit(1)).over(w24))
      .withColumn("_det", when(col("_c24") === 24, lit(24L) * col("_yq") - col("_s24")))
      .withColumn("_k", hour(col("hour_start")))
    val slots = h.filter(col("_det").isNotNull)
      .groupBy(col("_k"))
      .agg(sum(col("_det").cast("decimal(38,0)")).as("_sd"), count(lit(1)).as("_nk"))
    val us = lit(unitScale.toDouble)
    val y = col("_yq").cast("double") / us
    val trend = when(col("_c24") === 24, col("_s24").cast("double") / 24.0 / us)
    val seasonal = col("_sd").cast("double") / (lit(24.0) * col("_nk").cast("double")) / us
    h.join(broadcast(slots), Seq("_k"), "left")
      .select(col("hour_start"),
        round(y, 6).as("y"),
        round(trend, 6).as("trend"),
        round(seasonal, 6).as("seasonal"),
        round(y - trend - seasonal, 6).as("residual"))
  }

  /** Sequence-gap detection: per key, the missing integer ranges
    * between consecutive PRESENT values of `idCol` — the completeness
    * audit for anything that should be dense (event sequence numbers,
    * ingest batch ids, shard ordinals): each output row is one gap
    * `[gap_lo, gap_hi]` with its width.
    *
    * Scale shape (the globalIndex two-level decomposition, because a
    * per-key window over ALL ids serializes a hot key in one task):
    * ids dedupe to (key, id) in a partial agg, then split by exact
    * integer bucket `id div bucketWidth` (negative-safe
    * subtract-remainder floor) — WITHIN-bucket gaps come from a
    * (key, bucket)-partitioned lead window (each task sorts one
    * bucket's ids, never one key's), and CROSS-bucket gaps (including
    * runs of entirely-missing buckets) come from a lag window over the
    * per-(key, bucket) min/max summary — a table sized by occupied
    * buckets (histogram-scale), not ids. The two gap sets are disjoint
    * by construction (within never crosses a boundary, cross always
    * does) so the union is exact; property-tested equal to the plain
    * single-window form.
    */
  def gaps(df: DataFrame, keyCol: String, idCol: String,
           bucketWidth: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val idL = col(idCol).cast("long")
    val ids = df.select(col(keyCol), idL.as("_id"))
      .filter(col("_id").isNotNull).dropDuplicates()
      .withColumn("_b",
        ((col("_id") - pmod(col("_id"), lit(bucketWidth))) / bucketWidth).cast("long"))
    val wIn = Window.partitionBy(col(keyCol), col("_b")).orderBy(col("_id"))
    val within = ids
      .withColumn("_nxt", lead(col("_id"), 1).over(wIn))
      .filter(col("_nxt") - col("_id") > 1)
      .select(col(keyCol), (col("_id") + 1).as("gap_lo"), (col("_nxt") - 1).as("gap_hi"))
    val summary = ids.groupBy(col(keyCol), col("_b"))
      .agg(min(col("_id")).as("_bmin"), max(col("_id")).as("_bmax"))
    val wB = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
    val across = summary
      .withColumn("_pmax", lag(col("_bmax"), 1).over(wB))
      .filter(col("_pmax").isNotNull && col("_bmin") - col("_pmax") > 1)
      .select(col(keyCol), (col("_pmax") + 1).as("gap_lo"), (col("_bmin") - 1).as("gap_hi"))
    within.unionByName(across)
      .withColumn("gap_len", col("gap_hi") - col("gap_lo") + 1)
  }

  /** Forecast-accuracy scorecard per series: the naive lag-1 forecast
    * scored against the daily mean series with the four standard
    * errors — MAPE (relative, undefined at y=0 so zero-actual rows
    * are excluded and counted), sMAPE (bounded symmetric form), RMSE,
    * and MASE (MAE over the in-sample seasonal-naive MAE — Hyndman &
    * Koehler 2006's scale-free choice: < 1 beats "same day last
    * `season`"). This is the BASELINE every forecasting pipeline must
    * publish before any model: a model that can't beat these numbers
    * is noise, and the same scorecard re-scores any model's forecast
    * column by swapping the lag for it.
    *
    * Determinism: daily means are exact-integer divisions rounded
    * 1e-6 (the q269 rule); every error term is a double OF those
    * rounded means quantized DECIMAL(20,9) pre-sum (DECIMAL(25,12)
    * for squared terms); final divisions/√ run once in mirrored
    * order, rounded 1e-9. NULL metrics when a denominator is empty
    * (a series shorter than `season`+1 has no MASE).
    *
    * Scale shape: the corpus collapses to (series, day) cells in ONE
    * partial agg; the lag windows and the final fold run over the
    * daily series (calendar-scale, §5 exemption).
    */
  def forecastAccuracy(df: DataFrame, seriesCol: String, timeCol: String,
                       valueCol: String, season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val cells = df.select(col(seriesCol).as("_g"),
        (unix_micros(col(timeCol)) / lit(86400000000L)).cast("long").as("_day"),
        floor(col(valueCol).cast("double") * 1000000L + lit(0.5)).cast("long").as("_vq"))
      .groupBy("_g", "_day")
      .agg(round(sum(col("_vq").cast("decimal(38,0)")).cast("double")
        / count(lit(1)).cast("double") / 1e6, 6).as("_y"))
    val w = Window.partitionBy("_g").orderBy("_day")
    def dbl(c: Column) = c.cast("double")
    val scored = cells
      .withColumn("_f", lag(col("_y"), 1).over(w))
      .withColumn("_fs", lag(col("_y"), season).over(w))
      .withColumn("_e", abs(col("_y") - col("_f")))
    scored.groupBy(col("_g").as(seriesCol))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("_f").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("_f").isNotNull && col("_y") =!= 0.0, 1L).otherwise(0L)).as("_nm"),
        sum(when(col("_f").isNotNull, col("_e").cast("decimal(20,9)"))).as("_sae"),
        sum(when(col("_f").isNotNull && col("_y") =!= 0.0,
          (col("_e") / abs(col("_y"))).cast("decimal(20,9)"))).as("_sape"),
        sum(when(col("_f").isNotNull && (abs(col("_y")) + abs(col("_f"))) =!= 0.0,
          (lit(2.0) * col("_e") / (abs(col("_y")) + abs(col("_f"))))
            .cast("decimal(20,9)"))).as("_ssm"),
        sum(when(col("_f").isNotNull,
          (col("_e") * col("_e")).cast("decimal(25,12)"))).as("_sse"),
        sum(when(col("_fs").isNotNull,
          abs(col("_y") - col("_fs")).cast("decimal(20,9)"))).as("_ssn"),
        sum(when(col("_fs").isNotNull, 1L).otherwise(0L)).as("_nsn"))
      .select(col(seriesCol), col("n_days"), col("n_scored"),
        when(col("_nm") > 0, round(dbl(col("_sape")) / dbl(col("_nm")), 9)).as("mape"),
        when(col("n_scored") > 0, round(dbl(col("_ssm")) / dbl(col("n_scored")), 9)).as("smape"),
        when(col("n_scored") > 0,
          round(sqrt(dbl(col("_sse")) / dbl(col("n_scored"))), 9)).as("rmse"),
        when(col("_nsn") > 0 && dbl(col("_ssn")) > 0 && col("n_scored") > 0,
          round((dbl(col("_sae")) / dbl(col("n_scored")))
            / (dbl(col("_ssn")) / dbl(col("_nsn"))), 9)).as("mase"))
  }

  /** Schuster periodogram over a collapsed series — spectral power at
    * each candidate period P: I(P) = C(P)² + S(P)² with
    * C = Σ(xᵗ−x̄)·cos(2πt/P), S = Σ(xᵗ−x̄)·sin(2πt/P) — "does this
    * metric have a weekly rhythm, and which period dominates": the
    * frequency-domain companion to [[seasonalDecompose]] (which
    * needs the period as an INPUT; this finds it).
    *
    * Scale shape: one agg for the mean, then ONE partial-agg pass
    * computes every candidate period's C and S as conditional sums —
    * |periods| × 2 cells, no per-period job, no window. Engine
    * determinism: values quantize to micro-units and center on the
    * exact-integer mean expression; each cos/sin FACTOR and each
    * product term quantizes to DECIMAL(20,9) from the double (the
    * libm-boundary containment used everywhere transcendentals enter
    * a sum); C/S are exact decimal sums, the power one mirrored
    * double expression. Output: (period, power, rank) with rank 1 =
    * dominant period, ties → smaller period.
    */
  def periodogram(df: DataFrame, timeCol: String, valueCol: String,
                  periods: Seq[Int], unitScale: Long = 1000000L): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      s"periods must all be >= 2, got $periods")
    val base = df.select(col(timeCol).cast("long").as("_t"),
      floor(col(valueCol).cast("double") * unitScale + lit(0.5)).cast("long")
        .as("_vq"))
    val m = base.agg(count(lit(1)).as("_n"),
      sum(col("_vq").cast("decimal(38,0)")).as("_s")).head()
    val n = m.getLong(0)
    require(n >= 2, s"periodogram needs >= 2 points, got $n")
    val mean = m.getDecimal(1).doubleValue() / n.toDouble // quantized units
    def dbl(c: Column) = c.cast("double")
    val dev = (dbl(col("_vq")) - lit(mean)) / unitScale.toDouble
    def term(f: Column): Column = ((dev * f).cast("decimal(20,9)"))
    val aggs = periods.flatMap { pd =>
      val ang = lit(2.0 * math.Pi) * dbl(col("_t") % pd) / lit(pd.toDouble)
      Seq(
        sum(term(cos(ang).cast("decimal(20,9)").cast("double"))).as(s"_c$pd"),
        sum(term(sin(ang).cast("decimal(20,9)").cast("double"))).as(s"_s$pd"))
    }
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    def r9(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
    val powers = periods.zipWithIndex.map { case (pd, i) =>
      val c = row.getDecimal(2 * i).doubleValue()
      val sv = row.getDecimal(2 * i + 1).doubleValue()
      (pd, r9(c * c + sv * sv))
    }
    val ranked = powers.sortBy { case (pd, pw) => (-pw, pd) }.zipWithIndex
      .map { case ((pd, pw), r) => (pd, pw, r + 1) }
    df.sparkSession.createDataFrame(ranked).toDF("period", "power", "rank")
  }

  /** Wald's sequential probability ratio test (SPRT, Wald '45) per
    * key: H₀: p = p0 vs H₁: p = p1 over an ORDERED Bernoulli stream,
    * stopping at the FIRST boundary crossing — the early-stopping
    * discipline for A/B monitors and data-quality gates (peeking at
    * a fixed-n test inflates α; SPRT's boundaries ln((1−β)/α),
    * ln(β/(1−α)) are peek-proof by construction).
    *
    * One key-partitioned sort carries the cumulative success count;
    * the log-likelihood ratio is the INTEGER cumX·c1q + cum(1−X)·c0q
    * with the two per-observation increments quantized to 1e-9 once
    * (libm containment), so crossings compare integers. Emits per
    * key: the decision at the first crossing ('h1'/'h0', 'continue'
    * if the stream ends first), n and the scaled LLR at that point.
    */
  def sprtBernoulli(df: DataFrame, keyCol: String, timeCol: String,
                    outcomeCol: String, p0: Double, p1: Double,
                    alpha: Double = 0.05, beta: Double = 0.05,
                    tieCols: Seq[String] = Nil): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"need distinct p0, p1 in (0,1), got $p0/$p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"need alpha, beta in (0,1), got $alpha/$beta")
    val q = 1000000000L
    def lnq(x: Double): Long = math.floor(math.log(x) * q + 0.5).toLong
    val c1 = lnq(p1 / p0)               // per-success increment
    val c0 = lnq((1.0 - p1) / (1.0 - p0)) // per-failure increment
    val aUp = lnq((1.0 - beta) / alpha)   // accept H1 at llr >= aUp
    val bLo = lnq(beta / (1.0 - alpha))   // accept H0 at llr <= bLo
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = df
      .withColumn("_x", when(col(outcomeCol).cast("boolean"), 1L).otherwise(0L))
      .withColumn("_t", count(lit(1)).over(w))
      .withColumn("_cx", sum(col("_x")).over(w))
      .withColumn("_llr",
        col("_cx") * c1 + (col("_t") - col("_cx")) * c0)
      .withColumn("_hit", when(col("_llr") >= aUp, lit("h1"))
        .when(col("_llr") <= bLo, lit("h0")))
    def firstAt(cond: Column): Column = min(when(cond, col("_t")))
    scored.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_total"),
        firstAt(col("_hit").isNotNull).as("_nd"),
        min(when(col("_hit").isNotNull,
          struct(col("_t"), col("_hit"), col("_llr")))).as("_first"))
      .select(col("key"), col("n_total"),
        coalesce(col("_first._hit"), lit("continue")).as("decision"),
        col("_nd").as("n_at_decision"),
        round(col("_first._llr").cast("double") / 1e9, 9).as("llr_at_decision"))
  }
}
