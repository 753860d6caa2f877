package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: ordered funnels and
  * retention cohorts — the two queries every product-analytics engine
  * ships first, expressed as key-partitioned aggs and joins (never a
  * per-user sort or collect).
  */
object Behavior {

  /** Ordered funnel: for each step i, the users whose earliest step-i
    * event STRICTLY FOLLOWS their step-(i−1) entry time (the standard
    * ordered-funnel semantics — a purchase before the first view does
    * not convert). Returns one row per step: (step_idx, step,
    * n_users, conv) where conv = step count / previous step count.
    *
    * Scale shape: each step is one filtered partial-agg min plus one
    * user-keyed join against the previous step's (user, time) table —
    * user-hash-partitioned end to end, no window, no per-user event
    * sort; the per-step counts are single-row aggregates combined
    * with map-side-expanded literals (no action, no collect).
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", timeCol: String = "tus",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val stepTimes = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = events.filter(col(typeCol) === step)
        val scoped = prev match {
          case None => mine
          case Some(p) => mine.join(p, Seq(userCol)).filter(col(timeCol) > col("_t"))
        }
        Some(scoped.groupBy(userCol).agg(min(timeCol).as("_t")))
    }.flatten
    val counts = stepTimes.zipWithIndex.map { case (st, i) =>
      st.agg(count(lit(1)).as(s"_n$i"))
    }
    val row = counts.reduce(_ crossJoin _)
    val structs = steps.zipWithIndex.map { case (step, i) =>
      val conv = if (i == 0) lit(1.0)
                 else col(s"_n$i").cast("double") / col(s"_n${i - 1}")
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"_n$i").as("n_users"), conv.as("conv"))
    }
    row.select(explode(array(structs: _*)).as("p"))
      .select(col("p.step_idx").as("step_idx"), col("p.step").as("step"),
        col("p.n_users").as("n_users"), col("p.conv").as("conv"))
  }

  /** Time-bounded ordered funnel: step i converts only when its
    * earliest qualifying event falls WITHIN `withinUs` of the step
    * i−1 entry (the "purchase within 7 days of click" form every
    * product funnel actually ships — the unbounded [[funnel]]
    * overcounts conversions that took a quarter). Greedy
    * earliest-entry convention (the standard product-analytics
    * semantics, and the one that stays one partial agg per step):
    * each step's entry time is the MIN qualifying time; a user whose
    * later step-i occurrence would have opened a window their
    * earliest did not is NOT converted — path search is exponential
    * and is not what funnel dashboards compute.
    *
    * Scale shape identical to [[funnel]]: per step one filtered
    * partial-agg min + one user-keyed join against the previous
    * step's (user, time) table; the window bound is an extra
    * pushed-down join-filter conjunct, nothing new shuffles.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String], withinUs: Long,
                     userCol: String = "user_id", timeCol: String = "tus",
                     typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, "funnelWindowed needs at least two steps")
    require(withinUs > 0, s"withinUs must be positive, got $withinUs")
    val stepTimes = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = events.filter(col(typeCol) === step)
        val scoped = prev match {
          case None => mine
          case Some(p) => mine.join(p, Seq(userCol))
            .filter(col(timeCol) > col("_t") && col(timeCol) <= col("_t") + lit(withinUs))
        }
        Some(scoped.groupBy(userCol).agg(min(timeCol).as("_t")))
    }.flatten
    val counts = stepTimes.zipWithIndex.map { case (st, i) =>
      st.agg(count(lit(1)).as(s"_n$i"))
    }
    val row = counts.reduce(_ crossJoin _)
    val structs = steps.zipWithIndex.map { case (step, i) =>
      val conv = if (i == 0) lit(1.0)
                 else col(s"_n$i").cast("double") / col(s"_n${i - 1}")
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"_n$i").as("n_users"), conv.as("conv"))
    }
    row.select(explode(array(structs: _*)).as("p"))
      .select(col("p.step_idx").as("step_idx"), col("p.step").as("step"),
        col("p.n_users").as("n_users"), col("p.conv").as("conv"))
  }

  /** Market-basket association mining over per-key item sets: for
    * every item pair, support (co-occurrence fraction), confidence
    * (P(b|a)), and lift (observed/expected co-occurrence — the
    * signal that survives popularity imbalance). Here "basket" = the
    * set of event types a user has ever fired; the same operator
    * mines any (key, item) table.
    *
    * Scale shape: (key, item) DEDUPES first (multiplicity never
    * inflates counts or the shuffle); item counts are one partial
    * agg; pair counts come from the key-keyed self-join of the
    * deduped table (fan-out per key = |itemset|², bounded by the
    * item vocabulary, never event volume). Ratios are exact-count
    * double divisions in the oracle's op order, rounded at 1e-9
    * (engine-identical inputs, one guard against the final ulp).
    */
  def basketLift(df: DataFrame, keyCol: String, itemCol: String): DataFrame = {
    val d = df.select(col(keyCol).as("k"), col(itemCol).as("item")).distinct()
    val nKeys = d.select("k").distinct().count()
    val ic = d.groupBy("item").agg(count(lit(1)).as("ic"))
    val pairs = d.select(col("k"), col("item").as("item_a"))
      .join(d.select(col("k"), col("item").as("item_b")), Seq("k"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_both"))
    val n = lit(nKeys.toDouble)
    pairs
      .join(ic.select(col("item").as("item_a"), col("ic").as("ca")), Seq("item_a"))
      .join(ic.select(col("item").as("item_b"), col("ic").as("cb")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_both"),
        round(col("n_both") / n, 9).as("support"),
        round(col("n_both").cast("double") / col("ca"), 9).as("confidence"),
        round(col("n_both") * n / (col("ca") * col("cb")), 9).as("lift"))
  }

  /** Kaplan–Meier product-limit survival curve per cohort (Kaplan &
    * Meier 1958): from (duration, event) observations — event = 1 the
    * terminal event happened at `duration`, 0 censored there — the
    * stepwise estimate Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ), the standard
    * time-to-conversion / churn / retention-with-censoring curve
    * (plain retention #53d silently treats censored users as churned;
    * KM doesn't).
    *
    * Output rows at DEATH times only (the convention: Ŝ steps only
    * where dᵢ > 0): (group, t, n_risk, d_events, log_surv) with
    * log_surv = ln Ŝ(t). The LOG survival is the exact deliverable —
    * each step's ln((nᵢ−dᵢ)/nᵢ) is one IEEE double of exact integer
    * operands quantized to DECIMAL(20,9) pre-sum (the entropy rule),
    * so the cumulative sum is order-free and engine-exact; the house
    * avoids a final exp() (no cross-engine transcendental precedent —
    * callers exp() for display). A time where everyone at risk dies
    * (nᵢ = dᵢ, Ŝ hits exactly 0) emits NULL log_surv — documented, not
    * -inf.
    *
    * Scale shape: observations collapse to (group, t) cells in ONE
    * partial agg; risk sets and the cumulative log walk are two
    * windows over DISTINCT TIMES per group (the histogram state
    * argument — never rows).
    */
  def survivalCurve(df: DataFrame, groupCol: String, durationCol: String,
                    eventCol: String): DataFrame = {
    val cells = df.select(col(groupCol).as("_g"),
        col(durationCol).cast("long").as("_t"),
        col(eventCol).cast("int").as("_e"))
      .groupBy("_g", "_t")
      .agg(sum(col("_e").cast("long")).as("_d"), count(lit(1)).as("_c"))
    val wPrev = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("_g")
    val wCum = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = cells
      .withColumn("_nrisk",
        sum(col("_c")).over(wAll) - coalesce(sum(col("_c")).over(wPrev), lit(0L)))
      .withColumn("_term", when(col("_d") > 0 && col("_d") < col("_nrisk"),
        log((col("_nrisk") - col("_d")).cast("double") / col("_nrisk").cast("double"))
          .cast("decimal(20,9)")))
      // a total-death time poisons every later step to S = 0: carry a
      // cumulative flag instead of summing a -inf term
      .withColumn("_dead", sum(when(col("_d") === col("_nrisk") && col("_d") > 0, 1L)
        .otherwise(0L)).over(wCum))
      .withColumn("_logS", sum(col("_term")).over(wCum))
    risked.filter(col("_d") > 0)
      .select(col("_g").as(groupCol), col("_t").as("t"),
        col("_nrisk").as("n_risk"), col("_d").as("d_events"),
        when(col("_dead") === 0, round(col("_logS").cast("double"), 6)).as("log_surv"))
  }

  /** Nelson–Aalen cumulative hazard — the estimator DUAL to
    * [[survivalCurve]]'s Kaplan–Meier: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with the
    * Poisson variance Σ dᵢ/nᵢ² (Aalen '78). Prefer it over −log(KM)
    * when event counts per time are small (it's the unbiased-increment
    * form) and when the RATE ITSELF is the question — hazard ratios
    * between cohorts read directly off H(t) slopes, and
    * H is additive over disjoint exposure periods where S multiplies.
    *
    * Same shape and exactness contract as survivalCurve: one partial
    * agg to (cohort, time) cells, risk sets from the two bounded
    * per-cohort windows over DISTINCT times, per-step dᵢ/nᵢ terms are
    * doubles of exact counts quantized DECIMAL(20,9) pre-cumsum
    * (mirrored), outputs rounded 1e-6/1e-9.
    */
  def hazardCurve(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val cells = df.select(col(groupCol).as("_g"),
        col(durationCol).cast("long").as("_t"),
        col(eventCol).cast("int").as("_e"))
      .groupBy("_g", "_t")
      .agg(sum(col("_e").cast("long")).as("_d"), count(lit(1)).as("_c"))
    val wPrev = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("_g")
    val wCum = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: String) = col(c).cast("double")
    cells
      .withColumn("_nrisk",
        sum(col("_c")).over(wAll) - coalesce(sum(col("_c")).over(wPrev), lit(0L)))
      .withColumn("_term", when(col("_d") > 0,
        (d("_d") / d("_nrisk")).cast("decimal(20,9)")))
      .withColumn("_vterm", when(col("_d") > 0,
        (d("_d") / (d("_nrisk") * d("_nrisk"))).cast("decimal(20,9)")))
      .withColumn("_H", sum(col("_term")).over(wCum))
      .withColumn("_V", sum(col("_vterm")).over(wCum))
      .filter(col("_d") > 0)
      .select(col("_g").as(groupCol), col("_t").as("t"),
        col("_nrisk").as("n_risk"), col("_d").as("d_events"),
        round(col("_H").cast("double"), 6).as("cum_hazard"),
        round(col("_V").cast("double"), 9).as("hazard_var"))
  }

  /** Frequent 3-itemsets by direct map-side enumeration — the triple
    * extension of [[basketLift]]'s pairs: each basket's sorted
    * distinct-item array emits its C(w,3) combinations IN THE MAP
    * STAGE (one HOF, no self-join), one partial agg counts supports,
    * the floor filters. Sound because basket width w is small and
    * BOUNDED (retail baskets, per-session event types, tags): the
    * cubic fan-out is C(w,3) per basket, and `maxBasket` REFUSES
    * loudly rather than letting one mega-basket emit millions of
    * rows — the same loud-refusal contract as Theil–Sen/linkage
    * (SURVEY §5). An unbounded-width corpus needs staged Apriori
    * (pairs → join) instead; this is the direct path for the common
    * bounded case, with ZERO corpus self-joins.
    *
    * Scale shape: one (basket, item) distinct shuffle, one basket
    * collect, map-side combination explode, one (a,b,c) partial agg
    * — Zipf-hot triples collapse before the exchange. Support share
    * uses the broadcast basket total (exact-count mirrored division,
    * 1e-9). Output: (item_a, item_b, item_c, n_baskets, support).
    */
  def frequentTriples(df: DataFrame, keyCol: String, itemCol: String,
                      minCount: Long = 2L, maxBasket: Int = 64): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val collected = df.select(col(keyCol).as("_k"), col(itemCol).as("_i")).distinct()
      .groupBy("_k").agg(sort_array(collect_set(col("_i"))).as("_it0"))
    val itType = collected.schema("_it0").dataType
    val baskets = collected
      .withColumn("it", when(size(col("_it0")) > maxBasket,
        raise_error(format_string(
          s"frequentTriples: basket %s has %s items (> maxBasket=$maxBasket) — " +
            "C(w,3) fan-out unbounded; raise maxBasket deliberately or pre-filter",
          col("_k").cast("string"), size(col("_it0")).cast("string"))).cast(itType))
        .otherwise(col("_it0")))
    val tot = baskets.agg(count(lit(1)).as("_nb"))
    val triples = baskets.select(explode(flatten(transform(col("it"), (x, i) =>
        flatten(transform(slice(col("it"), i + 2, size(col("it"))), (y, j) =>
          transform(slice(col("it"), i + j + 3, size(col("it"))),
            z => struct(x.as("a"), y.as("b"), z.as("c")))))))).as("t"))
    triples
      .groupBy(col("t.a").as("item_a"), col("t.b").as("item_b"), col("t.c").as("item_c"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minCount)
      .crossJoin(broadcast(tot))
      .withColumn("support",
        round(col("n_baskets").cast("double") / col("_nb").cast("double"), 9))
      .drop("_nb")
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * for every ordered (from_type → to_type) step a key takes, the
    * count and the row-normalized transition probability — the
    * next-action model behind journey analysis, anomaly flags
    * ("this sequence is improbable"), and session simulators.
    *
    * Scale shape: ONE key-partitioned `lead` window ordered by
    * (timeCol, tieCols — the twap/scd2 total-order contract, so
    * repeated timestamps cannot make successor choice
    * nondeterministic), then a (from, to) partial agg. The
    * denominator join is against the |types|-sized out-degree table —
    * broadcast-small by nature (it is the label vocabulary, not the
    * corpus). Probability is an exact-count double division rounded
    * at 1e-9 (engine-identical inputs, one guard against the final
    * ulp).
    *
    * BOUNDED-PER-KEY CONTRACT: the window sorts each key's rows in one
    * task — correct and fast while no single key is corpus-scaled.
    * Probe with [[hotKeyProbe]] before pointing this at a new source;
    * a hot key (bot/NULL/default) wants quarantining or the bucketed
    * decomposition first.
    */
  /** One-pass hot-key probe — the SELECTION GUIDE for the per-key
    * sequence-window family ([[transitions]], [[sessionizeBatch]],
    * [[topPaths]], and Rolling's trailing/anomalies vs their bucketed
    * forms). Those operators sort each key's rows inside one task:
    * the right plan while per-key row counts are human-scaled (events
    * per user — thousands, not billions), and the wrong one the
    * moment a single key is corpus-scaled (a bot user, a NULL key, an
    * instrumentation default). The probe is one map-side-combining
    * partial agg plus a single-row rollup — max rows on any key, its
    * corpus share, and the verdict against `bucketThreshold`:
    * `use_bucketed = false` → the plain per-key form is safe;
    * `true` → switch to the bucketed decomposition (the q252
    * trailingBucketed pattern) or quarantine the offending keys
    * first. Costs one scan of (key) only — run once per SOURCE, not
    * per query; the threshold default is the row count whose one-task
    * sort (~100 MB of timestamps) starts to dominate a stage.
    */
  def hotKeyProbe(df: DataFrame, keyCol: String,
                  bucketThreshold: Long = 1000000L): DataFrame = {
    require(bucketThreshold > 0, s"bucketThreshold must be positive, got $bucketThreshold")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
      .agg(sum("_n").as("n_rows"), count(lit(1)).as("n_keys"),
           max("_n").as("max_key_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        round(col("max_key_rows").cast("double") / col("n_rows").cast("double"), 9)
          .as("hot_share"),
        (col("max_key_rows") > bucketThreshold).as("use_bucketed"))
  }

  def transitions(events: DataFrame, keyCol: String = "user_id",
                  timeCol: String = "tus", typeCol: String = "event_type",
                  tieCols: Seq[String] = Nil): DataFrame = {
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val steps = events
      .withColumn("_to", lead(col(typeCol), 1).over(w))
      .filter(col("_to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTot = steps.groupBy("from_type").agg(sum("n").as("_tot"))
    steps.join(outTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_tot").cast("double"), 9).as("p"))
  }

  /** Batch sessionization (gaps-and-islands on inactivity): per key,
    * consecutive events closer than `gapUs` belong to one session; a
    * gap strictly larger starts a new one. The BATCH twin of the
    * streaming GroupState sessionizer (q21) — same semantics, but as a
    * reprocessable one-shot over history (backfills, research cuts,
    * re-sessionizing with a different gap), with no state store at all.
    *
    * Scale shape: `lag` and the running sum share ONE key-partitioned
    * (time, tieCols) sort — one exchange, one sort (the scd2 shape,
    * keyed on time GAP instead of value change); session extents then
    * aggregate with partial combines. (timeCol, tieCols) must
    * total-order rows per key or boundary membership is
    * nondeterministic at repeated timestamps (the twap contract).
    * Bounded-per-key contract: each key sorts in one task — probe new
    * sources with [[hotKeyProbe]] (the [[transitions]] rule).
    * Output: one row per session — key, session_seq (1-based per key,
    * in time order), start/end micros, n_events, duration_us.
    */
  def sessionizeBatch(events: DataFrame, keyCol: String = "user_id",
                      timeCol: String = "tus", gapUs: Long = 1800000000L,
                      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(timeCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(timeCol) - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(run))
      .groupBy(col(keyCol), col("_sid").as("session_seq"))
      .agg(min(col(timeCol)).as("start_us"), max(col(timeCol)).as("end_us"),
           count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** [[sessionizeBatch]] for Zipf-hot keys — the q64 bucket-with-carry
    * decomposition applied to gaps-and-islands: identical output, but
    * no task ever sorts a hot key's full history. Run
    * [[hotKeyProbe]] first; switch here when it says `use_bucketed`.
    *
    * Two observations make sessions decomposable at ANY bucketWidth
    * (no `bucketWidth >= gap` constraint — unlike trailing windows,
    * the boundary decision needs only the previous EVENT's time):
    *  1. the new-session flag needs one value across a bucket edge —
    *     the previous bucket's LAST timestamp (an as-of style carry:
    *     one prefix value per (key, bucket), computed by a partial agg
    *     + a per-key lag over the BUCKET-level table, which is
    *     calendar/bucketWidth-bounded rows per key, never event-scale);
    *  2. the session id is a running COUNT OF STARTS, which splits into
    *     (starts in earlier buckets: a bucket-level exclusive cumsum)
    *     + (starts in this bucket up to the row: a (key, bucket)-local
    *     window). Sessions SPANNING buckets then glue for free in the
    *     final (key, session_seq) partial agg — their rows carry the
    *     same seq by construction.
    *
    * Scale shape: both row-level windows share ONE (key, bucket)
    * sort; the two bucket-level tables are partial aggs + per-key
    * bucket windows (bounded rows); the session rollup is map-side
    * combinable. No ghost replication (trailing's 2× price) — the
    * carry is one value per bucket.
    */
  def sessionizeBatchBucketed(events: DataFrame, keyCol: String = "user_id",
                              timeCol: String = "tus", gapUs: Long = 1800000000L,
                              bucketWidth: Long = 3600000000L,
                              tieCols: Seq[String] = Nil): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val t = col(timeCol).cast("long")
    val ev = events.withColumn("_bkt",
      ((t - pmod(t, lit(bucketWidth))) / bucketWidth).cast("long"))
    val ord = col(timeCol) +: tieCols.map(col)
    val wLoc = Window.partitionBy(col(keyCol), col("_bkt")).orderBy(ord: _*)
    val wLocRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLocAll = Window.partitionBy(col(keyCol), col("_bkt"))
    val wBkt = Window.partitionBy(col(keyCol)).orderBy(col("_bkt"))

    // carry #1: previous non-empty bucket's last event time per (key, bucket)
    val lastTs = ev.groupBy(col(keyCol), col("_bkt"))
      .agg(max(col(timeCol)).as("_last"))
      .withColumn("_carry_ts", lag(col("_last"), 1).over(wBkt))
      .select(col(keyCol), col("_bkt"), col("_carry_ts"))
    val flagged = ev.join(lastTs, Seq(keyCol, "_bkt"))
      .withColumn("_prev", coalesce(lag(col(timeCol), 1).over(wLoc), col("_carry_ts")))
      .withColumn("_new",
        when(col("_prev").isNull || col(timeCol) - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("_ls", sum(col("_new")).over(wLocRun))     // starts ≤ row, this bucket
      .withColumn("_btot", sum(col("_new")).over(wLocAll))   // starts in this bucket

    // carry #2: starts in all EARLIER buckets per (key, bucket)
    val carryStarts = flagged.groupBy(col(keyCol), col("_bkt"))
      .agg(max(col("_btot")).as("_bt"))
      .withColumn("_carry_n", coalesce(
        sum(col("_bt")).over(wBkt.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("_bkt"), col("_carry_n"))

    flagged.join(carryStarts, Seq(keyCol, "_bkt"))
      .withColumn("_sid", col("_carry_n") + col("_ls"))
      .groupBy(col(keyCol), col("_sid").as("session_seq"))
      .agg(min(col(timeCol)).as("start_us"), max(col(timeCol)).as("end_us"),
           count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Last-touch marketing attribution: each conversion credited to the
    * most recent touch at-or-before it within `lookbackUs`, then
    * rolled up per channel — conversions with no touch in the window
    * report as channel NULL (the "direct / unattributed" row every
    * attribution report carries).
    *
    * Pure composition: the credit assignment IS an as-of join with a
    * tolerance ([[AsofJoin.asofJoin]] — one shuffle, no pair blowup on
    * users with many touches), and the rollup is one partial agg.
    * Conversion values sum as DECIMAL (order-insensitive), cast to
    * double once at the end.
    *
    * `conversions` needs (keyCol, timeCol, valueCol); `touches` needs
    * (keyCol, timeCol, channelCol). Times must be numeric epoch micros.
    */
  /** Top-k most frequent within-session event-type paths of length
    * `n` — the journey-mining report ("view>click>purchase happens
    * 12k times") that [[transitions]]' pairwise matrix can't give for
    * longer motifs. Sessions are the same inactivity-gap
    * gaps-and-islands as [[sessionizeBatch]].
    *
    * Scale shape: session assignment AND the n−1 lookaheads all ride
    * ONE key-partitioned (time, tieCols) sort — the leads stay
    * partitioned by key (not by (key, session), which would need a
    * second sort) and cross-session windows are discarded by
    * comparing the lead of the session index (a lead over the SAME
    * window spec — no extra exchange). Path counts are one partial
    * agg on the path string; global top-k is a WindowGroupLimit-pushed
    * row_number with (count desc, path) ties. Bounded-per-key
    * contract: each key sorts in one task — probe new sources with
    * [[hotKeyProbe]] (the [[transitions]] rule).
    */
  def topPaths(events: DataFrame, keyCol: String = "user_id",
               timeCol: String = "tus", typeCol: String = "event_type",
               gapUs: Long = 1800000000L, n: Int = 3, topK: Int = 20,
               tieCols: Seq[String] = Nil): DataFrame = {
    require(n >= 2 && topK > 0, s"need n >= 2 and topK > 0, got n=$n topK=$topK")
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSid = events
      .withColumn("_prev", lag(col(timeCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(timeCol) - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("_sid", sum(col("_new")).over(run))
    val steps = (1 until n).flatMap(i => Seq(
      lead(col(typeCol), i).over(w).as(s"_t$i"),
      lead(col("_sid"), i).over(w).as(s"_s$i")))
    val sameSession = (1 until n).map(i => col(s"_s$i") === col("_sid")).reduce(_ && _)
    val path = concat_ws(">", col(typeCol) +: (1 until n).map(i => col(s"_t$i")): _*)
    withSid
      .select((col(typeCol) +: col("_sid") +: steps): _*)
      .filter((1 until n).map(i => col(s"_t$i").isNotNull).reduce(_ && _) && sameSession)
      .groupBy(path.as("path"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c").desc, col("path"))).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** Per-key inter-arrival time statistics: count, min, max, and exact
    * median of the gaps between consecutive events — the cadence
    * report behind bot detection (suspiciously regular gaps), sensor
    * health (gaps stretching), and capacity planning, and the
    * distribution [[graft.operators.Rolling.resample]]'s grid step
    * should be sized from.
    *
    * One key-partitioned (time, tieCols) sort computes every gap via
    * `lead` (the twap total-order contract — ties order identically in
    * every engine/run), then one partial agg per key; the exact
    * `percentile` median keeps value-map state (distinct gap values,
    * never row-scaled). Gaps are pure integer micros; only the median
    * interpolation is a double, emitted through the q71
    * DECIMAL(18,4)-quantize so a last-bit difference can't flip the
    * hash.
    */
  def interArrival(events: DataFrame, keyCol: String = "user_id",
                   timeCol: String = "tus",
                   tieCols: Seq[String] = Nil): DataFrame = {
    val ord = col(timeCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
    events
      .withColumn("_gap", lead(col(timeCol), 1).over(w) - col(timeCol))
      .filter(col("_gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
           min(col("_gap")).as("min_gap"),
           max(col("_gap")).as("max_gap"),
           percentile(col("_gap"), lit(0.5))
             .cast("decimal(18,4)").cast("double").as("median_gap"))
  }

  def lastTouchAttribution(conversions: DataFrame, touches: DataFrame,
                           keyCol: String, timeCol: String,
                           channelCol: String, valueCol: String,
                           lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    val credited = AsofJoin.asofJoin(
      conversions.select(col(keyCol), col(timeCol), col(valueCol)),
      touches.select(col(keyCol), col(timeCol).as("_touch_t"), col(channelCol)),
      keyCol, timeCol, "_touch_t", Seq(channelCol),
      tolerance = Some(lit(lookbackUs)))
    credited.groupBy(col(channelCol).as("channel"))
      .agg(count(lit(1)).as("n_conv"),
           sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("total_value"))
  }

  /** Time-decay multi-touch attribution: every touchpoint in the
    * lookback window shares a conversion's value, weighted by 2^(−b)
    * for b = elapsed half-lives — the industry-standard decay model
    * completing [[lastTouchAttribution]] (which gives 100% to one
    * touch). Decay pinned DYADIC (the ewmaDyadic rule): each weight is
    * an exact power of two from an integer bucket count, the
    * per-conversion weight total is an exact integer sum, and the only
    * floats are one multiply and one divide per touch in
    * oracle-mirrored order — then per-touch credits quantize to
    * DECIMAL(18,6) BEFORE the per-channel sum (order-insensitive at
    * any parallelism, the q71 rule).
    *
    * Scale shape: conversions first collapse to (key, time) grain
    * (one partial agg — the conversion identity the weight
    * normalization groups by, so duplicate-timestamp purchases merge
    * rather than double-credit); the conversion×touch pairing is
    * [[RangeJoin.bandJoin]]'s gap-bucket equi-join (shuffle keyed
    * (key, time-cell), hot users spread by time — never a per-key
    * quadratic blowup past the window); Σw per conversion is a window
    * over the SAME key partitioning.
    *
    * `lookbackUs` must be a multiple of `halflifeUs`, with at most 32
    * half-lives (weights 2^32 stay exact longs and a touch older than
    * 32 half-lives credits < 1e-9 of the value — cut it off, don't
    * carry it).
    */
  def timeDecayAttribution(conversions: DataFrame, touches: DataFrame,
                           keyCol: String, timeCol: String,
                           channelCol: String, valueCol: String,
                           lookbackUs: Long, halflifeUs: Long): DataFrame = {
    require(halflifeUs > 0 && lookbackUs > 0 && lookbackUs % halflifeUs == 0,
      s"lookbackUs must be a positive multiple of halflifeUs; got $lookbackUs/$halflifeUs")
    val h = (lookbackUs / halflifeUs).toInt
    require(h >= 1 && h <= 32, s"at most 32 half-lives in the lookback, got $h")
    val conv = conversions.groupBy(col(keyCol), col(timeCol).as("_ct"))
      .agg(sum(col(valueCol)).as("_cv"))
    val tch = touches.select(col(keyCol), col(timeCol).as("_tt"), col(channelCol).as("_ch"))
    val paired = RangeJoin.bandJoin(conv, tch, Seq(keyCol), "_ct", "_tt", lookbackUs)
      .filter(col("_tt") <= col("_ct"))
      .withColumn("_b", expr(s"(_ct - _tt) div ${halflifeUs}L"))
      .withColumn("_w", expr(s"cast(pow(2.0, $h - _b) as bigint)"))
    val wc = Window.partitionBy(col(keyCol), col("_ct"))
    paired
      .withColumn("_sw", sum(col("_w")).over(wc))
      .withColumn("_credit",
        ((col("_cv") * col("_w").cast("double")) / col("_sw").cast("double"))
          .cast("decimal(18,6)"))
      .groupBy(col("_ch").as("channel"))
      .agg(count(lit(1)).as("n_credits"),
           sum(col("_credit")).cast("double").as("total_credit"))
  }

  /** Retention cohorts: users grouped by their FIRST active day, a
    * row per (cohort day, day offset) with the count of cohort users
    * active that day — the retention-curve table.
    *
    * All day arithmetic is integer division on epoch micros (exact,
    * engine-identical); the activity table dedups to (user, day)
    * BEFORE anything else (a user's event volume never inflates the
    * curve or the shuffle), first-day is a partial-agg min reusing
    * the same user keying, and the final (cohort, offset) count is a
    * partial agg over the deduped table.
    */
  /** Markov removal-effect attribution (Anderl et al. 2014, "Mapping
    * the Customer Journeys" — the data-driven multi-touch model):
    * journeys become a first-order Markov chain START → channels →
    * {CONV, NULL}; a channel's credit is its REMOVAL EFFECT — how much
    * the chain's absorption probability into CONV drops when every
    * edge touching the channel is redirected to NULL — normalized
    * into shares of the conversion value. Completes the attribution
    * family: last-touch (q133) and time-decay (q210) are positional
    * heuristics; this one is causal-counterfactual on the observed
    * transition structure.
    *
    * Journey semantics: each `convType` event CLOSES a journey as
    * converted (START→…→CONV); a user's trailing events after the
    * last conversion form an unconverted journey (…→NULL); a
    * conversion with no preceding channel is START→CONV directly.
    *
    * Scale shape in two regimes:
    *  - corpus-scale: journey construction is two windows on ONE
    *    user-keyed sort (running conversion count = journey id, then
    *    lead/row_number inside (user, journey)) and a partial agg to
    *    the (from, to) transition matrix — nothing pair-scaled;
    *  - model-scale: the matrix is ≤ (|types|+3)² rows (the label
    *    vocabulary, never the corpus). All removal scenarios iterate
    *    TOGETHER as one scenario-keyed frame — `rounds` fixed value-
    *    iteration steps v ← p_conv + P·v, each one tiny join +
    *    partial agg, localCheckpoint-truncated lineage (the
    *    components/kmeansTrain rule).
    *
    * Determinism (the oracle replays every round): p = round(n/tot,9)
    * exact-count division; each product term quantizes to
    * DECIMAL(20,10) BEFORE the sum; v exits every round as an exact
    * 1e-10-unit LONG (never a decimal→double cast — the q101 ulp
    * rule); removal effects re-quantize to 1e-9-unit longs before the
    * share division. Removal monotonicity (dropping edges can only
    * lower every v_r) keeps effects in [0, 1] by construction.
    *
    * Returns (channel, removal_effect, credit_share, attributed_value)
    * — value is the conversion events' `valueCol` total, split by
    * share.
    */
  def removalEffect(events: DataFrame, keyCol: String = "user_id",
                    timeCol: String = "tus", typeCol: String = "event_type",
                    convType: String = "purchase", valueCol: String = "value",
                    tieCols: Seq[String] = Nil, rounds: Int = 16): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = events.sparkSession
    import spark.implicits._
    val ord = col(timeCol) +: tieCols.map(col)
    val wU = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isConv = when(col(typeCol) === convType, 1L).otherwise(0L)
    val ev2 = events
      .withColumn("_ic", isConv)
      .withColumn("_jid", sum(col("_ic")).over(
        Window.partitionBy(keyCol).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_ic"))
      .persist()
    val wJ = Window.partitionBy(col(keyCol), col("_jid")).orderBy(ord: _*)
    // `absorbed` feeds the channel join and the zero-channel branch —
    // persisted so the journey agg runs once
    val absorbed = ev2.groupBy(col(keyCol), col("_jid"))
      .agg(max(col("_ic")).as("_abs"),
           count(when(col(typeCol) =!= convType, 1)).as("_nch"))
      .persist()
    val ch = ev2.filter(col(typeCol) =!= convType)
      .withColumn("_next", lead(col(typeCol), 1).over(wJ))
      .withColumn("_rn", row_number().over(wJ))
    // ONE pass over the channel rows: each row emits its own outgoing
    // edge (to the next channel, or to __CONV__/__NULL__ by the
    // journey's absorption flag when it is last) plus, if it is the
    // journey's first row, the __START__ edge — the same transition
    // multiset the previous 3-branch union produced with three
    // evaluations of the window subtree (profiled: 880 tasks → one
    // window sort + one journey-keyed join)
    // null-safe journey join: a NULL key forms its own window/groupBy
    // partition upstream, so its journey must pair here too — a plain
    // equality join would silently drop ALL of a null-key journey's
    // transitions (the pre-r10 union lost only its terminal edge)
    val absJ = absorbed.select(col(keyCol).as("_ak"), col("_jid").as("_aj"),
      col("_abs"))
    val trans = ch
      .join(absJ, ch(keyCol) <=> col("_ak") && ch("_jid") === col("_aj"))
      .drop("_ak", "_aj")
      .select(explode(array(
        when(col("_rn") === 1,
          struct(lit("__START__").as("from_s"), col(typeCol).as("to_s"))),
        struct(col(typeCol).as("from_s"),
          coalesce(col("_next"),
            when(col("_abs") === 1L, lit("__CONV__")).otherwise(lit("__NULL__")))
            .as("to_s")))).as("_t"))
      .filter(col("_t").isNotNull)
      .select(col("_t.from_s").as("from_s"), col("_t.to_s").as("to_s"))
      .unionByName(absorbed.filter(col("_abs") === 1L && col("_nch") === 0L)
        .select(lit("__START__").as("from_s"), lit("__CONV__").as("to_s")))
      .groupBy("from_s", "to_s").agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("from_s").agg(sum("n").as("_tot"))
    // model artifact from here on: ≤ (|types|+3)² rows by construction
    val pmat = trans.join(tot, Seq("from_s"))
      .select(col("from_s"), col("to_s"),
        round(col("n").cast("double") / col("_tot").cast("double"), 9).as("p"))
      .persist()
    // conversion value total as an exact centi-unit integer (never a
    // decimal→double cast crosses an engine boundary)
    val cv = ev2.filter(col(typeCol) === convType)
      .agg(coalesce(
        sum(floor(col(valueCol).cast("double") * 1e4 + lit(0.5)).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).cast("long").as("cvq"))
      .head.getLong(0)
    val channels = pmat.select(col("to_s").as("c"))
      .filter(!col("c").isin("__CONV__", "__NULL__"))
      .unionByName(pmat.select(col("from_s").as("c")).filter(col("c") =!= "__START__"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    ev2.unpersist(); absorbed.unpersist()
    require(channels.nonEmpty, "removalEffect: no channel states in the event stream")
    // MODEL SIDE ON THE DRIVER: the transition matrix is a ≤(k+3)²-row
    // artifact (the IVF-centroid / kmeansTrain precedent — corpus work
    // stays distributed, artifact-sized iteration doesn't schedule 16
    // cluster rounds of ~100-row joins; measured 5.0s → ~1.3s at
    // sf0.1). The arithmetic REPLICATES the distributed form bit for
    // bit — and therefore the unrolled SQL oracle: each term is the
    // double p·(vu/1e10) cast to DECIMAL(20,10) (JBD.valueOf =
    // Double.toString = Spark's double→decimal path, HALF_UP), sums
    // are exact decimal adds, and the round exit (st+pconv)·1e10 is an
    // integer-valued decimal (longValueExact — loud if ever not).
    val pRows = pmat.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    pmat.unpersist()
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    def iterate(scenario: String): Long = {
      val ps = pRows.filter { case (f, t, _) =>
        scenario == "__FULL__" || (f != scenario && t != scenario) }
      val states = ps.map(_._1).distinct
      val pconvD = states.map { s =>
        s -> JBD.valueOf(ps.collectFirst {
          case (`s`, "__CONV__", p) => p }.getOrElse(0.0)).setScale(10, RM.HALF_UP)
      }.toMap
      val pt = ps.filter(e => e._2 != "__CONV__" && e._2 != "__NULL__")
      var vu: Map[String, Long] = states.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val st = pt.groupBy(_._1).map { case (s, es) =>
          // inner-join semantics of the distributed form: an edge to a
          // state with no outgoing transitions contributes nothing
          s -> es.flatMap { case (_, to, p) => vu.get(to).map(v0 =>
            JBD.valueOf(p * (v0.toDouble / 1e10)).setScale(10, RM.HALF_UP))
          }.foldLeft(JBD.ZERO)(_.add(_))
        }
        vu = states.map { s =>
          s -> st.getOrElse(s, JBD.ZERO).add(pconvD(s))
            .multiply(JBD.valueOf(10000000000L)).setScale(0).longValueExact
        }.toMap
      }
      vu("__START__")
    }
    val ufV = iterate("__FULL__")
    // ufV = 0 means no conversion mass reaches __START__ (e.g. every
    // journey abandons within `rounds` steps): removal shares would be
    // 0/0. Refuse loudly (the theilSen house rule) instead of the
    // NaN→NumberFormatException crash the division would produce.
    require(ufV != 0L,
      "removalEffect: the full graph absorbs zero conversion mass from __START__ " +
      s"within $rounds rounds — no conversions to attribute; nothing to credit")
    val reRows = channels.map { c =>
      val vuC = iterate(c)
      c -> JBD.valueOf((1.0 - vuC.toDouble / ufV.toDouble) * 1e9)
        .setScale(0, RM.HALF_UP).longValue
    }
    val re = reRows.toDF("channel", "re_u")
    val reTot = re.agg(sum("re_u").as("re_tot"))
    re.crossJoin(broadcast(reTot))
      .select(col("channel"),
        (col("re_u").cast("double") / 1e9).as("removal_effect"),
        round(col("re_u").cast("double") / col("re_tot").cast("double"), 6).as("credit_share"),
        round(col("re_u").cast("double") / col("re_tot").cast("double") *
          (lit(cv).cast("double") / 1e4), 4).as("attributed_value"))
  }

  /** Log-rank test across survival cohorts — the hypothesis-test
    * companion to [[survivalCurve]]/[[hazardCurve]]: "do these cohorts
    * share one survival distribution?" At each pooled event time t,
    * each group's expected deaths under H₀ are d_t·n_g/n_t and the
    * hypergeometric variance d_t·(n_g/n_t)(1−n_g/n_t)(n_t−d_t)/(n_t−1);
    * per-group O−E (with per-group z = (O−E)/√V) plus the k-sample
    * score approximation χ² = Σ_g (O_g−E_g)²/E_g on an overall row
    * (df = k−1) — the standard screen before reading curve plots.
    *
    * Determinism: O, d_t, n_g, n_t are exact longs; E/V terms are
    * doubles OF those longs quantized DECIMAL(20,9) pre-sum in one
    * oracle-mirrored op order; outputs round 1e-6 (expected/variance)
    * and 1e-9 (z, χ²). Groups at risk but absent from a time cell
    * still count via the pooled-time grid.
    *
    * Scale shape: observations collapse to (group, t) cells in ONE
    * partial agg; the pooled-event-time grid is |times|×k rows and
    * every window after runs over it (calendar-scale, the §5
    * histogram exemption — distinct durations, never rows).
    */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    val cells = df.select(col(groupCol).cast("string").as("_g"),
        col(durationCol).cast("long").as("_t"),
        col(eventCol).cast("int").as("_e"))
      .groupBy("_g", "_t")
      .agg(sum(col("_e").cast("long")).as("_d"), count(lit(1)).as("_c"))
    // pooled per-time totals; the unpartitioned windows below run over
    // DISTINCT DURATIONS (histogram-scale — the §5 exemption)
    val wPrevAll = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val pooled = cells.groupBy("_t")
      .agg(sum("_d").as("_dt"), sum("_c").as("_ct"))
      .withColumn("_nt",
        sum(col("_ct")).over(wAll) - coalesce(sum(col("_ct")).over(wPrevAll), lit(0L)))
      .filter(col("_dt") > 0)
      .select("_t", "_dt", "_nt")
    // grid: every (group × pooled event time) — a group with no cell at
    // t is still at risk there, so union zero-cells in before the
    // per-group risk-set walk
    val grid = pooled.select(col("_t"))
      .crossJoin(broadcast(cells.select("_g").distinct()))
      .select(col("_g"), col("_t"), lit(0L).as("_d"), lit(0L).as("_c"))
    val aug = cells.select("_g", "_t", "_d", "_c").unionByName(grid)
      .groupBy("_g", "_t").agg(sum("_d").as("_d"), sum("_c").as("_c"))
    val wPrevG = Window.partitionBy("_g").orderBy("_t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAllG = Window.partitionBy("_g")
    def dbl(c: Column) = c.cast("double")
    val risked = aug
      .withColumn("_ng",
        sum(col("_c")).over(wAllG) - coalesce(sum(col("_c")).over(wPrevG), lit(0L)))
      .join(pooled, Seq("_t")) // keeps pooled EVENT times only
      .withColumn("_eterm",
        (dbl(col("_dt")) * dbl(col("_ng")) / dbl(col("_nt"))).cast("decimal(20,9)"))
      .withColumn("_vterm", when(col("_nt") > 1,
        (dbl(col("_dt")) * (dbl(col("_ng")) / dbl(col("_nt")))
          * (lit(1.0) - dbl(col("_ng")) / dbl(col("_nt")))
          * (dbl(col("_nt") - col("_dt")) / dbl(col("_nt") - 1)))
          .cast("decimal(20,9)")).otherwise(lit(0.0).cast("decimal(20,9)")))
    val perGroup = risked.groupBy("_g")
      .agg(sum("_d").as("_o"), sum("_eterm").as("_ex"), sum("_vterm").as("_vr"))
    val gRows = perGroup.select(lit("group").as("section"), col("_g").as("label"),
      col("_o").as("observed"), round(dbl(col("_ex")), 6).as("expected"),
      round(dbl(col("_vr")), 6).as("variance"),
      when(dbl(col("_vr")) > 0,
        round((dbl(col("_o")) - dbl(col("_ex"))) / sqrt(dbl(col("_vr"))), 9)).as("z"),
      lit(null).cast("double").as("chi2"), lit(null).cast("long").as("df"))
    val overall = perGroup
      .select(col("_o"), col("_ex"),
        when(dbl(col("_ex")) > 0,
          (dbl(col("_o")) - dbl(col("_ex"))) * (dbl(col("_o")) - dbl(col("_ex")))
            / dbl(col("_ex"))).otherwise(lit(0.0)).cast("decimal(20,9)").as("_x2"))
      .agg(count(lit(1)).as("_k"), sum("_o").as("observed"),
        sum(col("_ex")).as("_exs"), sum("_x2").as("_chi"))
      .select(lit("overall").as("section"), lit("all").as("label"),
        col("observed"), round(dbl(col("_exs")), 6).as("expected"),
        lit(null).cast("double").as("variance"), lit(null).cast("double").as("z"),
        round(dbl(col("_chi")), 9).as("chi2"), (col("_k") - 1L).as("df"))
    gRows.unionByName(overall)
  }

  /** RFM segmentation: per customer, Recency (last order day) /
    * Frequency (order count) / Monetary (exact cent spend), each
    * scored 1–5 by position against EXACT global quintile boundaries,
    * then collapsed to the ≤125-cell segment table (scores + size +
    * spend) — the classic CRM cut of a customer base, and the
    * grouping key every campaign query joins on.
    *
    * Determinism: boundaries come from `percentile` (exact
    * interpolated order statistic — identical to the oracle's
    * quantile_cont) over integer day/count/cent metrics, quantized
    * DECIMAL(18,6); a score is 1 + (boundaries ≤ metric), so ties sit
    * on the same side in both engines. Spend sums cents in
    * DECIMAL(38,0), reported as double dollars rounded 1e-2.
    *
    * Scale shape: one partial agg to the per-customer table, one
    * 1-row boundary agg broadcast back (the quantileBins shape — no
    * global sort, no row_number), one ≤125-cell final agg.
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  amountCol: String): DataFrame = {
    val per = orders.select(col(custCol).as("_cust"),
        datediff(col(dateCol).cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("_day"),
        floor(col(amountCol).cast("double") * 100 + lit(0.5)).cast("long").as("_cents"))
      .groupBy("_cust")
      .agg(max("_day").as("_r"), count(lit(1)).as("_f"),
        sum(col("_cents").cast("decimal(38,0)")).cast("long").as("_m"))
    val qs = "array(0.2, 0.4, 0.6, 0.8)"
    val bounds = per.agg(
      expr(s"transform(percentile(_r, $qs), x -> cast(x as decimal(18,6)))").as("_qr"),
      expr(s"transform(percentile(_f, $qs), x -> cast(x as decimal(18,6)))").as("_qf"),
      expr(s"transform(percentile(_m, $qs), x -> cast(x as decimal(18,6)))").as("_qm"))
    def score(metric: String, qcol: String) =
      (lit(1) + expr(s"size(filter($qcol, x -> x <= cast($metric as decimal(18,6))))"))
        .cast("int")
    per.crossJoin(broadcast(bounds))
      .select(score("_r", "_qr").as("r_score"), score("_f", "_qf").as("f_score"),
        score("_m", "_qm").as("m_score"), col("_m"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("_m").cast("decimal(38,0)")).cast("double") / 100.0, 2)
          .as("total_spend"))
  }

  def retention(events: DataFrame, userCol: String = "user_id",
                timeCol: String = "tus"): DataFrame = {
    val usPerDay = 86400000000L
    // exact day number: subtract the remainder first so the double
    // division is of an exact multiple (a raw tus/day double quotient
    // can truncate wrong within ~350µs of a midnight boundary)
    val dnum = ((col(timeCol) - pmod(col(timeCol), lit(usPerDay))) / usPerDay).cast("long")
    val d = events.select(col(userCol), dnum.as("dnum")).distinct()
    val f = d.groupBy(userCol).agg(min("dnum").as("cohort"))
    d.join(f, Seq(userCol))
      .groupBy(col("cohort"), (col("dnum") - col("cohort")).cast("int").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(timestamp_micros(col("cohort") * usPerDay).as("cohort_day"),
        col("day_offset"), col("n_users"))
  }
}
