package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast => bc, _}
import org.apache.spark.sql.types.StructType

/** The user-facing frame: a thin immutable wrapper over a Spark
  * [[DataFrame]] exposing the full reference surface
  * (`tafra.base.Tafra`, /root/reference/tafra/base.py:89) re-expressed
  * Spark-first. Every method builds a declarative plan — Catalyst does
  * pushdown/pruning/join-strategy selection; nothing here collects to
  * the driver.
  */
final class Tafra(val df: DataFrame) extends Serializable {
  import Tafra._

  def spark: SparkSession = df.sparkSession
  def columns: Seq[String] = df.columns.toSeq
  def dtypes: Map[String, String] = df.dtypes.toMap
  /** Reference `rows` property (base.py:1133). An action, not metadata. */
  def rows: Long = df.count()
  /** Reference `shape` (base.py:1182): (rows, columns). Row side is an
    * action, like `rows`.
    */
  def shape: (Long, Int) = (rows, columns.size)
  /** Reference `size` (base.py:1204): rows × columns. */
  def size: Long = rows * columns.size
  /** Reference `ndim` (base.py:1226): always 2 for a frame. */
  def ndim: Int = 2

  // ---- column ops (base.py:1354, 1560, 1602, 1449, 1512, 1675) ----

  /** Projection (base.py:1354). Column pruning reaches the scan. */
  def select(cols: Seq[String]): Tafra = {
    validateColumns(cols)
    new Tafra(df.select(cols.map(df(_)): _*))
  }

  /** Rename columns (base.py:1560). */
  def rename(renames: Map[String, String]): Tafra = {
    validateColumns(renames.keys.toSeq)
    new Tafra(df.withColumnsRenamed(renames))
  }

  /** Drop columns (base.py:1602). */
  def delete(cols: Seq[String]): Tafra = {
    validateColumns(cols)
    new Tafra(df.drop(cols: _*))
  }

  /** Add or replace a column (base.py:336 `__setitem__`). */
  def update(name: String, value: Column): Tafra =
    new Tafra(df.withColumn(name, value))

  /** Merge all columns from `other` (base.py:1449). Row counts must
    * align in the reference; in a distributed frame we express it as
    * withColumns from a shared lineage.
    */
  def update(other: Map[String, Column]): Tafra =
    new Tafra(df.withColumns(other))

  /** Cast dtypes (base.py:1512). */
  def updateDtypes(casts: Map[String, String]): Tafra = {
    validateColumns(casts.keys.toSeq)
    new Tafra(df.withColumns(casts.map { case (c, t) => c -> df(c).cast(t) }))
  }

  /** Fill a column from successive fallbacks (base.py:1675). */
  def coalesceCol(column: String, fills: Seq[Column]): Tafra =
    new Tafra(df.withColumn(column, coalesce((df(column) +: fills): _*)))

  // ---- row ops (base.py:310-497, 1380) ----

  def filter(cond: Column): Tafra = new Tafra(df.filter(cond))

  /** Deterministic head: the reference's positional `head` (base.py:1380)
    * has no stable meaning on a distributed frame without a total
    * order, so callers supply one.
    */
  def head(n: Int, order: Seq[Column]): Tafra =
    new Tafra(df.orderBy(order: _*).limit(n))

  def sort(order: Seq[Column]): Tafra = new Tafra(df.orderBy(order: _*))

  def distinct(): Tafra = new Tafra(df.distinct())

  // ---- sampling (training-data pipelines) ----

  /** Reproducible row sample independent of partitioning: keep rows
    * whose key hash lands under `fraction` of the hash space. Unlike
    * `df.sample` (per-partition RNG — resampling changes with
    * partition layout), the same row is always in or out for a given
    * seed, across runs and cluster sizes, and the same keys are kept
    * across TABLES — the property needed to sample a consistent slice
    * of a multi-table corpus. Like [[splitByHash]], membership is an
    * md5-prefix range (NUL-separated key string, seed prefixed), so
    * the kept set is engine-portable and auditable from SQL.
    */
  def sampleHash(fraction: Double, keyCols: Seq[String], seed: Long = 0L): Tafra = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    validateColumns(keyCols)
    if (fraction >= 1.0) return this
    val hx = substring(md5(concat_ws("\u0000",
      (lit(seed.toString) +: keyCols.map(df(_).cast("string"))): _*)), 1, 4)
    new Tafra(df.filter(hx < lit(f"${(fraction * 65536).toInt}%04x")))
  }

  /** Quality-weighted deterministic sampling: each row keeps with
    * probability `weightCol` (clamped to [0,1]) — the soft-filtering
    * step of quality-scored pipelines (keep high-quality documents
    * always, sample mid-quality ones down). Selection is by content
    * hash like [[sampleHash]], not RNG: the same row is in or out for
    * a given seed across runs, partitionings, cluster sizes, and
    * engines (md5-prefix threshold, auditable from SQL). Per-row
    * filter expression: no shuffle, pipelined into the scan.
    */
  def sampleHashWeighted(weightCol: String, keyCols: Seq[String], seed: Long = 0L): Tafra = {
    validateColumns(weightCol +: keyCols)
    val hx = substring(md5(concat_ws("\u0000",
      (lit(seed.toString) +: keyCols.map(df(_).cast("string"))): _*)), 1, 4)
    val hv = conv(hx, 16, 10).cast("int")
    val w = least(greatest(df(weightCol).cast("double"), lit(0.0)), lit(1.0))
    new Tafra(df.filter(hv < floor(w * 65536)))
  }

  /** Fixed-COUNT deterministic per-stratum sample: the k rows of each
    * stratum whose content hash is smallest — the eval-set / audit-
    * sample carve ("exactly 1000 docs per domain") where the
    * fraction-based samplers can't hit an exact size. Same contracts
    * as [[sampleHash]]: selection is by md5 of the key (stable across
    * runs, partitionings, cluster sizes, and engines; auditable from
    * SQL) and kept sets NEST as k grows — raising the quota never
    * resamples. One row_number window per stratum, ordered by (hash,
    * key): the rn ≤ k filter gets WindowGroupLimit pushdown, so map
    * partitions pre-prune to k rows per stratum before the shuffle —
    * the window never sorts a full stratum.
    */
  def sampleTopKByHash(k: Int, strataCols: Seq[String], keyCols: Seq[String],
                       seed: Long = 0L): Tafra = {
    require(k > 0, s"k must be positive, got $k")
    validateColumns(strataCols ++ keyCols)
    val keyStr = concat_ws("\u0000", keyCols.map(df(_).cast("string")): _*)
    val hx = md5(concat_ws("\u0000", lit(seed.toString) +: keyCols.map(df(_).cast("string")): _*))
    val w = Window.partitionBy(strataCols.map(df(_)): _*).orderBy(hx, keyStr)
    new Tafra(df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk"))
  }

  /** WEIGHTED sampling without replacement, fixed size k per stratum
    * (Efraimidis–Spirakis A-ES): each row draws an Exp(weight) key
    * −ln(u)/w from a CONTENT-ADDRESSED uniform u (md5 of the row key,
    * not RNG — same row, same draw, any run/partitioning/engine) and
    * the k smallest keys win; selection probability scales with the
    * weight, so "prefer high-quality docs but keep diversity" becomes
    * one deterministic, auditable pass. [[sampleTopKByHash]] is the
    * uniform special case.
    *
    * Engine determinism: u = (h+1)/(2³²+1) is one exact division of
    * the portable md5 32-bit hash; the Exp key QUANTIZES to
    * DECIMAL(20,9) before ordering — libm and JVM `ln` can differ in
    * the last ulp (~2e-16 relative), which at 1e-9 resolution flips a
    * boundary with probability ~1e-7/row instead of corrupting ranks
    * outright; ties (quantized equal keys) break by the row key.
    * Same plan shape as sampleTopKByHash: per-stratum row_number with
    * WindowGroupLimit pushdown.
    */
  def sampleWeightedTopK(k: Int, strataCols: Seq[String], weightCol: String,
                         keyCols: Seq[String], seed: Long = 0L): Tafra = {
    require(k > 0, s"k must be positive, got $k")
    validateColumns(strataCols ++ (weightCol +: keyCols))
    val keyStr = concat_ws("\u0000", keyCols.map(df(_).cast("string")): _*)
    val h = conv(substring(md5(concat_ws("\u0000",
      lit(seed.toString) +: keyCols.map(df(_).cast("string")): _*)), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1L)) / lit(4294967297.0)
    val expKey = (-log(u) / df(weightCol).cast("double")).cast("decimal(20,9)")
    val w = Window.partitionBy(strataCols.map(df(_)): _*).orderBy(expKey, keyStr)
    new Tafra(df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk"))
  }

  /** Class-balanced downsampling: every class keeps EXACTLY the
    * minority class's row count, selected as the lowest-content-hash
    * rows per class ([[sampleTopKByHash]] with the data-derived k) —
    * the label-balancing step before training a classifier on skewed
    * labels, deterministic and auditable like the whole sampling
    * family (same rows in or out across runs, partitionings, cluster
    * sizes, and engines; kept sets nest if the minority grows).
    *
    * Scale shape: one partial agg to the class-count table (class-
    * vocabulary-sized) whose min is pulled as ONE scalar (a model
    * artifact, the pageRank-nV pattern — and it must be a LITERAL:
    * a column-bound rank filter would defeat WindowGroupLimit
    * pushdown, turning per-class top-k pre-pruning into full
    * per-class sorts), then the sampleTopKByHash window.
    */
  def balancedByClass(classCols: Seq[String], keyCols: Seq[String],
                      seed: Long = 0L): Tafra = {
    validateColumns(classCols ++ keyCols)
    val nMin = df.groupBy(classCols.map(df(_)): _*).agg(count(lit(1)).as("_n"))
      .agg(min(col("_n"))).head().getLong(0)
    require(nMin > 0 && nMin <= Int.MaxValue,
      s"balancedByClass: minority class count $nMin outside (0, 2^31)")
    sampleTopKByHash(nMin.toInt, classCols, keyCols, seed)
  }

  /** Order-insensitive content digest of the frame over `cols`: one
    * row (n_rows, digest_a, digest_b) where the digests are sums of
    * the two leading 32-bit words of each row's md5 — the
    * corpus-version attestation primitive ("are these two snapshots
    * byte-identical in the audited columns?") that costs ONE partial
    * agg instead of a full diff ([[graft.operators.Upsert.diffSnapshots]]
    * answers WHAT changed; this answers WHETHER, cheaply enough to run
    * on every publish). Because the digest is a plain sum it is
    * MERGEABLE: shard digests fold by addition, so an object-store
    * layout can be attested shard-by-shard and combined driver-side.
    *
    * Engine determinism: rows render as `coalesce(cast(c AS string),
    * chr(0))` joined by chr(1) — explicit null sentinel (concat_ws
    * SKIPS nulls, which would alias (a, NULL, b) with (a, b, NULL));
    * md5 is byte-identical everywhere; sums run DECIMAL(38,0) and
    * emit as scale-0 strings (a 10¹² -row digest exceeds a long; a
    * double would round). Contract: cast columns whose string
    * rendering is engine-dependent (doubles, timestamps) to a stable
    * form first — integral/string columns digest as-is.
    */
  def contentDigest(cols: Seq[String]): Tafra = {
    validateColumns(cols)
    val key = concat_ws("\u0001",
      cols.map(c => coalesce(df(c).cast("string"), lit("\u0000"))): _*)
    val h = md5(key)
    def word(start: Int) =
      conv(substring(h, start, 8), 16, 10).cast("long").cast("decimal(38,0)")
    new Tafra(df
      .select(word(1).as("_w1"), word(9).as("_w2"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col("_w1")).cast("string").as("digest_a"),
           sum(col("_w2")).cast("string").as("digest_b")))
  }

  /** Per-stratum sampling fractions (e.g. downsample one language,
    * keep another whole) — `df.stat.sampleBy` with a fixed seed.
    */
  def sampleBy(column: String, fractions: Map[Any, Double], seed: Long = 0L): Tafra = {
    validateColumns(Seq(column))
    new Tafra(df.stat.sampleBy(col(column), fractions, seed))
  }

  /** Deterministic stratified sampling — the domain-mixing step of a
    * training pipeline: keep `fractions(s)` of each stratum (rows whose
    * `column` = s), selected by key-hash like [[sampleHash]] rather
    * than `sampleBy`'s per-partition RNG, so the kept set is stable
    * across runs, partitionings, and engines (md5-prefix ranges,
    * auditable from SQL). Strata absent from `fractions` are dropped —
    * the mixing contract. Per-row filter expression: no shuffle.
    */
  /** Token-BUDGET mixing: per-stratum keep fractions DERIVED from the
    * data — frac = min(1, budget / stratum's total of `tokenCol`) —
    * instead of hand-set fractions ([[sampleHashBy]]). This is how
    * training mixtures are actually specified: "200B tokens of web,
    * 50B of code", with the fraction falling out of the corpus.
    * Strata without a budget drop (same contract as sampleHashBy).
    *
    * Scale shape: totals are one partial agg over the budgeted strata
    * only (the isin filter prunes the scan); the totals table is
    * bounded by the CALLER'S budget map (a config artifact, like
    * sampleHashBy's fractions), so the join back broadcasts
    * unconditionally. Membership is the sampleHashWeighted md5
    * threshold — deterministic across runs, partitionings, and
    * engines, and kept sets nest as a stratum's budget grows. Appends
    * `keep_frac` for audit.
    */
  def mixToBudget(column: String, tokenCol: String, budgets: Map[String, Long],
                  keyCols: Seq[String], seed: Long = 0L): Tafra = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      s"negative budgets: $budgets")
    validateColumns(column +: tokenCol +: keyCols)
    val inMix = df.filter(df(column).isInCollection(budgets.keys.toSeq))
    val tot = inMix.groupBy(df(column)).agg(sum(df(tokenCol)).as("_tot"))
    val budgetCol = element_at(typedlit(budgets), col(column))
    new Tafra(inMix.join(bc(tot), Seq(column))
        .withColumn("keep_frac",
          least(lit(1.0), budgetCol.cast("double") / col("_tot").cast("double"))))
      .sampleHashWeighted("keep_frac", keyCols, seed)
      .delete(Seq("_tot"))
  }

  /** Temperature-smoothed source mixing — the multilingual √n sampling
    * rule (quota_s ∝ √n_s): big sources are damped, small sources
    * up-weighted relative to proportional sampling, without any
    * hand-written per-source budget ([[mixToBudget]]'s knob). α is
    * fixed at 1/2 because √ is the one power IEEE 754 computes
    * CORRECTLY ROUNDED — `sqrt(n)` is the identical double on the JVM
    * and in DuckDB, while `pow(n, α)` is libm-dependent; the weight
    * then quantizes to exact micro-units and every downstream step
    * (weight sum, quota = budget·w/Σw floor division) is INTEGER
    * arithmetic — no float boundary anywhere.
    *
    * Scale shape: per-source doc counts are one partial agg
    * (|sources| rows), quotas derive in a broadcast-sized frame, and
    * membership is the content-addressed md5 rank within each source
    * ([[sampleTopKByHash]]'s ordering — deterministic across runs,
    * partitionings, engines; kept sets nest as the budget grows). The
    * rank prefilters against the CONSTANT `budget` (every quota is ≤
    * it) so WindowGroupLimit prunes before the quota join. Long
    * arithmetic bounds: budget·√n_max·10⁶ must fit a long — holds to
    * budget ~10⁶ at n_max ~10¹³. Keeps the row subset; appends
    * `quota` for audit.
    */
  def mixTemperature(column: String, budget: Long, keyCols: Seq[String],
                     seed: Long = 0L): Tafra = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    validateColumns(column +: keyCols)
    val counts = df.groupBy(df(column)).agg(count(lit(1)).as("_n"))
      .withColumn("_wq", floor(sqrt(col("_n").cast("double")) * 1e6).cast("long"))
    val tot = counts.agg(sum("_wq").as("_totw"))
    val quotas = counts.crossJoin(bc(tot))
      .withColumn("quota", when(col("_totw") <= 0, lit(0L))
        .otherwise(expr(s"($budget * _wq) div _totw")))
      .select(df(column), col("quota"))
    val keyStr = concat_ws(" ", keyCols.map(df(_).cast("string")): _*)
    val hx = md5(concat_ws(" ",
      lit(seed.toString) +: keyCols.map(df(_).cast("string")): _*))
    val w = Window.partitionBy(df(column)).orderBy(hx, keyStr)
    new Tafra(df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= budget)
      .join(bc(quotas), Seq(column))
      .filter(col("_rk") <= col("quota")).drop("_rk"))
  }

  /** Distribution-matching resample (importance resampling to a target
    * marginal): keep a maximal subset whose `column` shares equal the
    * caller's `targetShares` — the "rebalance the corpus to 30% code /
    * 50% web / 20% books" knob when the raw mix is wrong, the
    * share-spec complement of [[mixToBudget]]'s absolute budgets.
    * The binding stratum (smallest n_b/t_b) keeps everything; every
    * other stratum downsamples to scale·t_b rows. Strata absent from
    * the map drop (the mixing contract).
    *
    * Scale shape: stratum counts are one partial agg; the scale factor
    * is an agg over that |strata|-row table; both broadcast back as
    * config-sized artifacts (the mixToBudget pattern). Membership is
    * the sampleHashWeighted md5 threshold — deterministic across runs,
    * partitionings, and engines; kept sets NEST as a stratum's target
    * share grows against a fixed binding stratum. The keep fraction is
    * a double computed from exact counts in an oracle-mirrored op
    * order (ratios and min over a handful of strata — both engines see
    * identical doubles). Appends `keep_frac` for audit.
    */
  def matchDistribution(column: String, targetShares: Map[String, Double],
                        keyCols: Seq[String], seed: Long = 0L): Tafra = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0),
      s"target shares must be positive: $targetShares")
    validateColumns(column +: keyCols)
    val total = targetShares.values.sum
    val norm = targetShares.map { case (k, v) => k -> v / total }
    val inMix = df.filter(df(column).isInCollection(targetShares.keys.toSeq))
    val counts = inMix.groupBy(df(column)).agg(count(lit(1)).as("_n"))
    val tShare = element_at(typedlit(norm), col(column))
    val ratios = counts.withColumn("_ratio", col("_n").cast("double") / tShare)
    val scale = ratios.agg(min(col("_ratio")).as("_scale"))
    new Tafra(inMix.join(bc(ratios.drop("_ratio")), Seq(column)).crossJoin(bc(scale))
        .withColumn("keep_frac",
          least(lit(1.0), col("_scale") * tShare / col("_n").cast("double"))))
      .sampleHashWeighted("keep_frac", keyCols, seed)
      .delete(Seq("_n", "_scale"))
  }

  def sampleHashBy(column: String, fractions: Map[String, Double],
                   keyCols: Seq[String]): Tafra = {
    require(fractions.nonEmpty && fractions.values.forall(f => f >= 0 && f <= 1),
      s"fractions outside [0,1]: $fractions")
    validateColumns(column +: keyCols)
    // NUL separator (as the escape, not a raw byte — keeps the source
    // greppable/diffable): multi-column keys stay unambiguous, unlike a
    // space ("a b","c" vs "a","b c" must hash differently).
    val hx = substring(md5(concat_ws("\u0000", keyCols.map(df(_).cast("string")): _*)), 1, 4)
    val keep = fractions.toSeq.sortBy(_._1).map { case (s, f) =>
      if (f >= 1.0) df(column) === s
      else df(column) === s && hx < lit(f"${(f * 65536).toInt}%04x")
    }.reduce(_ || _)
    new Tafra(df.filter(keep))
  }

  /** Global ordinal assignment (SURVEY.md §2 #45e): a contiguous
    * 1-based `global_idx` in (`orderCol`, `tieCols`) order — the
    * "stable row ids for sharding/resume" primitive (pack manifests,
    * sample ledgers, deterministic interleaving) that a naive
    * `row_number() OVER (ORDER BY …)` computes in ONE task (a global
    * unpartitioned window serializes the corpus and is the single
    * worst scale anti-pattern in the window family).
    *
    * Two-level decomposition instead: rows bucket by
    * `floorDiv(orderCol, bucketWidth)` (order-ALIGNED ranges, exact
    * integer arithmetic, negative-safe); within-bucket ranks come from
    * a bucket-PARTITIONED window (distributed, bounded per bucket);
    * bucket offsets come from one running sum over the bucket-count
    * table (histogram-sized — thousands of rows where the corpus has
    * billions); global_idx = offset + rank. One row shuffle + one
    * tiny-table window, same answer as the global sort.
    *
    * (`orderCol`, `tieCols`) must total-order rows or the assignment
    * is nondeterministic (the twap contract). `orderCol` must be
    * integral (bucket arithmetic); keys needn't be dense or positive.
    */
  def globalIndex(orderCol: String, tieCols: Seq[String], bucketWidth: Long,
                  idxCol: String = "global_idx"): Tafra = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    validateColumns(orderCol +: tieCols)
    val oc = df(orderCol)
    val bucket = ((oc - pmod(oc, lit(bucketWidth))) / bucketWidth).cast("long")
    val withB = df.withColumn("_b", bucket)
    val counts = withB.groupBy(col("_b")).agg(count(lit(1)).as("_bn"))
    val wOff = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_bn")).over(wOff), lit(0L)))
      .select(col("_b"), col("_off"))
    val wIn = Window.partitionBy(col("_b"))
      .orderBy((df(orderCol) +: tieCols.map(df(_))).map(c => c.asc): _*)
    new Tafra(withB
      .withColumn("_rn", row_number().over(wIn))
      .join(bc(offsets), Seq("_b"))
      .withColumn(idxCol, col("_off") + col("_rn"))
      .drop("_b", "_rn", "_off"))
  }

  /** Deterministic train/val/test assignment by key hash: a new
    * `splitCol` labels each row with the name whose cumulative weight
    * range its key's md5 prefix falls in. Content-addressed like
    * [[sampleHash]] — the same key lands in the same split across
    * runs, partitionings, cluster sizes, AND engines (md5 is
    * byte-identical everywhere, so the assignment is auditable from
    * SQL), which is what keeps eval contamination out when the corpus
    * is re-sharded or re-ingested. Per-row expression: no shuffle.
    *
    * Splits are `(name, weight)` with positive weights normalized to
    * sum 1; boundaries are 2-hex-digit prefixes (256 cells), so
    * realized proportions are within ~0.4pp of requested.
    */
  def splitByHash(splits: Seq[(String, Double)], keyCols: Seq[String],
                  splitCol: String = "split"): Tafra = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad split weights: $splits")
    validateColumns(keyCols)
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0)(_ + _._2 / total).tail // cumulative upper bounds
    val hx = substring(md5(concat_ws("\u0000", keyCols.map(df(_).cast("string")): _*)), 1, 2)
    val expr = splits.init.zip(cuts).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) =>
        when(hx < lit(f"${(cut * 256).toInt}%02x"), lit(name)).otherwise(rest)
    }
    new Tafra(df.withColumn(splitCol, expr))
  }

  /** Leakage-safe k-fold assignment: fold = md5(keyCols) mod k, so every
    * row of a group (e.g. a user) lands in ONE fold — the cross-
    * validation companion to [[splitByHash]]'s train/val/test contract.
    * Content-addressed like the whole sampling family: stable across
    * runs, re-shards, and engines (the oracle recomputes the identical
    * 32-bit md5 prefix), and a per-row map-only expression — no
    * shuffle, no join, at any scale.
    */
  def kfoldByHash(k: Int, keyCols: Seq[String], foldCol: String = "fold"): Tafra = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    validateColumns(keyCols)
    val h32 = conv(substring(
      md5(concat_ws("\u0000", keyCols.map(df(_).cast("string")): _*)), 1, 8), 16, 10)
    new Tafra(df.withColumn(foldCol, pmod(h32.cast("long"), lit(k.toLong)).cast("int")))
  }

  // ---- union (base.py:1969, group.py:56) ----

  /** UNION ALL with the reference's validation: same column names and
    * dtypes (group.py:62-96).
    */
  def union(other: Tafra): Tafra = {
    require(df.columns.toSeq == other.df.columns.toSeq,
      s"union: column mismatch ${df.columns.toSeq} vs ${other.df.columns.toSeq}")
    require(df.dtypes.toSeq == other.df.dtypes.toSeq,
      s"union: dtype mismatch ${df.dtypes.toSeq} vs ${other.df.dtypes.toSeq}")
    new Tafra(df.unionByName(other.df))
  }

  // ---- group ops (base.py:2009-2091, group.py:215-384) ----

  /** SQL GROUP BY (group.py:215). Partial aggregation (map-side
    * combine) happens before the shuffle — the reference's
    * O(groups×rows) masking loop becomes one hash-agg exchange.
    */
  def groupBy(cols: Seq[String], aggs: Seq[Agg]): Tafra = {
    validateColumns(cols ++ aggs.map(_.col))
    new Tafra(df.groupBy(cols.map(df(_)): _*).agg(aggs.head.toColumn, aggs.tail.map(_.toColumn): _*))
  }

  /** Group agg broadcast back to rows (group.py:277). The reference
    * does GROUP BY + join-back; Spark's window functions do it in a
    * single shuffle with no join.
    */
  def transform(cols: Seq[String], aggs: Seq[Agg]): Tafra = {
    validateColumns(cols ++ aggs.map(_.col))
    val w = Window.partitionBy(cols.map(df(_)): _*)
    val withCols = aggs.map(a => a.out -> Agg.fns(a.fn)(a.col).over(w)).toMap
    new Tafra(df.withColumns(withCols))
  }

  /** Wide pivot: one output column per `values` entry, cells from
    * `agg` over the matching rows — `groupBy(index).pivot(col).agg`.
    * The pivot values are REQUIRED, not discovered: Spark's
    * discovery variant first runs a hidden distinct+collect job over
    * the pivot column (a full extra pass at 100 TB, and an unbounded
    * driver collect if the column is high-cardinality); a pivot is
    * only meaningful when the caller already knows the handful of
    * columns they want, so we make that the contract. Catalyst
    * rewrites the pivot into per-value conditional aggregates —
    * one partial-agg shuffle on the index keys, same cost shape as a
    * plain groupBy.
    */
  def pivot(index: Seq[String], pivotCol: String, values: Seq[String], agg: Agg): Tafra = {
    validateColumns(index ++ Seq(pivotCol, agg.col))
    require(values.nonEmpty, "pivot: explicit pivot values are required (see scaladoc)")
    new Tafra(df.groupBy(index.map(df(_)): _*).pivot(pivotCol, values).agg(agg.toColumn))
  }

  /** Long unpivot (melt) — the inverse reshape of [[pivot]]: `cols`
    * collapse into (`varName`, `valName`) rows. Map-side expansion
    * (an Expand node, no shuffle); value columns must share a common
    * type. Cells that are NULL (absent combinations from a prior
    * pivot) are kept, matching Spark `Dataset.unpivot` — callers
    * filter if they want the sparse form.
    */
  def unpivot(ids: Seq[String], cols: Seq[String], varName: String, valName: String): Tafra = {
    validateColumns(ids ++ cols)
    new Tafra(df.unpivot(ids.map(df(_)).toArray, cols.map(df(_)).toArray, varName, valName))
  }

  /** Per-group iteration (group.py:342). The reference yields
    * driver-side sub-frames; the scale-safe analog runs `f` inside the
    * executors over each group's rows via flatMapGroups.
    */
  def iterateBy(cols: Seq[String])(outSchema: StructType)(
      f: (Row, Iterator[Row]) => Iterator[Row]): Tafra = {
    validateColumns(cols)
    val keySchema = StructType(cols.map(c => df.schema(c)))
    val keyEnc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(keySchema))
    val outEnc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyIdx = cols.map(df.schema.fieldIndex)
    val out = df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(keyEnc)
      .flatMapGroups((k: Row, it: Iterator[Row]) => f(k, it))(outEnc)
    new Tafra(out.toDF())
  }

  // ---- joins (base.py:2091-2189, group.py:385-648) ----

  /** Inner join with the reference's `on` triples
    * ('left_col','right_col','op'), op ∈ ==,!=,<,<=,>,>= (group.py:30).
    * The conjunction goes to Catalyst whole; it extracts the equi keys
    * for hash/sort-merge join and keeps theta ops as residuals.
    * Output columns follow the reference rule (group.py:449-510):
    * all left columns, then right columns whose names the left doesn't
    * have; `select` filters if non-empty.
    */
  def innerJoin(right: Tafra, on: Seq[(String, String, String)],
                select: Seq[String] = Nil, broadcastRight: Boolean = false): Tafra =
    joinWith(right, on, select, "inner", broadcastRight)

  /** Left join (group.py:512). */
  def leftJoin(right: Tafra, on: Seq[(String, String, String)],
               select: Seq[String] = Nil, broadcastRight: Boolean = false): Tafra =
    joinWith(right, on, select, "left", broadcastRight)

  /** Cross join (group.py:604). */
  def crossJoin(right: Tafra, select: Seq[String] = Nil): Tafra = {
    val out = dedupOutput(df.crossJoin(right.df), right, select)
    new Tafra(out)
  }

  /** Left semi join (scale addition): rows WITH a match — relational
    * EXISTS. Never widens the row and never duplicates a left row on
    * multiple matches (unlike an inner join + distinct, which pays the
    * match fan-out and a dedup shuffle); the probe side short-circuits
    * on first hit.
    */
  def semiJoin(right: Tafra, on: Seq[(String, String, String)],
               broadcastRight: Boolean = false): Tafra =
    filterJoin(right, on, "left_semi", broadcastRight)

  /** Left anti join (scale addition): rows WITHOUT a match — NOT
    * EXISTS, the exclusion primitive (decontamination, incremental-
    * ingest "only new keys", df-pruning) this library already uses
    * internally; exposed as a first-class frame op.
    */
  def antiJoin(right: Tafra, on: Seq[(String, String, String)],
               broadcastRight: Boolean = false): Tafra =
    filterJoin(right, on, "left_anti", broadcastRight)

  /** Shared semi/anti body: same validation as [[joinWith]], but the
    * output is the LEFT schema by definition — no dedupOutput pass.
    */
  private def filterJoin(right: Tafra, on: Seq[(String, String, String)],
                         how: String, broadcastRight: Boolean): Tafra = {
    require(on.nonEmpty, "join requires at least one on-condition")
    validateColumns(on.map(_._1))
    right.validateColumns(on.map(_._2))
    on.foreach { case (l, r, op) =>
      require(joinOps.contains(op), s"invalid join op '$op'")
      val (lt, rt) = (dtypes(l), right.dtypes(r))
      require(lt == rt, s"join dtype mismatch: $l:$lt vs $r:$rt")
    }
    val rdf = if (broadcastRight) bc(right.df) else right.df
    val cond = on.map { case (l, r, op) => joinOps(op)(df(l), right.df(r)) }.reduce(_ && _)
    new Tafra(df.join(rdf, cond, how))
  }

  private def joinWith(right: Tafra, on: Seq[(String, String, String)],
                       select: Seq[String], how: String, broadcastRight: Boolean): Tafra = {
    require(on.nonEmpty, "join requires at least one on-condition")
    validateColumns(on.map(_._1))
    right.validateColumns(on.map(_._2))
    on.foreach { case (l, r, op) =>
      require(joinOps.contains(op), s"invalid join op '$op'")
      // reference validates joinable dtypes (group.py:392-409)
      val (lt, rt) = (dtypes(l), right.dtypes(r))
      require(lt == rt, s"join dtype mismatch: $l:$lt vs $r:$rt")
    }
    val rdf = if (broadcastRight) bc(right.df) else right.df
    val cond = on.map { case (l, r, op) => joinOps(op)(df(l), right.df(r)) }.reduce(_ && _)
    new Tafra(dedupOutput(df.join(rdf, cond, how), right, select))
  }

  /** Reference duplicate-name rule: prefer left, keep right's
    * non-colliding columns (group.py:449-463).
    */
  private def dedupOutput(joined: DataFrame, right: Tafra, select: Seq[String]): DataFrame = {
    val leftCols = df.columns.toSeq
    val rightCols = right.df.columns.toSeq.filterNot(leftCols.contains)
    val all = leftCols.map(c => df(c)) ++ rightCols.map(c => right.df(c))
    val names = leftCols ++ rightCols
    val kept = if (select.isEmpty) names.zip(all)
               else names.zip(all).filter { case (n, _) => select.contains(n) }
    joined.select(kept.map { case (n, c) => c.as(n) }: _*)
  }

  // ---- map functions (base.py:1229-1352) ----

  /** Typed per-row map (base.py:1229 row_map / 1252 tuple_map). */
  def rowMap(outSchema: StructType)(f: Row => Row): Tafra = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    new Tafra(df.map(f).toDF())
  }

  /** Reference `pipe` / `>>` (base.py:1330, 355). */
  def pipe(f: Tafra => Tafra): Tafra = f(this)

  // ---- row/column iterators (base.py:358-391) ----
  // Driver-side BY CONTRACT, like the reference: row iterators stream
  // one partition at a time (toLocalIterator — never the whole frame in
  // driver memory); column iterators materialize the frame because a
  // column is the cross-partition axis. Use the distributed ops above
  // for anything that should scale.

  /** Row iterator (base.py:358 iterrows). Partition-streamed. */
  def iterrows: Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** Rows as plain value sequences (base.py:369 itertuples; Scala has
    * no runtime-named tuples — access by position, or by name via
    * [[toColumnMap]]).
    */
  def itertuples: Iterator[Seq[Any]] = iterrows.map(_.toSeq)

  /** Column iterator (base.py:391 itercols): (name, values) pairs. */
  def itercols: Iterator[(String, Array[Any])] = {
    val all = df.collect()
    columns.iterator.zipWithIndex.map { case (c, i) => c -> all.map(_.get(i)) }
  }

  /** Map a function over column value arrays (base.py:1281 col_map). */
  def colMap[A](f: Array[Any] => A): Iterator[A] =
    itercols.map { case (_, v) => f(v) }

  /** Like [[colMap]] but keyed by column name (base.py:1305 key_map). */
  def keyMap[A](f: Array[Any] => A): Iterator[(String, A)] =
    itercols.map { case (c, v) => c -> f(v) }

  // ---- dict-like surface (base.py:1395-1428 keys/values/items/get) ----

  def keys: Seq[String] = columns
  /** Reference `data` property (base.py:1150): the name→values map.
    * Driver-side like all exports.
    */
  def data: Map[String, Array[Any]] = toColumnMap()
  def values: Seq[Array[Any]] = itercols.map(_._2).toSeq
  def items: Seq[(String, Array[Any])] = itercols.toSeq
  def get(key: String): Option[Array[Any]] =
    if (!df.columns.contains(key)) None
    else Some(df.select(key).collect().map(_.get(0)))

  // ---- IO / exports (base.py:1772-1965) ----

  def toParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)

  /** Hive-style partitioned parquet write: `partitionBy` columns become
    * directory keys, so filters on them prune entire directories at the
    * scan (the first lever for 100 TB layouts).
    */
  def toParquet(path: String, partitionBy: Seq[String]): Unit = {
    validateColumns(partitionBy)
    df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(path)
  }

  /** Bucketed parquet table: rows pre-shuffled into `nBuckets` by hash
    * of `bucketCols` (and pre-sorted when `sortCols` given) AT WRITE
    * TIME, so every later join or aggregation on those keys runs with
    * NO exchange — the co-located-join layout for fact tables that join
    * repeatedly on the same key. Bucket metadata lives in the session
    * catalog (`saveAsTable`); `path` makes it an external table so data
    * location stays caller-controlled. Read-side SORT elision
    * additionally needs `spark.sql.legacy.bucketedTableScan.
    * outputOrdering=true` (gated since SPARK-28583); without it the
    * partition-local sort over presorted runs is near-linear.
    */
  def writeBucketed(table: String, bucketCols: Seq[String], nBuckets: Int,
                    sortCols: Seq[String] = Nil, path: Option[String] = None): Unit = {
    validateColumns(bucketCols ++ sortCols)
    require(nBuckets > 0, "nBuckets must be positive")
    // One write task per bucket (repartition hash = bucket-id hash), so
    // each bucket lands in ONE file — the layout Spark requires before
    // it will trust write-time sortedness and skip the read-side sort.
    val onePerBucket = df.repartition(nBuckets, bucketCols.map(df(_)): _*)
    val w0 = onePerBucket.write.mode("overwrite").format("parquet")
    val w1 = path.fold(w0)(p => w0.option("path", p))
    val w2 = w1.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.isEmpty) w2 else w2.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  def toCsv(path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSON-Lines write — the interchange format document corpora
    * actually ship in. One JSON object per line: splittable, appendable,
    * schema-on-read.
    */
  def toJsonl(path: String): Unit = df.write.mode("overwrite").json(path)

  /** ORC write — the other columnar warehouse format (Hive-ecosystem
    * interchange). Same predicate-pushdown / column-pruning / min-max
    * stats story as parquet; splittable stripes.
    */
  def toOrc(path: String): Unit = df.write.mode("overwrite").orc(path)

  /** Driver-side materialization (base.py:1772 to_records). */
  def toRecords: Array[Row] = df.collect()
  def toLocalIterator: java.util.Iterator[Row] = df.toLocalIterator()

  /** Column-major export (base.py:1806 to_list): one value array per
    * selected column. Driver-side by contract, like to_records.
    */
  def toList(cols: Seq[String] = Nil): Seq[Array[Any]] = {
    val sel = if (cols.isEmpty) columns else { validateColumns(cols); cols }
    val all = df.select(sel.map(df(_)): _*).collect()
    sel.indices.map(i => all.map(_.get(i)))
  }

  /** Row-major 2-D export (base.py:1878 to_array: the transposed
    * column stack).
    */
  def toArray(cols: Seq[String] = Nil): Array[Array[Any]] = {
    val sel = if (cols.isEmpty) columns else { validateColumns(cols); cols }
    df.select(sel.map(df(_)): _*).collect().map(_.toSeq.toArray)
  }

  /** Name-keyed column export (base.py:1836 to_tuple's named access —
    * Scala has no runtime-named tuples, a map is the idiomatic analog).
    */
  def toColumnMap(cols: Seq[String] = Nil): Map[String, Array[Any]] = {
    val sel = if (cols.isEmpty) columns else { validateColumns(cols); cols }
    sel.zip(toList(sel)).toMap
  }

  def pprint(n: Int = 20): Unit = df.show(n, truncate = false)
  /** Aligned text table of the first n rows (base.py:551 pformat), with
    * the reference's formatting knobs: `indent` spaces of left margin,
    * lines truncated at `width` chars (0 = unlimited), array cells
    * elided past `depth` elements.
    */
  def pformat(n: Int = 20, indent: Int = 0, width: Int = 0,
              depth: Option[Int] = None): String =
    Formatter.pformat(columns, columns.map(dtypes), df.limit(n).collect().toSeq,
      indent, width, depth)
  /** HTML table of the first n rows (base.py:679 to_html). */
  def toHtml(n: Int = 20): String =
    Formatter.toHtml(columns, df.limit(n).collect().toSeq)

  /** Parse string columns whose every non-null value cleanly casts to a
    * narrower type (base.py:784 parse_object_dtypes, where "object"
    * numpy columns become typed ones). One aggregate pass counts
    * try_cast successes per string column; a column converts to the
    * first of BIGINT/DOUBLE/BOOLEAN/TIMESTAMP that parses every value.
    */
  def parseObjectDtypes(): Tafra = {
    val strCols = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSeq
    if (strCols.isEmpty) return this
    val targets = Seq("BIGINT", "DOUBLE", "BOOLEAN", "TIMESTAMP")
    val aggs = strCols.flatMap { c =>
      count(df(c)).as(s"__n_$c") +: targets.map(t =>
        count(expr(s"try_cast(`$c` AS $t)")).as(s"__${t}_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val casts = strCols.flatMap { c =>
      val n = stats.getAs[Long](s"__n_$c")
      if (n == 0) None
      else targets.find(t => stats.getAs[Long](s"__${t}_$c") == n)
        .map(t => c -> df(c).cast(t.toLowerCase))
    }.toMap
    if (casts.isEmpty) this else new Tafra(df.withColumns(casts))
  }

  private[core] def validateColumns(cols: Seq[String]): Unit = {
    val missing = cols.distinct.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not found: ${missing.mkString(", ")}")
  }
}

object Tafra {
  val joinOps: Map[String, (Column, Column) => Column] = Map(
    "==" -> (_ === _), "!=" -> (_ =!= _),
    "<" -> (_ < _), "<=" -> (_ <= _),
    ">" -> (_ > _), ">=" -> (_ >= _))

  def apply(df: DataFrame): Tafra = new Tafra(df)

  def readOrc(spark: SparkSession, path: String): Tafra =
    new Tafra(spark.read.orc(path))

  /** Plain parquet read. For a flat layout (single file, or one
    * directory of data files) the schema comes from a driver-side
    * footer read — identical to what inference returns, without the
    * per-frame 1-task inference job; layouts that may carry hive
    * partition directories fall back to Spark's own inference.
    */
  def readParquet(spark: SparkSession, path: String): Tafra =
    new Tafra(ParquetFooters.dirSchema(spark, path) match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.parquet(path)
    })

  /** Schema-evolution read: parquet files written at different corpus
    * generations (later shards carrying NEW columns) load as ONE
    * frame — `mergeSchema` unions the footers' schemas and rows
    * missing a column surface NULL. The long-lived-corpus reality the
    * plain reader mishandles (it trusts one random footer, silently
    * dropping late-added columns). Schema merge is a FOOTER-level
    * operation — metadata-scale, no data pass; the scan itself stays
    * pushdown/pruning-capable per file.
    */
  def readParquetMerged(spark: SparkSession, path: String): Tafra =
    new Tafra(spark.read.option("mergeSchema", "true").parquet(path))

  /** Read a catalog table (e.g. one written by [[Tafra.writeBucketed]];
    * the bucketing metadata rides along into the plan).
    */
  def readTable(spark: SparkSession, table: String): Tafra =
    new Tafra(spark.table(table))

  /** JSON-Lines read. Pass `schema` in production: without it Spark
    * runs a FULL inference pass over the data before the real read —
    * twice the IO on a 100 TB corpus. Reading stays line-splittable
    * either way.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[StructType] = None): Tafra = {
    val r = spark.read
    new Tafra(schema.fold(r)(s => r.schema(s)).json(path))
  }

  /** Reference `from_records` (base.py:887): rows + schema → frame. */
  def fromRecords(spark: SparkSession, schema: StructType, rows: Seq[Row]): Tafra =
    new Tafra(spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema))

  /** Reference `from_dataframe` / `as_tafra` (base.py:948, 1076): wrap
    * an existing frame. The Spark analog of "pandas in, Tafra out" is
    * DataFrame in, Tafra out — also available as `df.asTafra`.
    */
  def fromDataFrame(df: DataFrame): Tafra = new Tafra(df)

  /** Reference `from_series` (base.py:920): one named, typed column.
    * `dtype` is a Spark DDL type string (e.g. "bigint", "string").
    */
  def fromSeries(spark: SparkSession, name: String, dtype: String, values: Seq[Any]): Tafra =
    fromRecords(spark, StructType.fromDDL(s"`$name` $dtype"), values.map(v => Row(v)))

  /** Reference `read_sql` (base.py:979) against a LIVE database. The
    * reference drains a DB-API cursor through the driver; the
    * Spark-native analog pushes the query to the database with
    * `spark.read.jdbc` and, when a numeric `partitionColumn` plus
    * bounds are given, reads it in `numPartitions` parallel range
    * slices — the scale-correct form of `read_sql_chunks`
    * (base.py:1008), whose chunks stream through one cursor instead.
    */
  def readSql(spark: SparkSession, url: String, query: String,
              properties: java.util.Properties = new java.util.Properties(),
              partitionColumn: Option[String] = None,
              lowerBound: Long = 0L, upperBound: Long = 0L,
              numPartitions: Int = 1): Tafra = {
    val dbtable = s"($query) graft_sq"
    val df = partitionColumn match {
      case Some(c) =>
        spark.read.jdbc(url, dbtable, c, lowerBound, upperBound, numPartitions, properties)
      case None =>
        spark.read.jdbc(url, dbtable, properties)
    }
    new Tafra(df)
  }

  implicit final class TafraOps(private val t: Tafra) extends AnyVal {
    /** Reference `>>` operator (base.py:355). */
    def >>(f: Tafra => Tafra): Tafra = t.pipe(f)
  }

  implicit final class DataFrameOps(private val df: DataFrame) extends AnyVal {
    /** Reference `as_tafra` interop (base.py:1076). */
    def asTafra: Tafra = new Tafra(df)
  }
}
