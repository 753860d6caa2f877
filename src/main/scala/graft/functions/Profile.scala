package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass corpus profiling: per-group AND grand-total statistics via
  * ROLLUP — row counts, metric totals, and EXACT percentiles. The
  * dataset report every curation pipeline publishes (docs and length
  * distribution per source, plus the corpus-wide line) as a single
  * relational pass.
  *
  * Scale shape: ROLLUP is ONE shuffle with partial (map-side)
  * aggregation — the grand-total row reuses the same partials, it is
  * not a second scan. Exact percentiles use Spark's `percentile`
  * aggregate whose partial state is a value→count map: memory scales
  * with DISTINCT metric values (bounded for lengths, scores, token
  * counts), never with rows. For an unbounded-cardinality metric swap
  * `approx_percentile` in — the report contract is unchanged.
  *
  * Engine determinism: Spark `percentile`, DuckDB `quantile_cont`, and
  * numpy's 'linear' all interpolate at position p·(n−1) (verified
  * bit-identical on this corpus); the interpolated double is still
  * quantized through DECIMAL(18,4) on both engines so a last-bit
  * difference can never flip the comparison hash.
  */
object Profile {

  /** Per-group + grand-total stats of `metricCol` grouped by
    * `groupCol`. Output: (groupCol, is_total, n_rows, total, p50, p90,
    * p99) — `is_total = 1` marks the rollup's grand-total row (its
    * groupCol is NULL).
    */
  def stats(df: DataFrame, groupCol: String, metricCol: String): DataFrame = {
    def pct(p: Double, name: String): Column =
      percentile(col(metricCol), lit(p))
        .cast("decimal(18,4)").cast("double").as(name)
    df.rollup(col(groupCol))
      .agg(
        grouping(col(groupCol)).cast("int").as("is_total"),
        count(lit(1)).as("n_rows"),
        sum(col(metricCol)).as("total"),
        pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"))
  }

  /** Adaptive per-group filtering: keep rows whose `scoreCol` is at or
    * above their OWN group's p-quantile — the per-domain threshold
    * pattern (a single global cutoff over-prunes clean domains and
    * under-prunes noisy ones; thresholding each domain against itself
    * is how modern curation pipelines set quality gates).
    *
    * Spark design: thresholds are ONE percentile agg (partial state =
    * distinct-score map per group) joined back — a model artifact the
    * size of the group count, BROADCAST only under `broadcastMaxRows`
    * with a plain shuffled join past it (the q25 size-gate pattern;
    * domains are usually thousands, but nothing guarantees it).
    * Deliberately NOT a partition-wide window: an unbounded-frame
    * window buffers each group in one task, the agg+join form
    * combines map-side. Score and threshold are both quantized to
    * DECIMAL(18,6) before the comparison, so the boundary decision is
    * exact and engine-identical. Appends `thr` (the group threshold)
    * for auditability.
    */
  def adaptiveFilter(df: DataFrame, groupCol: String, scoreCol: String,
                     p: Double = 0.25,
                     broadcastMaxRows: Long = 2000000L): DataFrame = {
    require(p >= 0.0 && p <= 1.0, "p must be in [0, 1]")
    val thr = df.groupBy(col(groupCol))
      .agg(percentile(col(scoreCol), lit(p)).cast("decimal(18,6)").as("thr"))
      .persist()
    val nGroups = thr.count()
    val thrT = if (nGroups <= broadcastMaxRows) broadcast(thr) else thr
    df.join(thrT, Seq(groupCol))
      .filter(col(scoreCol).cast("decimal(18,6)") >= col("thr"))
  }
}
