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
}
