package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregation spec: the Spark-native analog of the reference's
  * `InitAggregation` mapping (`{'column': fn}` or
  * `{'new_column': (fn, 'column')}`, tafra/group.py:39-46).
  *
  * `Agg(out, fn, col)` names the output column explicitly (like the
  * tuple form); `Agg(col, fn)` aggregates a column in place (like the
  * plain form). `fn` is a named, codegen'd Spark aggregate — never a
  * closure — so partial (map-side) aggregation applies before the
  * shuffle at any scale.
  */
final case class Agg(out: String, fn: String, col: String) {
  def toColumn: Column = Agg.fns.get(fn) match {
    case Some(f) => f(col).as(out)
    case None =>
      throw new IllegalArgumentException(
        s"unknown aggregate '$fn'; known: ${Agg.fns.keys.toSeq.sorted.mkString(", ")}")
  }
}

object Agg {
  def apply(col: String, fn: String): Agg = Agg(col, fn, col)

  /** Named aggregates. Mirrors the numpy reductions users pass to the
    * reference (np.sum/mean/min/max/std/var, len, first/last) plus the
    * distributed-native extras (count_distinct, approx variants,
    * collect_list/set).
    */
  val fns: Map[String, String => Column] = Map(
    "sum" -> (c => sum(col(c))),
    "mean" -> (c => avg(col(c))),
    "avg" -> (c => avg(col(c))),
    "min" -> (c => min(col(c))),
    "max" -> (c => max(col(c))),
    "count" -> (c => count(col(c))),
    "count_distinct" -> (c => count_distinct(col(c))),
    "approx_count_distinct" -> (c => approx_count_distinct(col(c))),
    "std" -> (c => stddev_samp(col(c))),
    "var" -> (c => var_samp(col(c))),
    "first" -> (c => first(col(c))),
    "last" -> (c => last(col(c))),
    "collect_list" -> (c => collect_list(col(c))),
    "collect_set" -> (c => collect_set(col(c))),
    "median" -> (c => median(col(c))),
    // sketch-based: single-pass mergeable state, the right median at scale
    "approx_median" -> (c => percentile_approx(col(c), lit(0.5), lit(10000))),
    "any" -> (c => max(col(c).cast("boolean"))),
    "all" -> (c => min(col(c).cast("boolean")))
  )
}
