package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the Deequ-style
  * "unit tests for data" pass (Schelter et al., VLDB'18) a 100 TB
  * ingest runs BEFORE anything downstream trusts a new drop:
  * completeness, key uniqueness, bounds, enum domains, referential
  * integrity, each as a declared expectation producing one verdict
  * row. Complements the DESCRIPTIVE profile family (corpusStats /
  * nullProfile / fkAudit report what IS; this asserts what MUST BE
  * and says pass/fail).
  *
  * Scale shape: every row-local check compiles into ONE shared
  * partial-agg pass over the table (adding a check adds a column to
  * the same agg, not a scan); uniqueness adds its count-distinct to
  * that pass; each foreign-key check adds one left-anti join against
  * the DISTINCT referenced keys (dimension-sized build side —
  * broadcast by AQE) collapsed to a count. The verdict table is
  * |checks| rows.
  *
  * Exactness: all pass/fail decisions are INTEGER arithmetic —
  * ratios compare by cross-multiplication against rational
  * thresholds, bound checks compare the exact min/max, set/sign/FK
  * checks count violations — no float boundary anywhere. The
  * human-facing `metric` column is one double division of exact
  * counts, rounded 1e-9.
  */
object Quality {

  /** A declared expectation on one column. */
  sealed trait Check { def column: String }

  /** Non-null share ≥ minNum/minDen (default: fully complete). */
  case class Completeness(column: String, minNum: Long = 1L, minDen: Long = 1L)
    extends Check { require(minNum >= 0 && minDen > 0 && minNum <= minDen) }

  /** Primary-key check: every row non-null and no value repeats.
    * Metric = distinct/total.
    */
  case class Uniqueness(column: String) extends Check

  /** Exact min(column) ≥ bound. Metric = observed min. */
  case class MinBound(column: String, bound: Double) extends Check

  /** Exact max(column) ≤ bound. Metric = observed max. */
  case class MaxBound(column: String, bound: Double) extends Check

  /** No negative values (NULLs don't count against it — pair with
    * [[Completeness]]). Metric = violation count.
    */
  case class NonNegative(column: String) extends Check

  /** Every non-null value drawn from `allowed` (the enum-domain
    * check). Metric = in-set share of all rows.
    */
  case class InSet(column: String, allowed: Seq[String]) extends Check {
    require(allowed.nonEmpty, s"InSet($column): empty allowed set")
  }

  /** Referential integrity: every non-null value of `column` exists
    * in `refColumn` of `ref`. Metric = orphan count.
    */
  case class ForeignKey(column: String, ref: DataFrame, refColumn: String)
    extends Check

  private def nameOf(c: Check): String = c match {
    case _: Completeness => "completeness"
    case _: Uniqueness   => "uniqueness"
    case _: MinBound     => "min_bound"
    case _: MaxBound     => "max_bound"
    case _: NonNegative  => "non_negative"
    case _: InSet        => "in_set"
    case _: ForeignKey   => "foreign_key"
  }

  /** Run every check; returns (check, column, metric, threshold,
    * passed) — one row per declared check, in a deterministic order
    * (check name, column).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit: no checks declared")
    val rowChecks = checks.filter(!_.isInstanceOf[ForeignKey])
    val fkChecks = checks.collect { case f: ForeignKey => f }
    def dd(c: Column) = c.cast("double")
    val base: Option[DataFrame] = if (rowChecks.isEmpty) None else Some {
      // one shared agg: every row-local check contributes its columns
      val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++
        rowChecks.zipWithIndex.flatMap { case (chk, i) =>
          chk match {
            case Completeness(c, _, _) =>
              Seq(count(col(c)).as(s"_a$i"))
            case Uniqueness(c) =>
              Seq(countDistinct(col(c)).as(s"_a$i"), count(col(c)).as(s"_b$i"))
            case MinBound(c, _) => Seq(min(col(c).cast("double")).as(s"_a$i"))
            case MaxBound(c, _) => Seq(max(col(c).cast("double")).as(s"_a$i"))
            case NonNegative(c) =>
              Seq(count(when(col(c) < 0, 1)).as(s"_a$i"))
            case InSet(c, allowed) =>
              Seq(count(when(col(c).cast("string").isin(allowed: _*), 1)).as(s"_a$i"),
                  count(when(col(c).isNotNull &&
                    !col(c).cast("string").isin(allowed: _*), 1)).as(s"_b$i"))
            case _: ForeignKey => Seq.empty
          }
        }
      val row = df.agg(aggs.head, aggs.tail: _*)
      val verdicts = rowChecks.zipWithIndex.map { case (chk, i) =>
        val (metric, threshold, passed) = chk match {
          case Completeness(_, num, den) =>
            (round(dd(col(s"_a$i")) / dd(col("_n")), 9),
             lit(num.toDouble / den.toDouble),
             col(s"_a$i") * den >= col("_n") * num)
          case Uniqueness(_) =>
            (round(dd(col(s"_a$i")) / dd(col("_n")), 9), lit(1.0),
             col(s"_a$i") === col("_n") && col(s"_b$i") === col("_n"))
          // an all-NULL column yields min/max = NULL: the verdict must
          // still be DEFINITE (fail, with the null metric surfaced) —
          // a NULL `passed` silently vanishes from passed=false
          // filters downstream, dropping a declared check
          case MinBound(_, b) =>
            (round(col(s"_a$i"), 9), lit(b), coalesce(col(s"_a$i") >= b, lit(false)))
          case MaxBound(_, b) =>
            (round(col(s"_a$i"), 9), lit(b), coalesce(col(s"_a$i") <= b, lit(false)))
          case NonNegative(_) =>
            (dd(col(s"_a$i")), lit(0.0), col(s"_a$i") === 0L)
          case InSet(_, _) =>
            (round(dd(col(s"_a$i")) / dd(col("_n")), 9), lit(1.0),
             col(s"_b$i") === 0L)
          case _: ForeignKey => (lit(0.0), lit(0.0), lit(true)) // unreachable
        }
        struct(lit(nameOf(chk)).as("check"), lit(chk.column).as("column"),
          metric.as("metric"), threshold.cast("double").as("threshold"),
          passed.as("passed"))
      }
      row.select(explode(array(verdicts: _*)).as("_v")).select("_v.*")
    }
    val fkFrames = fkChecks.map { fk =>
      val refKeys = fk.ref.select(col(fk.refColumn).as("_rk")).distinct()
      df.select(col(fk.column).as("_rk")).filter(col("_rk").isNotNull)
        .join(refKeys, Seq("_rk"), "left_anti")
        .agg(count(lit(1)).as("_orphans"))
        .select(lit(nameOf(fk)).as("check"), lit(fk.column).as("column"),
          dd(col("_orphans")).as("metric"), lit(0.0).as("threshold"),
          (col("_orphans") === 0L).as("passed"))
    }
    (base.toSeq ++ fkFrames).reduce(_ unionByName _)
      .orderBy(col("check"), col("column"))
  }

  /** Semi-structured key profile of a JSON column — the schema-
    * inference census a pipeline runs BEFORE promoting JSON props to
    * real columns: per key, how often it is present (fill rate), how
    * often its value parses as numeric (promotion candidate), and its
    * distinct-value count (enum candidate). One pass answers "which
    * keys are worth columns, and as what type" — the [[audit]]
    * family's question asked of the part of the schema that ISN'T
    * declared yet.
    *
    * Values are compared in their STRING rendering (the engine-
    * portable common denominator: JSON numbers/booleans render
    * identically; string values unquote identically); the numeric
    * test is one anchored regex both engines run with the same
    * semantics. Rates are exact-count double divisions rounded 1e-9.
    *
    * Scale shape: one map-side from_json + explode (rows × keys-per-
    * row, collapsing into the per-key partial agg), one 1-row total
    * broadcast back. Key vocabulary bounds everything after the agg.
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val kv = df.select(explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
      .as(Seq("key", "value")))
    val tot = df.agg(count(lit(1)).as("_n"))
    kv.groupBy("key")
      .agg(count(lit(1)).as("n_present"),
        sum(when(col("value").rlike("^-?[0-9]+(\\.[0-9]+)?$"), 1L).otherwise(0L))
          .as("n_numeric"),
        countDistinct(col("value")).as("n_distinct"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("n_present"),
        round(dd(col("n_present")) / dd(col("_n")), 9).as("present_rate"),
        col("n_numeric"),
        round(dd(col("n_numeric")) / dd(col("n_present")), 9).as("numeric_rate"),
        col("n_distinct"))
  }
}
