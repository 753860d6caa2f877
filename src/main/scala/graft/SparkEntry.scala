package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Agg, Tafra}

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): Tafra =
    Tafra.readParquet(spark, s"$dir/$name.parquet")

  /** Exact money arithmetic: sums over DECIMAL are order-independent
    * and match the DuckDB oracle bit-for-bit (doubles would drift with
    * shuffle order).
    */
  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2#1 group_by (tafra/group.py:215) — TPC-H Q1-style pricing summary.
    "q01_groupby_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.update("l_quantity_d", dec(col("l_quantity")))
        .update("revenue_d", dec(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
        .groupBy(
          Seq("l_returnflag", "l_linestatus"),
          Seq(Agg("sum_qty_d", "sum", "l_quantity_d"),
              Agg("sum_revenue_d", "sum", "revenue_d"),
              Agg("n_rows", "count", "l_orderkey"),
              Agg("n_orders", "count_distinct", "l_orderkey")))
        .update("sum_qty", col("sum_qty_d").cast("double"))
        .update("sum_revenue", col("sum_revenue_d").cast("double"))
        .delete(Seq("sum_qty_d", "sum_revenue_d"))
        .sort(Seq(col("l_returnflag"), col("l_linestatus"))).df
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         COUNT(l_orderkey) AS n_rows,
         COUNT(DISTINCT l_orderkey) AS n_orders,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_revenue
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
