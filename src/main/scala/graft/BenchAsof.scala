package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: hot-key spread of the bucketed as-of join. One key owns
  * the whole stream (the worst case for the plain union+window form,
  * which sorts that key in ONE task); the bucketed variant spreads it
  * over (key, bucket) window partitions. Prints wall seconds for both.
  *
  * Run: scripts/run_class.sh graft.BenchAsof [nRows]
  */
object BenchAsof {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-bench-asof")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one hot key; times spread over [0, 100 * n) so buckets are busy
    val left = spark.range(n).selectExpr("0L as k", "id * 100 as t")
    val right = spark.range(n).selectExpr("0L as k", "id * 100 + 37 as rt", "cast(id as double) as rv")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      // aggregate the MATCHED payload — a bare count() lets column
      // pruning delete the window and measures nothing
      val s = df.agg(sum("rv")).head.getDouble(0)
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s  (sum $s%.1f)")
    }
    // warm both paths once, then measure
    for (_ <- 0 until 2) {
      time("plain")(operators.AsofJoin.asofJoin(
        left, right, "k", "t", "rt", Seq("rt", "rv")))
      time("bucketed")(operators.AsofJoin.asofJoinBucketed(
        left, right, "k", "t", "rt", Seq("rt", "rv"), bucketWidth = n))
    }
    spark.stop()
  }
}
