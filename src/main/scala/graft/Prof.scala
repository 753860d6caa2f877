package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (q <- Seq("q26_dedup_embedding", "q27_ann_bruteforce", "q28_ann_lsh")) {
      SparkEntry.queries(q)(spark, dir).count() // warm
      time(q)(SparkEntry.queries(q)(spark, dir).count())
    }
    println("=== q27 plan (formatted, trimmed) ===")
    val plan = SparkEntry.queries("q27_ann_bruteforce")(spark, dir)
    println(plan.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
