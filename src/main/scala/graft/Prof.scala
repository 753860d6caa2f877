package graft

import org.apache.spark.sql.SparkSession

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
    for (q <- Seq("q34_skew_join", "q36_ann_ivf", "q37_supplier_revenue")) {
      SparkEntry.queries(q)(spark, dir).count() // warm
      time(q)(SparkEntry.queries(q)(spark, dir).count())
      time(q + "_2")(SparkEntry.queries(q)(spark, dir).count())
    }
    spark.stop()
  }
}
