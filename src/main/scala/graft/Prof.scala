package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (dev-only, not part of the surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q24_dedup_simhash", "q25_dedup_ngram")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      time(s"${name}_warm")(fn(spark, dir).count())
      time(s"${name}_t1")(fn(spark, dir).count())
      time(s"${name}_t2")(fn(spark, dir).count())
    }
    spark.stop()
  }
}
