package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.functions.{TextFunctions => T}
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32, col("doc_id"))

    def ngramsFast(toks: Column, n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - n + 1),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))

    val oldSh = docs.select(col("doc_id"),
      explode(array_distinct(T.wordNGrams(T.tokens(col("text")), 2))).as("sh"))
    val newSh = docs.select(col("doc_id"),
      explode(array_distinct(ngramsFast(T.tokens(col("text")), 2))).as("sh"))
    oldSh.count(); newSh.count() // warm
    for (i <- 1 to 3) {
      time(s"old_slice_$i")(oldSh.count())
      time(s"new_element_at_$i")(newSh.count())
    }
    spark.stop()
  }
}
