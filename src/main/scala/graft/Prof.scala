package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
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
    import graft.functions.{Hashing, TextFunctions => T}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q24_dedup_simhash")(spark, dir).count() // warm all
    val tf = docs.repartition(32, col("doc_id"))
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    time("tf")(tf.count())
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    val sh = tf.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        Hashing.assembleSimhash((0 until 64).map(j => col(s"b$j"))).as("simhash"))
    time("sh")(sh.count())
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 8).bitwiseAND(lit(0xffL)).as("bandval"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bandval").as("bandval"))
    val capped = banded.withColumn("_bn", row_number().over(
        Window.partitionBy(col("band"), col("bandval")).orderBy(col("doc_id"))))
      .filter(col("_bn") <= 50).drop("_bn")
    time("capped")(capped.count())
    val a = capped.select(col("band"), col("bandval"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = capped.select(col("band"), col("bandval"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    val joined = a.join(b, Seq("band", "bandval")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
    time("joined_distinct")(joined.count())
    time("full_q24")(SparkEntry.queries("q24_dedup_simhash")(spark, dir).count())
    spark.stop()
  }
}
