package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev-only, not part of the surface): stage
  * timings of the minhash pipeline plus whole-query timings for any
  * names given as args.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import graft.functions.{Hashing, TextFunctions => T}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = 32
    for (i <- 1 to 2) {
      time(s"shingle+hash_$i") {
        docs.repartition(n, col("doc_id"))
          .select(col("doc_id"), explode(array_distinct(
            T.wordNGrams(T.tokens(col("text")), 2))).as("sh"))
          .withColumn("h", Hashing.portableHash(col("sh"))).count()
      }
      time(s"signatures_$i") {
        val sh = docs.repartition(n, col("doc_id"))
          .select(col("doc_id"), explode(array_distinct(
            T.wordNGrams(T.tokens(col("text")), 2))).as("sh"))
          .withColumn("h", Hashing.portableHash(col("sh")))
        val mins = (0 until 16).map(j => min(Hashing.affine(j, col("h"))).as(s"_m$j"))
        sh.groupBy("doc_id").agg(mins.head, mins.tail: _*).count()
      }
      time(s"pairs_${i}") {
        operators.Dedup.minhashPairs(docs).count()
      }
      time(s"full_q23_$i") {
        SparkEntry.queries("q23_dedup_minhash")(spark, dir).count()
      }
    }
    for (name <- args.toSeq) {
      val fn = SparkEntry.queries(name)
      time(s"${name}_warm")(fn(spark, dir).count())
      time(s"${name}_t1")(fn(spark, dir).count())
      time(s"${name}_t2")(fn(spark, dir).count())
    }
    spark.stop()
  }
}
