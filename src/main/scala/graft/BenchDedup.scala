package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe for the dedup family: unions `documents` K×
  * with offset ids (a dup-heavy corpus — the dedup stress shape) and
  * times each operator, to catch superlinear pair growth before it
  * shows up at 100 TB. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE=10 \
  *     scripts/run_class.sh graft.BenchDedup
  */
object BenchDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = base.agg(max("doc_id")).head().getLong(0) + 1
    val docs = (0 until scale).map(i =>
      base.select((col("doc_id") + lit(i * maxId)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    docs.cache().count()
    val n = docs.count()
    println(s"[dedup-bench] corpus: $n docs ($scale x $sfDir)")

    def time(tag: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime(); val rows = f.count()
      val t1 = System.nanoTime(); val rows2 = f.count() // min of 2
      val dt = math.min(t1 - t0, System.nanoTime() - t1) / 1e9
      println(f"[dedup-bench] $tag%-16s $dt%8.2f s  rows=$rows")
      require(rows == rows2)
    }
    time("exact")(operators.Dedup.exact(docs))
    time("minhash")(operators.Dedup.minhash(docs))
    time("simhash")(operators.Dedup.simhash(docs))
    time("ngram")(operators.Dedup.ngramJaccard(docs))

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1
    val vecs = (0 until scale).map(i =>
      emb.select((col("vec_id") + lit(i * maxVid)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    vecs.cache().count()
    time("embedding")(operators.Dedup.embedding(vecs))
    spark.stop()
  }
}
