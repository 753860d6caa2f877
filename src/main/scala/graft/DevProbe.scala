package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch: stage-by-stage timing of the embeddingPairs →
  * graph pipeline that dominates the graph query family.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (i <- 1 to 2) {
      time(s"pairs_count_$i") {
        operators.Dedup.embeddingPairs(emb).count()
      }
      time(s"pairs_ge01_$i") {
        operators.Dedup.embeddingPairs(emb).filter(col("cos") >= 0.1).count()
      }
      time(s"degree_agg_$i") {
        val p = operators.Dedup.embeddingPairs(emb).filter(col("cos") >= 0.1)
        p.groupBy("vec_a").agg(count(lit(1))).count()
      }
      time(s"triangles_$i") {
        val p = operators.Dedup.embeddingPairs(emb).filter(col("cos") >= 0.1)
        operators.Graph.triangleCounts(p, "vec_a", "vec_b").count()
      }
    }
    spark.stop()
  }
}
