package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 #34-35). The query set is always the broadcast side;
  * the corpus streams — so the plan scales to any corpus size with no
  * shuffle of the corpus itself.
  */
object Similarity {

  private def rebalance(df: DataFrame, idCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartition(n, col(idCol))
  }

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * the full corpus, rank per query. Exact baseline; cost is
    * |queries| × |corpus| codegen'd dot products.
    * Returns (query_id, neighbor_id, cos, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // Rebalance the corpus so the dot-product stage doesn't inherit a
    // narrow scan (few files/row groups = few cores doing all the math).
    // Explicit partition count: a bare repartition(col) is AQE-coalescible
    // and collapses back to one partition on small byte sizes.
    val c = rebalance(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", V.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** LSH-bucketed ANN (the scale path): hyperplane-bucket the corpus
    * once (in production: precomputed + partitioned by bucket), probe
    * with the queries' buckets, rerank candidates exactly. Few bits →
    * high recall with |corpus|/2^nbits candidates per query instead of
    * the full corpus.
    * Returns (query_id, neighbor_id, cos, rank).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nbits: Int = 4, dim: Int = 64,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = rebalance(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        Hashing.hyperplaneBucket(col(vecCol), nbits, dim).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Hashing.hyperplaneBucket(col(vecCol), nbits, dim).as("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", V.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
