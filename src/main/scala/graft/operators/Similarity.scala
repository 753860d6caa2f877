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

  /** IVF (inverted-file) ANN — the other standard scale path next to
    * LSH. Coarse quantizer: `ncells` centroids seeded from a
    * deterministic corpus sample (smallest xxhash64(id), the
    * library-standard random init made replayable), refined with ONE
    * Lloyd step (assign → per-cell mean). Corpus vectors live in
    * exactly one cell; queries probe their `nprobe` nearest cells and
    * rerank exactly inside them.
    *
    * Scale shape: centroids are broadcast (ncells ≪ corpus); corpus
    * assignment is one pass of ncells codegen'd cosines per vector; the
    * search join shuffles the corpus ONCE on cell id (queries replicate
    * nprobe×, corpus never replicates). Candidates per query ≈
    * nprobe/ncells of the corpus instead of all of it.
    * Returns (query_id, neighbor_id, cos, rank).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              ncells: Int = 16, nprobe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = rebalance(corpus, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))

    // --- coarse quantizer -------------------------------------------------
    val seeds = corpus
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
      .orderBy(xxhash64(col("cell")), col("cell")).limit(ncells)
    // top-1 cell per vector WITHOUT a window: max of (cos, -cell) is a
    // partial-aggregatable reduction, so the corpus×ncells cross rows
    // combine map-side instead of shuffling ncells× the corpus.
    def assignTop1(vecs: DataFrame, idC: String, vc: String, cents: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(cents))
        .groupBy(col(idC))
        .agg(max(struct(V.cosine(col(vc), col("centroid")).as("cos"),
                        (-col("cell")).as("negcell"))).as("best"),
             first(col(vc)).as(vc))
        .select(col(idC), (-col("best.negcell")).as("cell"), col(vc))
    // one Lloyd step: assign to seed cells, refine centroid = cell mean
    val centroids = assignTop1(c, "neighbor_id", "cv", seeds)
      .select(col("cell"), posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy("cell", "d").agg(avg(col("x")).as("m"))
      .groupBy("cell").agg(
        array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("cell"),
        transform(col("dm"), e => e.getField("m").cast("float")).as("centroid"))

    // --- search -----------------------------------------------------------
    val cells = assignTop1(c, "neighbor_id", "cv", centroids)
      .select(col("cell"), col("neighbor_id"), col("cv"))
    // queries are the small side: a window over query_id picks nprobe cells
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(
          V.cosine(col("qv"), col("centroid")).desc, col("cell"))))
      .filter(col("_r") <= nprobe)
      .select(col("cell"), col("query_id"), col("qv"))

    cells.join(broadcast(probes), Seq("cell"))
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
