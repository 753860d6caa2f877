package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation done Spark-relational: PageRank as
  * repeated join + partial-agg rounds over an edge list — the
  * importance/centrality pass over a similarity graph (which documents
  * anchor a near-dup neighborhood; which get sampled as cluster
  * exemplars). Complements [[Dedup.components]] (reachability): same
  * pair-list-sized shuffles, no GraphX dependency, no driver-side
  * adjacency.
  */
object Graph {

  /** Fixed-iteration PageRank over an UNDIRECTED pair list (edges are
    * symmetrized, so every vertex has out-degree ≥ 1 — no dangling-
    * mass redistribution needed). `iters` is fixed (the oracle unrolls
    * it); damping is the RATIONAL dampNum/dampDen so the teleport
    * constants derive from exact integer division in both engines — a
    * 0.85 decimal literal and the double 0.85 disagree in the last
    * bit.
    *
    * Scale shape: per round, contributions are one edge⋈rank join
    * (both hash-partitioned on src) and one partial-agg sum keyed on
    * dst — shuffles sized by the edge list, like components. Per-edge
    * contributions quantize to DECIMAL(30,15) before the sum so the
    * per-vertex accumulation is order-insensitive at any parallelism
    * (float sums would drift between engines and between runs); the
    * rank update returns to double through the same op sequence the
    * oracle uses. The vertex count is one count() action (a scalar
    * model artifact, like the IVF centroid pull).
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String, iters: Int = 3,
               dampNum: Int = 17, dampDen: Int = 20): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum,
      s"need iters >= 1 and 0 < dampNum/dampDen < 1")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nV = deg.count()
    require(nV > 0, "pageRank: empty edge list — no vertices to rank")
    val d = dampNum.toDouble / dampDen.toDouble
    val base = lit((dampDen - dampNum).toDouble) / (lit(dampDen.toDouble) * lit(nV.toDouble))
    var pr = deg.select(col("src").as("node"),
      (lit(1.0) / lit(nV.toDouble)).as("pr"))
    for (_ <- 0 until iters) {
      pr = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          (col("pr") / col("deg")).cast("decimal(30,15)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
        .select(col("node"), (base + lit(d) * col("csum").cast("double")).as("pr"))
    }
    pr
  }
}
