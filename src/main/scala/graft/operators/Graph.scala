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
    // the edge list is joined EVERY iteration — persist it (pair-list-
    // sized, the components pattern) or each round re-runs the full
    // upstream candidate-pair pipeline
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val nV = deg.count()
    require(nV > 0, "pageRank: empty edge list — no vertices to rank")
    val d = dampNum.toDouble / dampDen.toDouble
    // adaptive local path (triangleCounts rationale): the rank rounds
    // are deterministic arithmetic — per-edge contributions go through
    // the double→DECIMAL(30,15) cast (BigDecimal.valueOf + HALF_UP,
    // mirrored below), decimal sums are exact, the rank update is the
    // same IEEE expression — so local and distributed ranks are
    // bit-identical (property-tested in Round10OptSpec)
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      edges.unpersist(); deg.unpersist()
      val baseL = (dampDen - dampNum).toDouble / (dampDen.toDouble * nV.toDouble)
      var prL = new java.util.HashMap[Long, Double]()
      val itD = degL.keySet().iterator()
      while (itD.hasNext) prL.put(itD.next(), 1.0 / nV.toDouble)
      for (_ <- 0 until iters) {
        val csum = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst) =>
          // mirror cast(double as decimal(30,15)): shortest-repr
          // BigDecimal + HALF_UP at scale 15
          val c = java.math.BigDecimal.valueOf(prL.get(s) / degL.get(s).toDouble)
            .setScale(15, java.math.RoundingMode.HALF_UP)
          csum.merge(dst, c, _.add(_))
        }
        val next = new java.util.HashMap[Long, Double]()
        val itC = csum.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          next.put(e.getKey, baseL + d * e.getValue.doubleValue())
        }
        prL = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val itP = prL.entrySet().iterator()
      while (itP.hasNext) { val e = itP.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "pr")
    }
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
    // eager node-sized result checkpoint, then release the edge/degree
    // caches (the modularity pattern): a long-lived session calling
    // graph ops repeatedly must not accumulate MEMORY_AND_DISK blocks
    val out = pr.localCheckpoint()
    edges.unpersist(); deg.unpersist()
    out
  }

  /** Shared weighted-edge construction for the weighted rank family —
    * ONE definition so the engine can never desync from the single
    * OracleGen.weightedEdgesPrelude that mirrors it: quantize
    * (floor(w·scale + ½)), symmetrize, canonicalize duplicate pairs to
    * max, drop zero-quantum edges; returns (edges, per-src totals),
    * both persisted (callers release).
    */
  private def weightedEdges(pairs: DataFrame, aCol: String, bCol: String,
                            wCol: String, weightScale: Long): (DataFrame, DataFrame) = {
    val wq0 = floor(col(wCol).cast("double") * weightScale + lit(0.5)).cast("long")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"), wq0.as("wq"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst"), wq0.as("wq")))
      .groupBy("src", "dst").agg(max("wq").as("wq"))
      .filter(col("wq") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wsum = edges.groupBy("src").agg(sum("wq").as("wtot")).persist()
    (edges, wsum)
  }

  /** Weighted-edge PageRank: [[pageRank]] with mass spread
    * PROPORTIONAL TO EDGE WEIGHT — the right form over a similarity
    * graph, whose edges HAVE weights (cosine / Jaccard scores): a
    * vertex's rank should flow toward its strongest near-neighbors,
    * not uniformly across a 0.41-cosine and a 0.97-cosine edge alike.
    * The standard exemplar-selection ranker over near-dup
    * neighborhoods.
    *
    * Determinism contract (the personalizedPageRank one): weights
    * quantize ONCE to integer units (wq = floor(w·scale + ½), exact
    * longs; zero-quantum edges carry no mass and drop); per-src weight
    * totals are exact long sums; each per-edge contribution is ONE
    * mirrored double expression floor(pr·wq/Wq·10¹⁵ + ½) quantized
    * pre-sum (order-insensitive at any parallelism); rational damping.
    * On unit weights wq/Wq = 1/deg exactly, so ranks agree with
    * [[pageRank]] to within one 10⁻¹⁵ quantum per edge (spec-pinned).
    *
    * Scale shape: identical to pageRank — per round one edge⋈rank hash
    * join + one dst-keyed partial-agg sum, everything edge-list-sized;
    * caches released via the modularity pattern.
    */
  def pageRankWeighted(pairs: DataFrame, aCol: String, bCol: String,
                       wCol: String, iters: Int = 3,
                       dampNum: Int = 17, dampDen: Int = 20,
                       weightScale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum && weightScale > 0,
      s"need iters >= 1, 0 < dampNum/dampDen < 1, weightScale > 0")
    val (edges, wsum) = weightedEdges(pairs, aCol, bCol, wCol, weightScale)
    val nV = wsum.count()
    require(nV > 0, "pageRankWeighted: no positive-weight edges — nothing to rank")
    val d = dampNum.toDouble / dampDen.toDouble
    // adaptive local path (pageRank rationale); the per-edge quantum is
    // the same IEEE chain floor(pr·wq/Wq·1e15 + ½), summed exactly
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val wtot = new java.util.HashMap[Long, Long]()
      wsum.collect().foreach(r => wtot.put(r.getLong(0), r.getLong(1)))
      edges.unpersist(); wsum.unpersist()
      val baseL = (dampDen - dampNum).toDouble / (dampDen.toDouble * nV.toDouble)
      var prL = new java.util.HashMap[Long, Double]()
      val itW = wtot.keySet().iterator()
      while (itW.hasNext) prL.put(itW.next(), 1.0 / nV.toDouble)
      for (_ <- 0 until iters) {
        val csum = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst, wq) =>
          val c = java.math.BigDecimal.valueOf(
            math.floor(prL.get(s) * wq.toDouble / wtot.get(s).toDouble * 1e15 + 0.5))
          csum.merge(dst, c, _.add(_))
        }
        val next = new java.util.HashMap[Long, Double]()
        val itC = csum.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          next.put(e.getKey, baseL + d * (e.getValue.doubleValue() / 1e15))
        }
        prL = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val itP = prL.entrySet().iterator()
      while (itP.hasNext) { val e = itP.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "pr")
    }
    val base = lit((dampDen - dampNum).toDouble) / (lit(dampDen.toDouble) * lit(nV.toDouble))
    var pr = wsum.select(col("src").as("node"),
      (lit(1.0) / lit(nV.toDouble)).as("pr"))
    for (_ <- 0 until iters) {
      pr = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(wsum, Seq("src"))
        .select(col("dst").as("node"),
          floor(col("pr") * col("wq") / col("wtot") * lit(1e15) + lit(0.5))
            .cast("decimal(38,0)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
        .select(col("node"),
          (base + lit(d) * (col("csum").cast("double") / lit(1e15))).as("pr"))
    }
    val out = pr.localCheckpoint()
    edges.unpersist(); wsum.unpersist()
    out
  }

  /** Weighted-edge personalized PageRank — [[personalizedPageRank]]'s
    * seed-relative relevance with [[pageRankWeighted]]'s
    * weight-proportional spread: "which documents are most STRONGLY
    * related to these exemplars", the exemplar-neighborhood expansion
    * that respects similarity scores instead of flattening them.
    * Same sparse-frontier shape (rank frame = reached nodes only,
    * teleport only on seed rows) and the same integer-quantization
    * contract as both parents; caches released before return.
    */
  def personalizedPageRankWeighted(pairs: DataFrame, aCol: String, bCol: String,
                                   wCol: String, seeds: DataFrame, iters: Int = 3,
                                   dampNum: Int = 17, dampDen: Int = 20,
                                   weightScale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum && weightScale > 0,
      s"need iters >= 1, 0 < dampNum/dampDen < 1, weightScale > 0")
    val (edges, wsum) = weightedEdges(pairs, aCol, bCol, wCol, weightScale)
    val seedSet = seeds.toDF("node").distinct()
      .join(wsum.withColumnRenamed("src", "node"), Seq("node"), "left_semi")
      .persist()
    val nS = seedSet.count()
    require(nS > 0, "personalizedPageRankWeighted: no seed appears in the edge list")
    val d = dampNum.toDouble / dampDen.toDouble
    // adaptive local path: personalizedPageRank's sparse frontier with
    // pageRankWeighted's quantum, both mirrored exactly
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val wtot = new java.util.HashMap[Long, Long]()
      wsum.collect().foreach(r => wtot.put(r.getLong(0), r.getLong(1)))
      val seedL = new java.util.HashSet[Long]()
      seedSet.collect().foreach(r => { seedL.add(r.getLong(0)); () })
      edges.unpersist(); wsum.unpersist(); seedSet.unpersist()
      val baseL = (dampDen - dampNum).toDouble / (dampDen.toDouble * nS.toDouble)
      var prL = new java.util.HashMap[Long, Double]()
      val itS = seedL.iterator()
      while (itS.hasNext) prL.put(itS.next(), 1.0 / nS.toDouble)
      for (_ <- 0 until iters) {
        val csum = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst, wq) =>
          if (prL.containsKey(s)) {
            val c = java.math.BigDecimal.valueOf(
              math.floor(prL.get(s) * wq.toDouble / wtot.get(s).toDouble * 1e15 + 0.5))
            csum.merge(dst, c, _.add(_))
          }
        }
        val next = new java.util.HashMap[Long, Double]()
        val itC = csum.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          val b = if (seedL.contains(e.getKey)) baseL else 0.0
          next.put(e.getKey, b + d * (e.getValue.doubleValue() / 1e15))
        }
        val itSd = seedL.iterator()
        while (itSd.hasNext) {
          val sd = itSd.next()
          if (!next.containsKey(sd)) next.put(sd, baseL + d * 0.0)
        }
        prL = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val itP = prL.entrySet().iterator()
      while (itP.hasNext) { val e = itP.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "pr")
    }
    val base = lit((dampDen - dampNum).toDouble) / (lit(dampDen.toDouble) * lit(nS.toDouble))
    var pr = seedSet.select(col("node"), (lit(1.0) / lit(nS.toDouble)).as("pr"))
    for (_ <- 0 until iters) {
      val spread = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(wsum, Seq("src"))
        .select(col("dst").as("node"),
          floor(col("pr") * col("wq") / col("wtot") * lit(1e15) + lit(0.5))
            .cast("decimal(38,0)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
      pr = spread
        .join(seedSet.withColumn("_s", lit(1)), Seq("node"), "full")
        .select(col("node"),
          (when(col("_s").isNotNull, base).otherwise(lit(0.0))
            + lit(d) * (coalesce(col("csum").cast("double"), lit(0.0)) / lit(1e15)))
            .as("pr"))
    }
    val out = pr.localCheckpoint()
    edges.unpersist(); wsum.unpersist(); seedSet.unpersist()
    out
  }

  /** k-core decomposition membership (SURVEY.md §2 #30l): the maximal
    * subgraph where every vertex keeps degree ≥ k — the standard
    * "dense cluster vs stringy chain" separator over a similarity
    * graph (a boilerplate/template cluster is a high-k core; a chain
    * of borderline near-dup pairs dissolves). Returns each surviving
    * vertex with its degree INSIDE the core.
    *
    * The classic iterative peel, Spark-relational: each round is one
    * partial-agg degree count plus two left-semi joins pruning edges
    * whose endpoint fell under k — shuffles sized by the (shrinking)
    * edge list, `localCheckpoint` truncating lineage per round (the
    * components pattern: without it round r replans r copies of the
    * upstream candidate-pair pipeline). Rounds are bounded by the peel
    * depth of the graph, NOT its size (a vertex only peels when a
    * neighbor's loss drops it below k); the one count() per round is
    * the convergence probe. Fails loudly if maxIter rounds don't
    * converge — a silent partial peel would overstate the core.
    */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
            maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = pairs.sparkSession
    var edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var n = edges.count()
    // adaptive local path: integer peel, rounds and outputs mirror the
    // distributed loop exactly (triangleCounts rationale)
    val gate = localEdgeGate(spark)
    if (gate > 0 && longCols(pairs, aCol, bCol) && n <= gate) {
      var es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      var itL = 0
      var conv = es.isEmpty
      while (!conv && itL < maxIter) {
        val deg = new java.util.HashMap[Long, Long]()
        es.foreach { case (s, _) => deg.merge(s, 1L, _ + _) }
        val pruned = es.filter { case (s, d) =>
          deg.getOrDefault(s, 0L) >= k && deg.getOrDefault(d, 0L) >= k }
        conv = pruned.length == es.length
        es = pruned; itL += 1
      }
      require(conv, s"kCore($k) did not converge within $maxIter peel rounds")
      val deg = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => deg.merge(s, 1L, _ + _) }
      import spark.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val itr = deg.entrySet().iterator()
      while (itr.hasNext) { val e = itr.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "core_degree")
    }
    var it = 0
    var converged = n == 0
    while (!converged && it < maxIter) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val pruned = edges
        .join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint()
      val n2 = pruned.count()
      converged = n2 == n
      edges = pruned; n = n2; it += 1
    }
    require(converged, s"kCore($k) did not converge within $maxIter peel rounds")
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  // -----------------------------------------------------------------
  // Exact local small-graph fast path (the Dedup.components adaptive
  // union-find precedent, generalized to the integer graph kernels).
  //
  // Every operator below consumes a DERIVED pair list (bucket-capped
  // candidate pairs) that is orders of magnitude smaller than the
  // corpus. When that list fits the driver comfortably, the
  // distributed peel/wedge rounds are pure scheduling overhead: at
  // sf0.1, kTruss ran 108 jobs (~30 peel rounds × 3-4 actions) and
  // triangleCounts 57 jobs/1205 tasks for an 11k-edge graph a single
  // core closes in milliseconds. The kernels are integer fixpoints
  // (counts, supports, peels) with at most one mirrored double
  // expression at the very end, so the local form reproduces the
  // distributed outputs EXACTLY (property-tested both ways).
  //
  // Gate: conf "graft.graph.localEdgeGate" (edges; default 2e6 ≈
  // 32 MB of id pairs — the broadcast-side budget class, far under the
  // 8 GB broadcast cap; "0" disables — the scale posture stays: above
  // the gate, or for non-LONG ids, the distributed rounds run
  // unchanged, and every local kernel below does strictly less work
  // than the distributed plan materializes as rows). Each kernel gates
  // on the row count it actually collects (symmetrized for the wedge
  // kernels, canonical undirected for modularity), so the budget is
  // uniform per collect. Integer arithmetic stays exact at this gate —
  // louvain's largest products (m2·e_ic ≤ gate²) are long-exact up to a
  // ~3e9 gate; assortativity's cubic moment sums bind FIRST and that
  // kernel clamps its own local path to 3e6 independently of the conf.
  // -----------------------------------------------------------------

  private def localEdgeGate(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("graft.graph.localEdgeGate", "2000000").toLong

  private def longCols(df: DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType == org.apache.spark.sql.types.LongType)

  /** Enumerate every triangle of the undirected graph given by
    * `edges` (SYMMETRIZED distinct directed pairs) exactly once via
    * the same Schank–Wagner (degree, id) orientation the distributed
    * plan uses, calling `emit(a, b, c)` with a the orientation-
    * smallest vertex and (b, c) in orientation order. Degrees count
    * self-loops (they are in the symmetric edge set) but self-loops
    * never orient, exactly like the distributed filter.
    */
  private def localTriangles(edges: Array[(Long, Long)])
                            (emit: (Long, Long, Long) => Unit): Unit = {
    val deg = new java.util.HashMap[Long, Long]()
    edges.foreach { case (s, _) => deg.merge(s, 1L, _ + _) }
    @inline def less(x: Long, y: Long): Boolean = {
      val dx = deg.get(x); val dy = deg.get(y)
      dx < dy || (dx == dy && x < y)
    }
    val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    // closure probes need a set keyed on the PAIR; ids are arbitrary
    // longs, so probe a set of (b, c) tuples
    val orientedPairs = new java.util.HashSet[(Long, Long)]()
    edges.foreach { case (s, d) =>
      if (s != d && less(s, d)) {
        var buf = adj.get(s)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Long]; adj.put(s, buf) }
        buf += d
        orientedPairs.add((s, d))
        ()
      }
    }
    val it = adj.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val a = e.getKey
      val nbrs = e.getValue.sortWith(less)
      var i = 0
      while (i < nbrs.length) {
        var j = i + 1
        val b = nbrs(i)
        while (j < nbrs.length) {
          val c = nbrs(j)
          if (orientedPairs.contains((b, c))) emit(a, b, c)
          j += 1
        }
        i += 1
      }
    }
  }

  /** Exact triangle count per vertex over an undirected pair list —
    * the local clustering signal (a near-dup pair embedded in many
    * triangles sits in a dense template/boilerplate cluster; an
    * isolated pair is a one-off). Returns (node, n_triangles) for
    * every vertex on at least one triangle, plus the global count as
    * a column (same value every row — keeps the output one frame).
    *
    * The naive edge³ self-join is quadratic in the max degree. The
    * standard fix (Schank/Wagner degree orientation): orient every
    * edge from the endpoint with (degree, id)-smaller to the larger —
    * an acyclic tournament where each triangle appears EXACTLY ONCE as
    * a wedge a→b, a→c (a the smallest) closed by b→c. Out-degrees in
    * the oriented graph are bounded by √(2·|E|) for ANY degree
    * distribution — a Zipf-hot hub's edges point INTO it, so the
    * wedge fan-out per vertex stays sub-quadratic; wedge generation
    * is a self-join on the oriented source and the close check is a
    * plain hash semi-join against the oriented edge set.
    */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    // persisted like components' pair list: the edge list is the small
    // derived artifact (candidate pairs), and it feeds degrees, both
    // orientation joins, and the wedge closure — without the persist
    // each reference re-runs the full upstream candidate pipeline
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path: the count materializes the persist either
    // way (the distributed branch reuses it for free)
    val gate = localEdgeGate(spark)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val tri = new java.util.HashMap[Long, Long]()
      var total = 0L
      localTriangles(es) { (a, b, c) =>
        tri.merge(a, 1L, _ + _); tri.merge(b, 1L, _ + _); tri.merge(c, 1L, _ + _)
        total += 1
      }
      import spark.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val it = tri.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); rows += ((e.getKey, e.getValue, total)) }
      return rows.toSeq.toDF("node", "n_triangles", "total_triangles")
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): strict total order → acyclic
    val oriented = edges
      .join(deg.withColumnRenamed("src", "src_").withColumnRenamed("deg", "ds"),
        col("src") === col("src_")).drop("src_")
      .join(deg.withColumnRenamed("src", "dst_").withColumnRenamed("deg", "dd"),
        col("dst") === col("dst_")).drop("dst_")
      .filter(col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("dd").as("dg"))
    // wedge pair ordered by the SAME (deg, id) orientation key, so the
    // closing edge — if it exists — is oriented exactly b→c
    val wedges = oriented.select(col("src").as("a"), col("dst").as("b"), col("dg").as("bg"))
      .join(oriented.select(col("src").as("a"), col("dst").as("c"), col("dg").as("cg")), Seq("a"))
      .filter(col("bg") < col("cg") || (col("bg") === col("cg") && col("b") < col("c")))
      .select("a", "b", "c")
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    // node-sized checkpoint FIRST: `tris` was referenced twice (the
    // per-node agg and the global count), so the whole oriented-wedge
    // subtree evaluated twice per query; the global count is the exact
    // integer sum(n_triangles) DIV 3 over the checkpointed per-node
    // frame (each triangle contributes once to each of its 3 corners),
    // so the second wedge pass disappears outright (2 subtree
    // evaluations → 1; plan pins in plans/r10/)
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .localCheckpoint()
    val out = perNode.crossJoin(broadcast(perNode.agg(
      expr("CAST(SUM(n_triangles) DIV 3 AS BIGINT)").as("total_triangles"))))
    edges.unpersist()
    out
  }

  /** Local clustering coefficient per node: cc(v) = 2·T(v)/(deg(v)·
    * (deg(v)−1)) — the closed-wedge share, the standard "how clique-
    * like is this node's neighborhood" signal (Watts–Strogatz): near 1
    * inside near-duplicate clusters, near 0 on hub/bridge nodes —
    * which is exactly how it separates genuine dup clusters from
    * LSH-bucket hubs in the similarity graph that [[triangleCounts]]
    * only scores globally.
    *
    * Same plan as triangleCounts (one persisted symmetrized edge
    * artifact, (deg,id) orientation, √(2E)-bounded wedge fan-out,
    * hash-join closure) plus ONE left join of the degree table onto
    * per-node triangle counts — everything edge-list-sized. Triangle
    * counts are exact longs; cc is one mirrored double expression
    * rounded 1e-9; deg < 2 emits NULL (undefined, not zero — a leaf
    * is not "perfectly unclustered").
    * Output: (node, deg, n_triangles, cc).
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path (triangleCounts rationale); cc mirrors the
    // distributed double expression exactly: (2.0·T)/(d·(d−1.0)) then
    // Round's own double path, BigDecimal.valueOf(x).setScale(9, HALF_UP)
    val gate = localEdgeGate(spark)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      val tri = new java.util.HashMap[Long, Long]()
      localTriangles(es) { (a, b, c) =>
        tri.merge(a, 1L, _ + _); tri.merge(b, 1L, _ + _); tri.merge(c, 1L, _ + _)
        ()
      }
      import spark.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Option[Double])]
      val it = degL.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val node = e.getKey; val d = e.getValue
        val t = tri.getOrDefault(node, 0L)
        val cc = if (d >= 2)
          Some(java.math.BigDecimal.valueOf(
              (2.0 * t.toDouble) / (d.toDouble * (d.toDouble - 1.0)))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
        else None
        rows += ((node, d, t, cc))
      }
      return rows.toSeq.toDF("node", "deg", "n_triangles", "cc")
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.withColumnRenamed("src", "src_").withColumnRenamed("deg", "ds"),
        col("src") === col("src_")).drop("src_")
      .join(deg.withColumnRenamed("src", "dst_").withColumnRenamed("deg", "dd"),
        col("dst") === col("dst_")).drop("dst_")
      .filter(col("ds") < col("dd") || (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("dd").as("dg"))
    val wedges = oriented.select(col("src").as("a"), col("dst").as("b"), col("dg").as("bg"))
      .join(oriented.select(col("src").as("a"), col("dst").as("c"), col("dg").as("cg")), Seq("a"))
      .filter(col("bg") < col("cg") || (col("bg") === col("cg") && col("b") < col("c")))
      .select("a", "b", "c")
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val dd = col("deg").cast("double")
    val out = deg.withColumnRenamed("src", "node")
      .join(perNode, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("cc", when(col("deg") >= 2,
        round(lit(2.0) * col("n_triangles").cast("double") / (dd * (dd - lit(1.0))), 9)))
      .select("node", "deg", "n_triangles", "cc")
      .localCheckpoint() // node-sized; then release the edge cache
    edges.unpersist()
    out
  }

  /** [[clusteringCoefficient]] over a PRECOMPUTED per-node triangle
    * frame + degree table — a pipeline that already ran
    * [[triangleCounts]] must not pay the oriented-wedge join twice
    * (it dominates both operators' cost). `triangles` is (node,
    * n_triangles) — exactly [[triangleCounts]]' output columns; nodes
    * absent from it count zero. `degrees` is (node, deg) over the SAME
    * symmetrized-distinct edge set. Property-equal to the
    * self-computing form; two node-sized frames in, one node-sized
    * join — no edge-sized work at all.
    */
  def clusteringCoefficient(triangles: DataFrame, degrees: DataFrame): DataFrame = {
    val dd = col("deg").cast("double")
    degrees.select(col("node"), col("deg"))
      .join(triangles.select(col("node"), col("n_triangles")), Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("cc", when(col("deg") >= 2,
        round(lit(2.0) * col("n_triangles").cast("double") / (dd * (dd - lit(1.0))), 9)))
      .select("node", "deg", "n_triangles", "cc")
  }

  /** Resource-allocation link prediction (Zhou–Lü–Zhang): for every
    * non-adjacent pair (u,v) sharing at least one neighbor, the RA
    * index Σ_{w ∈ N(u)∩N(v)} 1/deg(w) — the "which links are missing"
    * ranker over a similarity graph (candidate duplicate pairs the
    * bucketing step missed; suggested merges in an entity graph). RA
    * over Adamic–Adar deliberately: 1/deg keeps the statistic in
    * EXACT integer arithmetic (each term quantizes as 10⁹ div deg, so
    * the score is an order-insensitive integer sum), while 1/ln(deg)
    * would hang the result on last-ulp libm agreement across engines.
    *
    * Scale shape: candidate pairs enumerate through the COMMON
    * NEIGHBOR — a self-join of the adjacency list keyed on w, cost
    * Σ_w deg(w)², never all-pairs. A Zipf hub is exactly the w whose
    * deg² explodes AND whose 1/deg contribution is negligible, so
    * common neighbors above `maxDeg` are excluded (documented model
    * parameter, mirrored in the oracle — each excluded hub changes a
    * pair's score by < 10⁹/maxDeg). Known edges drop via one
    * left-anti join onto the symmetrized edge list; degrees and
    * adjacency come from the one persisted edge artifact.
    *
    * Output: (node_a, node_b, cn, ra_q) with node_a < node_b, cn the
    * common-neighbor count (capped set), ra_q the integer-quantized
    * RA score.
    */
  def raLinkPrediction(pairs: DataFrame, aCol: String, bCol: String,
                       maxDeg: Long = 1000L): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // adaptive local path (jaccardLinkPrediction rationale): counts and
    // the 1e9 div deg shares are pure integers
    val gateR = localEdgeGate(pairs.sparkSession)
    if (gateR > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gateR) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      val edgeSet = new java.util.HashSet[(Long, Long)]()
      es.foreach { e => edgeSet.add(e); () }
      val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (w, u) =>
        if (degL.get(w) <= maxDeg) {
          var buf = adj.get(w)
          if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Long]; adj.put(w, buf) }
          buf += u
        }
      }
      val cnL = new java.util.HashMap[(Long, Long), (Long, Long)]() // (cn, ra_q)
      val itW = adj.entrySet().iterator()
      while (itW.hasNext) {
        val e = itW.next()
        val share = 1000000000L / degL.get(e.getKey)
        val nbrs = e.getValue
        var i = 0
        while (i < nbrs.length) {
          var j = 0
          val u = nbrs(i)
          while (j < nbrs.length) {
            val v = nbrs(j)
            if (u < v) {
              val cur = cnL.get((u, v))
              if (cur == null) cnL.put((u, v), (1L, share))
              else cnL.put((u, v), (cur._1 + 1L, cur._2 + share))
            }
            j += 1
          }
          i += 1
        }
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      val itC = cnL.entrySet().iterator()
      while (itC.hasNext) {
        val e = itC.next()
        val (u, v) = e.getKey
        if (!edgeSet.contains((u, v))) rows += ((u, v, e.getValue._1, e.getValue._2))
      }
      return rows.toSeq.toDF("node_a", "node_b", "cn", "ra_q")
    }
    // adjacency keyed by the COMMON neighbor w: (w, u, 1e9 div deg(w))
    val nbr = edges.join(deg, Seq("src"))
      .filter(col("deg") <= maxDeg)
      .select(col("src").as("w"), col("dst").as("u"),
        // `div`, not `/`: integer division (Spark `/` is double even on longs)
        expr("1000000000L div deg").as("share"))
    val cand = nbr.select(col("w"), col("u"), col("share"))
      .join(nbr.select(col("w"), col("u").as("v"), col("share").as("_s2")), Seq("w"))
      .filter(col("u") < col("v"))
    val scored = cand.groupBy(col("u").as("node_a"), col("v").as("node_b"))
      .agg(count(lit(1)).as("cn"), sum(col("share")).as("ra_q"))
    // output-sized checkpoint (what the caller materializes anyway),
    // then edge-cache release (modularity pattern)
    val out = scored.join(edges.select(col("src").as("node_a"), col("dst").as("node_b")),
      Seq("node_a", "node_b"), "left_anti").localCheckpoint()
    edges.unpersist()
    out
  }

  /** Synchronous label propagation (fixed rounds, deterministic): each
    * node adopts the most frequent label among its neighbors, ties to
    * the SMALLEST label — community detection over the similarity
    * graph, the density-free companion to [[kCore]] (which thresholds)
    * and Dedup.components (which merges ANY connectivity): LPA splits a
    * barbell the bridge edge would glue into one component. Fixed
    * iteration count (like [[pageRank]]) rather than
    * convergence-probing: sync LPA can oscillate on bipartite-ish
    * structures, and a fixed unrollable round count is what an oracle
    * can replay.
    *
    * Scale shape per round: one edge⨝label hash join + one
    * (node, label) partial agg + one per-node argmax window — the
    * window sees DISTINCT NEIGHBOR LABELS per node (bounded by degree,
    * collapsing as communities form), with WindowGroupLimit pushdown
    * on the rn = 1 filter. `localCheckpoint` truncates lineage per
    * round (the components pattern). Labels init to the node id, so
    * output labels are canonical member ids.
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path (triangleCounts rationale): frequency votes
    // and the (count desc, label asc) argmax are pure integers
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      var lab = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => lab.put(s, s) }
      for (_ <- 0 until iters) {
        val cnt = new java.util.HashMap[(Long, Long), Long]()
        es.foreach { case (s, d) => cnt.merge((s, lab.get(d)), 1L, _ + _) }
        val best = new java.util.HashMap[Long, (Long, Long)]() // node → (c, label)
        val itC = cnt.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          val (node, l) = e.getKey; val c = e.getValue
          val cur = best.get(node)
          if (cur == null || c > cur._1 || (c == cur._1 && l < cur._2))
            best.put(node, (c, l))
        }
        val next = new java.util.HashMap[Long, Long]()
        val itB = best.entrySet().iterator()
        while (itB.hasNext) { val e = itB.next(); next.put(e.getKey, e.getValue._2) }
        lab = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val itL = lab.entrySet().iterator()
      while (itL.hasNext) { val e = itL.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "label")
    }
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 0 until iters) {
      val counts = edges
        .join(labels.select(col("node").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src").as("node"), col("nl").as("label"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("node").orderBy(col("c").desc, col("label"))
      labels = counts.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).select("node", "label")
        .localCheckpoint()
    }
    edges.unpersist() // labels are already checkpointed — no edge ref left
    labels
  }

  /** Synchronous Louvain local-move rounds (Blondel et al. 2008, the
    * one-level move phase): each node adopts the neighbor community
    * with the best modularity gain — the QUALITY-DRIVEN community
    * refiner between [[labelPropagation]] (frequency votes, no
    * objective) and [[modularity]] (grades a labeling but doesn't
    * produce one). Labels init to node ids; `rounds` synchronous
    * sweeps; feed the result to [[modularity]] to read the score.
    *
    * Exactness: the gain comparison is EXACT INTEGER arithmetic — for
    * node i and candidate community c, ΔQ·2m² ∝ score(c) = 2m·e_{i→c}
    * − k_i·d'_c (d'_c excludes i's own degree when c is its current
    * community), all from exact long partial aggs, products in
    * DECIMAL(38,0); argmax ties break to the SMALLEST community id
    * (pure (score desc, id) — deterministic and engine-portable, no
    * incumbency bias). The node's own community is always a candidate
    * (e_{i→own} ≥ 0), so an isolated-in-community node may stay.
    *
    * Scale shape per round: one community-degree partial agg, one
    * edge⋈label join + (node, community) partial agg (rows ≤ edge
    * list), three hash joins onto the candidate table, one per-node
    * argmax window bounded by the node's DISTINCT NEIGHBOR COMMUNITY
    * count (collapsing as communities form); localCheckpoint cuts
    * lineage per round (labels feed three consumers); the 2m total is
    * one scalar. Caches released before return.
    */
  def louvainMove(pairs: DataFrame, aCol: String, bCol: String,
                  rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val m2 = edges.count() // Σk_i = 2m — scalar model artifact
    require(m2 > 0, "louvainMove: empty edge list")
    // adaptive local path (labelPropagation rationale): the gain argmax
    // is exact integer arithmetic — every product m2·e_ic and k_i·d'_c
    // is ≤ m2², i.e. ≤ 4e12 at the default 2e6 gate (long-exact up to a
    // ~3e9 gate), so the local scores equal the DECIMAL(38,0) plan's
    // values identically
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && m2 <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist(); deg.unpersist()
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      var labL = new java.util.HashMap[Long, Long]()
      val itN = degL.keySet().iterator()
      while (itN.hasNext) { val n = itN.next(); labL.put(n, n) }
      for (_ <- 0 until rounds) {
        val dtot = new java.util.HashMap[Long, Long]() // community → Σ deg
        val itD = degL.entrySet().iterator()
        while (itD.hasNext) {
          val e = itD.next()
          dtot.merge(labL.get(e.getKey), e.getValue, _ + _)
        }
        // candidate links e_{i→c}; own community always a candidate at ≥0
        val eic = new java.util.HashMap[(Long, Long), Long]()
        es.foreach { case (s, d) => eic.merge((s, labL.get(d)), 1L, _ + _) }
        val itO = labL.entrySet().iterator()
        while (itO.hasNext) {
          val e = itO.next()
          eic.merge((e.getKey, e.getValue), 0L, math.max)
        }
        val best = new java.util.HashMap[Long, (Long, Long)]() // node → (score, c)
        val itC = eic.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          val (node, c) = e.getKey
          val own = labL.get(node)
          val dAdj = dtot.get(c) - (if (own == c) degL.get(node) else 0L)
          val score = m2 * e.getValue - degL.get(node) * dAdj
          val cur = best.get(node)
          if (cur == null || score > cur._1 || (score == cur._1 && c < cur._2))
            best.put(node, (score, c))
        }
        val next = new java.util.HashMap[Long, Long]()
        val itB = best.entrySet().iterator()
        while (itB.hasNext) { val e = itB.next(); next.put(e.getKey, e.getValue._2) }
        labL = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val itL = labL.entrySet().iterator()
      while (itL.hasNext) { val e = itL.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "community")
    }
    var lab = deg.select(col("src").as("node"), col("src").as("community"))
    for (_ <- 0 until rounds) {
      val dc = lab.join(deg.withColumnRenamed("src", "node"), Seq("node"))
        .groupBy("community").agg(sum("deg").as("dtot"))
      val links = edges
        .join(lab.select(col("node").as("dst"), col("community").as("c")), Seq("dst"))
        .groupBy(col("src").as("node"), col("c"))
        .agg(count(lit(1)).as("e_ic"))
      // own community is always a candidate (e defaults 0; max-merges
      // with the real link count when internal neighbors exist)
      val own = lab.select(col("node"), col("community").as("c"), lit(0L).as("e_ic"))
      val cand = links.unionByName(own)
        .groupBy("node", "c").agg(max("e_ic").as("e_ic"))
        .join(deg.withColumnRenamed("src", "node"), Seq("node"))
        .join(dc.withColumnRenamed("community", "c"), Seq("c"))
        .join(lab, Seq("node"))
        .withColumn("score",
          lit(m2).cast("decimal(38,0)") * col("e_ic")
            - col("deg").cast("decimal(38,0)")
              * (col("dtot") - when(col("community") === col("c"), col("deg"))
                  .otherwise(lit(0L))))
      lab = cand.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("node").orderBy(col("score").desc, col("c"))))
        .filter(col("_rn") === 1)
        .select(col("node"), col("c").as("community"))
        .localCheckpoint()
    }
    edges.unpersist(); deg.unpersist()
    lab
  }

  /** Newman modularity of a community labeling over an undirected
    * graph: Q = Σ_c (e_c/m − (d_c/(2m))²) — the standard "is this
    * partition better than chance" score that closes the community
    * loop ([[labelPropagation]] / Dedup.components propose labels;
    * modularity grades them). Q ∈ [−½, 1); ≳0.3 is conventionally
    * "real community structure".
    *
    * Input edges are canonicalized (min,max), self-loops dropped,
    * duplicates collapsed; nodes absent from `labels` fall back to
    * their own singleton community (they contribute degree but no
    * internal edges — the conservative read).
    *
    * Exactness: m, e_c, d_c are exact longs from partial aggs; each
    * community's term evaluates in doubles from those integers in one
    * oracle-mirrored op order and quantizes to DECIMAL(20,9) before
    * the final sum (the entropy rule); modularity rounds at 1e-6.
    *
    * Scale shape: everything is edge-list-sized — one distinct, one
    * explode+partial-agg for degrees, two label hash joins, two
    * community-sized aggs. No windows, no per-row state.
    */
  def modularity(pairs: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, nodeCol: String = "node",
                 communityCol: String = "community"): DataFrame = {
    val spark = pairs.sparkSession
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lab = labels.select(col(nodeCol).as("_ln"), col(communityCol).as("_lc"))
    // Singleton fallback keys are TYPE-TAGGED ("L:" label vs "N:" node)
    // so an unlabeled node whose id happens to equal an existing
    // community label (common: labelPropagation/components emit
    // communities that ARE node ids) stays a genuine singleton instead
    // of silently merging into that community and skewing d_tot/e_in.
    // The tag is internal — the output carries counts, never keys.
    def ckey(labC: org.apache.spark.sql.Column,
             nodeC: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(concat(lit("L:"), labC), concat(lit("N:"), nodeC))
    // degree sum per community: explode endpoints, count, label
    val dC = e.select(col("a").as("_nd")).unionByName(e.select(col("b").as("_nd")))
      .groupBy(col("_nd")).agg(count(lit(1)).as("_deg"))
      .join(lab.withColumnRenamed("_ln", "_nd"), Seq("_nd"), "left")
      .groupBy(ckey(col("_lc"), col("_nd")).as("_c"))
      .agg(sum("_deg").as("d_tot"), count(lit(1)).as("n_nodes"))
    // internal edges per community: both endpoints in the same label
    val eC = e
      .join(lab.select(col("_ln").as("a"), col("_lc").as("_ca")), Seq("a"), "left")
      .join(lab.select(col("_ln").as("b"), col("_lc").as("_cb")), Seq("b"), "left")
      .filter(ckey(col("_ca"), col("a")) === ckey(col("_cb"), col("b")))
      .groupBy(ckey(col("_ca"), col("a")).as("_c"))
      .agg(count(lit(1)).as("e_in"))
    val m = e.count() // materializes the persisted edge list
    // adaptive local path (triangleCounts rationale): every community
    // aggregate is an exact integer count and the per-community term is
    // ONE mirrored double expression quantized through Spark's own
    // double→DECIMAL(20,9) path (BigDecimal.valueOf = Double.toString),
    // so the local fold is bit-identical to the distributed plan
    val gate = localEdgeGate(spark)
    val localOk = gate > 0 && m <= gate && longCols(pairs, aCol, bCol) &&
      labels.columns.contains(nodeCol) && labels.columns.contains(communityCol) &&
      longCols(labels, nodeCol, communityCol)
    // the label collect (and the duplicate check below) happens BEFORE
    // the edge cache is released, so a fallback to the distributed
    // branch re-reads the cache, not the upstream pipeline
    if (localOk) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      // only graph nodes' labels are needed: the node set is already in
      // memory, so it semi-joins the label table as a broadcast local
      // relation — the collect stays inside the gate budget even when
      // the label table itself is corpus-sized
      val nodeSet = new java.util.HashSet[java.lang.Long]()
      es.foreach { case (a, b) => nodeSet.add(a); nodeSet.add(b); () }
      import spark.implicits._
      val nodesDf = scala.jdk.CollectionConverters
        .SetHasAsScala(nodeSet).asScala.toSeq.map(_.longValue).toDF("_n")
      // a node with MORE THAN ONE label row fans the distributed joins
      // out (degree counted once per label row) — a map cannot mirror
      // that, so duplicate labels fall back to the distributed branch
      // instead of silently diverging. The duplicate census runs
      // CLUSTER-SIDE (one aggregated row per graph node), so the
      // driver collect is bounded by the edge gate even when the label
      // table itself is pathologically duplicated (one row per event).
      val labRows = lab.join(broadcast(nodesDf), col("_ln") === col("_n"))
        .groupBy(col("_ln"))
        .agg(count(lit(1)).as("_cnt"), max(col("_lc")).as("_lcv"))
        .collect()
      val labMap = new java.util.HashMap[Long, java.lang.Long]()
      var dupLabel = false
      labRows.foreach { r =>
        if (!r.isNullAt(0)) {
          val n = r.getLong(0)
          if (r.getLong(1) > 1L) dupLabel = true
          labMap.put(n,
            if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))
        }
      }
      if (!dupLabel) {
      e.unpersist()
      if (es.isEmpty) // the empty agg row of the distributed plan
        return Seq((0L, 0L, None: Option[Double]))
          .toDF("m", "n_communities", "modularity")
      // community key: ("L", label) when labeled, ("N", node) singleton
      // fallback — the tuple form of the type-tagged ckey string
      def key(n: Long): (Boolean, Long) = {
        val c = labMap.get(n)
        if (c != null) (true, c.longValue) else (false, n)
      }
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (a, b) =>
        degL.merge(a, 1L, _ + _); degL.merge(b, 1L, _ + _)
      }
      val dTot = new java.util.HashMap[(Boolean, Long), Long]()
      val itD = degL.entrySet().iterator()
      while (itD.hasNext) {
        val en = itD.next(); dTot.merge(key(en.getKey), en.getValue, _ + _)
      }
      val eIn = new java.util.HashMap[(Boolean, Long), Long]()
      es.foreach { case (a, b) =>
        val ka = key(a); if (ka == key(b)) eIn.merge(ka, 1L, _ + _)
      }
      import java.math.{BigDecimal => JBD, RoundingMode => RM}
      val dmL = m.toDouble
      var acc = JBD.ZERO
      val itC = dTot.entrySet().iterator()
      var nComm = 0L
      while (itC.hasNext) {
        val en = itC.next(); nComm += 1
        val ein = eIn.getOrDefault(en.getKey, 0L)
        val half = en.getValue.toDouble / (2.0 * dmL)
        val term = ein.toDouble / dmL - half * half
        acc = acc.add(JBD.valueOf(term).setScale(9, RM.HALF_UP))
      }
      val mod = JBD.valueOf(acc.doubleValue).setScale(6, RM.HALF_UP).doubleValue
      return Seq((m, nComm, Some(mod): Option[Double]))
        .toDF("m", "n_communities", "modularity")
      } // !dupLabel — duplicate labels fall through to the distributed aggs
    }
    val dm = lit(m).cast("double")
    val term = (col("e_in").cast("double") / dm
      - (col("d_tot").cast("double") / (lit(2.0) * dm)) * (col("d_tot").cast("double") / (lit(2.0) * dm)))
      .cast("decimal(20,9)")
    // single-row result checkpointed EAGERLY so the edge cache can be
    // released before return (a lazy result would recompute e cold)
    val out = dC.join(eC, Seq("_c"), "left")
      .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
      .withColumn("_term", term)
      .agg(lit(m).as("m"), count(lit(1)).as("n_communities"),
           round(sum(col("_term")).cast("double"), 6).as("modularity"))
      .localCheckpoint()
    e.unpersist()
    out
  }

  /** Jaccard-coefficient link prediction: for non-adjacent vertex
    * pairs sharing ≥1 common neighbor, |N(a)∩N(b)| / |N(a)∪N(b)| —
    * the NORMALIZED companion to [[raLinkPrediction]] (RA weights
    * common neighbors by rarity and favors hub-adjacent pairs; the
    * Jaccard score is degree-penalized, so two low-degree documents
    * sharing most of their neighborhoods outrank two hubs sharing a
    * few). Candidate generation is the same common-neighbor wedge
    * enumeration, HUB-CAPPED at `maxDeg` (a corpus-scaled hub would
    * otherwise emit deg² wedges; its common-neighbor evidence is
    * near-zero Jaccard anyway — the documented RA contract). Union
    * sizes use FULL degrees: |N(a)∪N(b)| = deg(a) + deg(b) − cn.
    *
    * Exactness: cn and degrees are exact longs; jaccard is ONE double
    * division, rounded 1e-9. Scale shape: the RA shape exactly —
    * degree partial agg, wedge self-join keyed by the common
    * neighbor, pair partial agg, two degree hash joins, one anti-join
    * against the edge set.
    */
  def jaccardLinkPrediction(pairs: DataFrame, aCol: String, bCol: String,
                            maxDeg: Long = 1000L): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path (triangleCounts rationale): common-neighbor
    // counts are integers; jaccard is the same mirrored round-9 ratio
    val gateJ = localEdgeGate(pairs.sparkSession)
    if (gateJ > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gateJ) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      val edgeSet = new java.util.HashSet[(Long, Long)]()
      es.foreach { e => edgeSet.add(e); () }
      val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (w, u) =>
        if (degL.get(w) <= maxDeg) {
          var buf = adj.get(w)
          if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Long]; adj.put(w, buf) }
          buf += u
        }
      }
      val cnL = new java.util.HashMap[(Long, Long), Long]()
      val itW = adj.values().iterator()
      while (itW.hasNext) {
        val nbrs = itW.next()
        var i = 0
        while (i < nbrs.length) {
          var j = 0
          val u = nbrs(i)
          while (j < nbrs.length) {
            val v = nbrs(j)
            if (u < v) cnL.merge((u, v), 1L, _ + _)
            j += 1
          }
          i += 1
        }
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
      val itC = cnL.entrySet().iterator()
      while (itC.hasNext) {
        val e = itC.next()
        val (u, v) = e.getKey; val c = e.getValue
        if (!edgeSet.contains((u, v))) {
          val un = degL.get(u) + degL.get(v) - c
          val jac = java.math.BigDecimal.valueOf(c.toDouble / un.toDouble)
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
          rows += ((u, v, c, un, jac))
        }
      }
      return rows.toSeq.toDF("node_a", "node_b", "cn", "n_union", "jaccard")
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nbr = edges.join(deg, Seq("src"))
      .filter(col("deg") <= maxDeg)
      .select(col("src").as("w"), col("dst").as("u"))
    val cand = nbr
      .join(nbr.select(col("w"), col("u").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
    val cn = cand.groupBy(col("u").as("node_a"), col("v").as("node_b"))
      .agg(count(lit(1)).as("cn"))
    // output-sized checkpoint then edge-cache release (modularity
    // pattern — r7 left this operator's edge persist unreleased)
    val out = cn
      .join(edges.select(col("src").as("node_a"), col("dst").as("node_b")),
        Seq("node_a", "node_b"), "left_anti")
      .join(deg.select(col("src").as("node_a"), col("deg").as("_da")), Seq("node_a"))
      .join(deg.select(col("src").as("node_b"), col("deg").as("_db")), Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("cn"),
        (col("_da") + col("_db") - col("cn")).as("n_union"),
        round(col("cn").cast("double")
          / (col("_da") + col("_db") - col("cn")).cast("double"), 9).as("jaccard"))
      .localCheckpoint()
    edges.unpersist()
    out
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass
    * restricted to a SEED SET — "which documents are most related to
    * THESE exemplars through the similarity graph?", the standard
    * seed-based corpus-expansion primitive (grow a curated domain
    * from a hand-picked nucleus; rank candidates for a target mix).
    * Uniform PageRank answers global importance; PPR answers
    * importance RELATIVE to the seeds.
    *
    * Same arithmetic contract as pageRank: rational damping, per-edge
    * contributions quantized DECIMAL(30,15) pre-sum, fixed `iters`
    * the oracle unrolls. The rank frame stays SPARSE — only nodes
    * with mass appear (mass reaches exactly the ≤iters-hop
    * neighborhood of the seeds), so each round's join is sized by the
    * reached frontier, not the graph; teleport adds base only on seed
    * rows (left join against the broadcast seed set). Nodes never
    * reached simply don't appear (ppr = 0 implicitly).
    *
    * @param seeds one-column frame of seed node ids (deduplicated
    *              here; must be nonempty)
    */
  def personalizedPageRank(pairs: DataFrame, aCol: String, bCol: String,
                           seeds: DataFrame, iters: Int = 3,
                           dampNum: Int = 17, dampDen: Int = 20): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum,
      s"need iters >= 1 and 0 < dampNum/dampDen < 1")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val seedSet = seeds.toDF("node").distinct()
      .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left_semi")
      .persist()
    val nS = seedSet.count() // scalar model artifact, the pageRank nV pattern
    require(nS > 0, "personalizedPageRank: no seed appears in the edge list")
    val d = dampNum.toDouble / dampDen.toDouble
    // adaptive local path (pageRank rationale); same sparse-frontier
    // semantics: rank map holds exactly spread ∪ seed nodes per round
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      val seedL = new java.util.HashSet[Long]()
      seedSet.collect().foreach(r => { seedL.add(r.getLong(0)); () })
      edges.unpersist(); deg.unpersist(); seedSet.unpersist()
      val baseL = (dampDen - dampNum).toDouble / (dampDen.toDouble * nS.toDouble)
      var prL = new java.util.HashMap[Long, Double]()
      val itS = seedL.iterator()
      while (itS.hasNext) prL.put(itS.next(), 1.0 / nS.toDouble)
      for (_ <- 0 until iters) {
        val csum = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst) =>
          if (prL.containsKey(s)) {
            val c = java.math.BigDecimal.valueOf(
              math.floor(prL.get(s) / degL.get(s).toDouble * 1e15 + 0.5))
            csum.merge(dst, c, _.add(_))
          }
        }
        val next = new java.util.HashMap[Long, Double]()
        val itC = csum.entrySet().iterator()
        while (itC.hasNext) {
          val e = itC.next()
          val b = if (seedL.contains(e.getKey)) baseL else 0.0
          next.put(e.getKey, b + d * (e.getValue.doubleValue() / 1e15))
        }
        val itSd = seedL.iterator()
        while (itSd.hasNext) {
          val sd = itSd.next()
          if (!next.containsKey(sd)) next.put(sd, baseL + d * 0.0)
        }
        prL = next
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val itP = prL.entrySet().iterator()
      while (itP.hasNext) { val e = itP.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "pr")
    }
    val base = lit((dampDen - dampNum).toDouble) / (lit(dampDen.toDouble) * lit(nS.toDouble))
    var pr = seedSet.select(col("node"), (lit(1.0) / lit(nS.toDouble)).as("pr"))
    for (_ <- 0 until iters) {
      // contributions quantize by INTEGER floor(x·10¹⁵ + ½), not a
      // double→DECIMAL cast: Spark's cast routes through the shortest
      // string representation (Decimal(double) = BigDecimal.valueOf),
      // which can round a quantum differently than an engine reading
      // the full binary expansion — measured 1-ulp-of-quantum drift on
      // ~3% of nodes vs the oracle. floor on the same IEEE product is
      // engine-exact.
      val spread = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"),
          floor(col("pr") / col("deg") * lit(1e15) + lit(0.5))
            .cast("decimal(38,0)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("csum"))
      pr = spread
        .join(seedSet.withColumn("_s", lit(1)), Seq("node"), "full")
        .select(col("node"),
          (when(col("_s").isNotNull, base).otherwise(lit(0.0))
            + lit(d) * (coalesce(col("csum").cast("double"), lit(0.0)) / lit(1e15)))
            .as("pr"))
    }
    // frontier-sized result checkpoint, then release all three caches
    // (modularity pattern — r7 left edges + deg + seedSet persisted)
    val out = pr.localCheckpoint()
    edges.unpersist(); deg.unpersist(); seedSet.unpersist()
    out
  }

  /** Degree assortativity: the Pearson correlation of endpoint
    * degrees over the (directed-both-ways) edge list — "do hubs link
    * to hubs?" (Newman 2002). Positive on social/citation graphs;
    * near-dup similarity graphs are typically strongly positive (a
    * template cluster is a clique of equal-degree nodes), so a NEGATIVE
    * value flags hub-and-spoke boilerplate (one page quoted by many
    * one-off pages) that near-dup clustering treats differently.
    *
    * Exactness: degrees are exact longs; the five correlation sums
    * run as DECIMAL(38,0) over the directed edge list (each
    * undirected edge contributes both orientations — the standard
    * symmetrization making r orientation-free); r is one mirrored
    * double expression, rounded 1e-9. Degenerate graphs (all degrees
    * equal) emit NULL.
    *
    * Scale shape: one degree partial agg + two edge⋈degree hash joins
    * + one scalar agg — everything edge-list-sized, no windows.
    */
  def assortativity(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path (triangleCounts rationale): the five moment
    // sums are exact integers — the largest, Σ deg(src)² over directed
    // edges, is ≤ m·(m/2)², so plain long sums equal the distributed
    // DECIMAL(38,0) sums exactly only while m³/4 < 2⁶³, i.e. m ≤ ~3.3e6.
    // The local path therefore clamps to 3e6 INDEPENDENTLY of the
    // user-settable gate: a larger conf value must widen the other
    // kernels without ever letting these longs wrap. NULL endpoints
    // (possible from upstream outer joins) fall back to the distributed
    // branch, whose inner degree joins define the null semantics.
    val gateA = math.min(localEdgeGate(spark), 3000000L)
    if (gateA > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gateA) {
      val rows = edges.collect()
      if (rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
      val es = rows.map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val degL = new java.util.HashMap[Long, Long]()
      es.foreach { case (s, _) => degL.merge(s, 1L, _ + _) }
      var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L; var syy = 0L
      es.foreach { case (s, d) =>
        val dx = degL.get(s); val dy = degL.get(d)
        sx += dx; sy += dy; sxy += dx * dy; sxx += dx * dx; syy += dy * dy
      }
      val mD = es.length.toDouble
      val num = mD * sxy.toDouble - sx.toDouble * sy.toDouble
      val denX = mD * sxx.toDouble - sx.toDouble * sx.toDouble
      val denY = mD * syy.toDouble - sy.toDouble * sy.toDouble
      val assort: Option[Double] =
        if (denX > 0 && denY > 0)
          Some(java.math.BigDecimal.valueOf(num / math.sqrt(denX * denY))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
        else None
      import spark.implicits._
      return Seq((es.length.toLong, degL.size.toLong, assort))
        .toDF("n_directed_edges", "n_nodes", "assortativity")
      } // null endpoints — fall through to the distributed join semantics
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val joined = edges
      .join(deg.select(col("src"), col("deg").as("_dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("_dy")), Seq("dst"))
    def dz(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val sums = joined.agg(
      count(lit(1)).as("m"),
      sum(dz(col("_dx")).cast("decimal(38,0)")).as("_sx"),
      sum(dz(col("_dy")).cast("decimal(38,0)")).as("_sy"),
      sum((dz(col("_dx")) * col("_dy")).cast("decimal(38,0)")).as("_sxy"),
      sum((dz(col("_dx")) * col("_dx")).cast("decimal(38,0)")).as("_sxx"),
      sum((dz(col("_dy")) * col("_dy")).cast("decimal(38,0)")).as("_syy"))
    val nNodes = deg.count()
    def d(c: String) = col(c).cast("double")
    val m = d("m")
    val num = m * d("_sxy") - d("_sx") * d("_sy")
    val denX = m * d("_sxx") - d("_sx") * d("_sx")
    val denY = m * d("_syy") - d("_sy") * d("_sy")
    val out = sums.select(col("m").as("n_directed_edges"),
        lit(nNodes).as("n_nodes"),
        when(denX > 0 && denY > 0, round(num / sqrt(denX * denY), 9))
          .as("assortativity"))
      .localCheckpoint()
    edges.unpersist()
    out
  }

  /** HITS hubs & authorities (Kleinberg '99) over a DIRECTED edge
    * list — on the bipartite customer→product graph this reads as
    * "good buyers" (hubs: customers whose purchases concentrate on
    * authoritative products) vs "anchor products" (authorities:
    * products bought by the good buyers), the mutually-recursive
    * centrality PageRank's single score can't express. `iters`
    * alternating rounds of a ← Σ_in h, h ← Σ_out a, each
    * L1-NORMALIZED (scores sum to 1 — the eigenvector is defined up
    * to scale; L1 keeps every step a ratio of sums, no √ per round).
    *
    * Determinism (the personalizedPageRank contract): per-edge
    * contributions quantize by INTEGER floor(score·10¹⁵ + ½) before
    * the partial-agg sum (order-insensitive at any parallelism; a
    * double→DECIMAL cast rounds via different paths on the two
    * engines — Spark shortest-string vs DuckDB binary expansion);
    * each round's L1 total is the sum of the SAME integers, and the
    * normalizing division is one mirrored double op over two exact
    * integers. Output rounds 1e-9. Rounds are unrolled in the oracle.
    *
    * Scale shape: per round, one edge⋈score hash join + one
    * partial-agg sum keyed by the other endpoint — shuffles sized by
    * the edge list; the L1 total is a 1-row agg crossed back
    * (broadcast). The edge list is persisted across rounds (joined
    * 2·iters times). No windows, no collect.
    */
  def hits(edges0: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hubs0 = edges.select(col("src").as("node")).distinct()
    val nH = hubs0.count()
    require(nH > 0, "hits: empty edge list — no hubs to score")
    // adaptive local path (pageRank rationale): contributions are the
    // long quantum floor(score·1e15 + ½), per-node sums exact, the L1
    // normalization the same two-double division — bit-identical
    val gateH = localEdgeGate(edges0.sparkSession)
    if (gateH > 0 && longCols(edges0, srcCol, dstCol) && edges.count() <= gateH) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      var hubL = new java.util.HashMap[Long, Double]()
      es.foreach { case (s, _) => hubL.put(s, 1.0 / nH.toDouble) }
      var authL: java.util.HashMap[Long, Double] = null
      def l1norm(sums: java.util.HashMap[Long, java.math.BigDecimal])
          : java.util.HashMap[Long, Double] = {
        var tot = java.math.BigDecimal.ZERO
        val itT = sums.values().iterator()
        while (itT.hasNext) tot = tot.add(itT.next())
        val out = new java.util.HashMap[Long, Double]()
        val itN = sums.entrySet().iterator()
        while (itN.hasNext) {
          val e = itN.next()
          out.put(e.getKey, e.getValue.doubleValue() / tot.doubleValue())
        }
        out
      }
      for (_ <- 0 until iters) {
        val aSums = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst) =>
          val c = math.floor(hubL.get(s) * 1000000000000000.0 + 0.5).toLong
          aSums.merge(dst, java.math.BigDecimal.valueOf(c), _.add(_))
        }
        authL = l1norm(aSums)
        val hSums = new java.util.HashMap[Long, java.math.BigDecimal]()
        es.foreach { case (s, dst) =>
          val c = math.floor(authL.get(dst) * 1000000000000000.0 + 0.5).toLong
          hSums.merge(s, java.math.BigDecimal.valueOf(c), _.add(_))
        }
        hubL = l1norm(hSums)
      }
      def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      import edges0.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
      val itH = hubL.entrySet().iterator()
      while (itH.hasNext) { val e = itH.next(); rows += (("hub", e.getKey, r9(e.getValue))) }
      val itA = authL.entrySet().iterator()
      while (itA.hasNext) { val e = itA.next(); rows += (("authority", e.getKey, r9(e.getValue))) }
      return rows.toSeq.toDF("side", "node", "score")
    }
    var hub = hubs0.select(col("node"), (lit(1.0) / lit(nH.toDouble)).as("score"))
    var auth: DataFrame = null
    val unit = lit(1000000000000000.0) // 1e15 integer quantization units
    def l1Normalize(contrib: DataFrame): DataFrame = {
      // contrib: (node, _c LONG = floor(score·1e15 + ½)) per edge.
      // summed is referenced TWICE (the total + the select): without a
      // lineage cut the plan DOUBLES per half-round — 2^(2·iters)
      // recomputations of the whole chain (measured 18s → ~1s at
      // sf0.1). localCheckpoint materializes the node-sized artifact
      // once per half-round (the kCore per-round pattern).
      val summed = contrib.groupBy("node")
        .agg(sum(col("_c").cast("decimal(38,0)")).as("_s"))
        .localCheckpoint()
      val tot = summed.agg(sum("_s").as("_t"))
      summed.crossJoin(broadcast(tot))
        .select(col("node"),
          (col("_s").cast("double") / col("_t").cast("double")).as("score"))
    }
    for (_ <- 0 until iters) {
      auth = l1Normalize(edges
        .join(hub.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("score") * unit + lit(0.5)).cast("long").as("_c")))
      hub = l1Normalize(edges
        .join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"),
          floor(col("score") * unit + lit(0.5)).cast("long").as("_c")))
    }
    val out = hub.select(lit("hub").as("side"), col("node"),
        round(col("score"), 9).as("score"))
      .unionByName(auth.select(lit("authority").as("side"), col("node"),
        round(col("score"), 9).as("score")))
    // hub/auth stem from the per-half-round checkpointed `summed`
    // frames — no plan reference to `edges` survives, so the cache
    // releases immediately (r7 left it persisted)
    edges.unpersist()
    out
  }

  /** Multi-source BFS distances over an undirected edge list: per
    * reached node, the hop distance to the NEAREST seed (0 for seeds
    * themselves), up to `maxDepth` — the neighborhood-expansion
    * primitive behind "how far does this cluster's influence reach",
    * seed-set coverage audits, and graph-radius probes, the hop-count
    * complement to [[personalizedPageRank]]'s weighted relevance.
    * Nodes beyond maxDepth (or unreachable) are absent — the caller
    * reads absence as "farther than maxDepth".
    *
    * Pure integer arithmetic — no determinism machinery needed: the
    * min-hop distance per node is unique regardless of expansion
    * order, so the oracle's simple full-relaxation unroll matches the
    * frontier-optimized plan exactly.
    *
    * Scale shape: per round, ONE edge⋈frontier hash join (frontier =
    * nodes discovered last round only, never the full dist table) +
    * a min partial agg folding new candidates into the dist table;
    * shuffles are edge-list-bounded, rounds are maxDepth-bounded,
    * `localCheckpoint` cuts lineage per round (the kCore pattern).
    * Seeds are restricted to graph nodes (a seed absent from the
    * edge list contributes nothing, mirroring the PPR rule).
    */
  def bfsDistances(pairs: DataFrame, aCol: String, bCol: String,
                   seeds: DataFrame, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adaptive local path (triangleCounts rationale): min-hop is a
    // pure integer fixpoint, order-independent by construction
    val gate = localEdgeGate(pairs.sparkSession)
    if (gate > 0 && longCols(pairs, aCol, bCol) && edges.count() <= gate) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val nodeSet = new java.util.HashSet[Long]()
      es.foreach { case (s, _) => nodeSet.add(s); () }
      val seedRows = seeds.select(col(seeds.columns.head).cast("long")).distinct()
        .collect().map(_.getLong(0)).filter(nodeSet.contains)
      edges.unpersist()
      val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
      es.foreach { case (s, d) =>
        var buf = adj.get(s)
        if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty[Long]; adj.put(s, buf) }
        buf += d
      }
      val distL = new java.util.HashMap[Long, Int]()
      var frontier = scala.collection.mutable.ArrayBuffer.empty[Long]
      seedRows.foreach { s => distL.put(s, 0); frontier += s }
      var r = 1
      while (r <= maxDepth && frontier.nonEmpty) {
        val next = scala.collection.mutable.ArrayBuffer.empty[Long]
        frontier.foreach { s =>
          val nbrs = adj.get(s)
          if (nbrs != null) nbrs.foreach { d =>
            if (!distL.containsKey(d)) { distL.put(d, r); next += d }
          }
        }
        frontier = next; r += 1
      }
      import pairs.sparkSession.implicits._
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      val itD = distL.entrySet().iterator()
      while (itD.hasNext) { val e = itD.next(); rows += ((e.getKey, e.getValue)) }
      return rows.toSeq.toDF("node", "dist")
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    var dist = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
      .select(col("node"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = dist
    for (r <- 1 to maxDepth) {
      val reached = edges
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), lit(r).as("dist"))
      val merged = dist.unionByName(reached)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
      frontier = merged.filter(col("dist") === r).localCheckpoint()
      dist = merged
    }
    edges.unpersist()
    dist
  }

  /** Hill tail-index estimate of the degree distribution: α̂ = k /
    * Σ_{i=1..k} ln(d_(i) / d_(k+1)) over the k largest degrees — the
    * standard "is this graph scale-free, and how heavy is the tail?"
    * scalar (power-law exponent ≈ 1 + α̂). Read it before choosing
    * skew strategy: α̂ ≲ 2 means hub degrees grow superlinearly with
    * corpus size and every per-key operator downstream needs its
    * bucketed form (SURVEY §5) — this is the measurement behind that
    * call, beside [[graft.operators.Behavior.hotKeyProbe]]'s absolute
    * row counts.
    *
    * Determinism: degrees are exact longs; the top-(k+1) selection is
    * an integer-rank TakeOrdered with ties broken by node id; each
    * ln(dᵢ/d_{k+1}) term is one double of two exact longs quantized
    * DECIMAL(20,9) pre-sum; α̂ rounds 1e-9.
    *
    * Scale shape: one explode+partial-agg for degrees (edge-list
    * sized), then a LIMIT k+1 TakeOrdered over the degree table —
    * never a global sort; the k+1 rows are a fixed model artifact.
    */
  def degreeTailAlpha(pairs: DataFrame, aCol: String, bCol: String,
                      k: Int = 50): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val deg = pairs
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val top = deg.orderBy(col("deg").desc, col("node")).limit(k + 1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("deg").desc, col("node"))
    // d_(k+1) = the smallest of the k+1 pulled rows (exact rank);
    // windows run over the k+1-row artifact, never the degree table
    val withRef = top
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("_dref", min(when(col("_rk") === k + 1, col("deg"))).over(wAll))
    withRef.filter(col("_rk") <= k && col("_dref").isNotNull && col("_dref") > 0)
      .select((log(col("deg").cast("double")) - log(col("_dref").cast("double")))
        .cast("decimal(20,9)").as("_t"))
      .agg(count(lit(1)).cast("int").as("k"),
        round(lit(k.toDouble) / sum(col("_t")).cast("double"), 9).as("alpha"))
  }

  /** k-truss decomposition (Cohen '08): the maximal subgraph where
    * every EDGE sits on ≥ k−2 triangles — the edge-level cohesion
    * companion to [[kCore]]'s node-level peel (a k-core can be held
    * together by one promiscuous hub; a k-truss cannot — every
    * surviving similarity edge is corroborated by k−2 common
    * neighbors, which is exactly the evidence bar for calling a dup
    * CLUSTER rather than a dup chain). Classic support peel: count
    * per-edge triangle support, drop edges under k−2, repeat to a
    * fixpoint.
    *
    * Scale shape per round: the [[triangleCounts]] machinery — one
    * (deg, id)-oriented wedge self-join bounded by √(2E) fan-out,
    * closure a hash join — then each triangle explodes to its THREE
    * canonical edges for the support partial agg; shuffles are sized
    * by the SHRINKING edge list, lineage truncated per round
    * (localCheckpoint), convergence asserted loudly (a silent partial
    * peel overstates cohesion). Returns the surviving canonical
    * edges with their final support.
    */
  def kTruss(pairs: DataFrame, aCol: String, bCol: String, k: Int,
             maxIter: Int = 30): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val need = (k - 2).toLong
    val spark = pairs.sparkSession
    var canon = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    var n = canon.count()
    // adaptive local path: the peel is a pure integer fixpoint whose
    // distributed form ran 108 jobs (~30 rounds × 3-4 actions) on an
    // 11k-edge sf0.1 graph; rounds and outputs mirror exactly
    val gate = localEdgeGate(spark)
    if (gate > 0 && longCols(canon, "u", "v") && n <= gate) {
      var es = canon.collect().map(r => (r.getLong(0), r.getLong(1)))
      def supports(ce: Array[(Long, Long)]): java.util.HashMap[(Long, Long), Long] = {
        val sym = new Array[(Long, Long)](ce.length * 2)
        var i = 0
        while (i < ce.length) {
          sym(2 * i) = ce(i); sym(2 * i + 1) = (ce(i)._2, ce(i)._1); i += 1
        }
        val sup = new java.util.HashMap[(Long, Long), Long]()
        localTriangles(sym) { (a, b, c) =>
          sup.merge((math.min(a, b), math.max(a, b)), 1L, _ + _)
          sup.merge((math.min(a, c), math.max(a, c)), 1L, _ + _)
          sup.merge((math.min(b, c), math.max(b, c)), 1L, _ + _)
          ()
        }
        sup
      }
      var itL = 0
      var conv = es.isEmpty
      while (!conv && itL < maxIter) {
        val sup = supports(es)
        val pruned = es.filter(e => sup.getOrDefault(e, 0L) >= need)
        conv = pruned.length == es.length
        es = pruned; itL += 1
      }
      require(conv, s"kTruss($k) did not converge within $maxIter peel rounds")
      import spark.implicits._
      if (es.isEmpty) return Seq.empty[(Long, Long, Long)].toDF("u", "v", "support")
      val supF = supports(es)
      return es.toSeq.map(e => (e._1, e._2, supF.getOrDefault(e, 0L)))
        .toDF("u", "v", "support")
    }
    var it = 0
    var converged = n == 0
    while (!converged && it < maxIter) {
      val edges = canon.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(canon.select(col("v").as("src"), col("u").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val oriented = edges
        .join(deg.withColumnRenamed("src", "s_").withColumnRenamed("deg", "ds"),
          col("src") === col("s_")).drop("s_")
        .join(deg.withColumnRenamed("src", "d_").withColumnRenamed("deg", "dd"),
          col("dst") === col("d_")).drop("d_")
        .filter(col("ds") < col("dd") ||
          (col("ds") === col("dd") && col("src") < col("dst")))
        .select(col("src"), col("dst"), col("dd").as("dg"))
      val wedges = oriented
        .select(col("src").as("a"), col("dst").as("b"), col("dg").as("bg"))
        .join(oriented.select(col("src").as("a"), col("dst").as("c"),
          col("dg").as("cg")), Seq("a"))
        .filter(col("bg") < col("cg") ||
          (col("bg") === col("cg") && col("b") < col("c")))
        .select("a", "b", "c")
      val tris = wedges.join(
        oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      val support = tris.select(explode(array(
          struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
          struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
          struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v"))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      // LEFT join: an edge on ZERO triangles is absent from the
      // support agg but must still compare against k−2 (at k = 2 it
      // survives — truss-2 is the whole graph)
      val pruned = canon.join(support, Seq("u", "v"), "left")
        .na.fill(0L, Seq("support"))
        .filter(col("support") >= need).select("u", "v")
        .localCheckpoint()
      val n2 = pruned.count()
      converged = n2 == n
      canon = pruned; n = n2; it += 1
    }
    require(converged, s"kTruss($k) did not converge within $maxIter peel rounds")
    if (n == 0) return canon.withColumn("support", lit(0L)).limit(0)
    // final support over the converged subgraph (one more count pass)
    val edges = canon.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(canon.select(col("v").as("src"), col("u").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.withColumnRenamed("src", "s_").withColumnRenamed("deg", "ds"),
        col("src") === col("s_")).drop("s_")
      .join(deg.withColumnRenamed("src", "d_").withColumnRenamed("deg", "dd"),
        col("dst") === col("d_")).drop("d_")
      .filter(col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst")))
      .select(col("src"), col("dst"), col("dd").as("dg"))
    val wedges = oriented
      .select(col("src").as("a"), col("dst").as("b"), col("dg").as("bg"))
      .join(oriented.select(col("src").as("a"), col("dst").as("c"),
        col("dg").as("cg")), Seq("a"))
      .filter(col("bg") < col("cg") ||
        (col("bg") === col("cg") && col("b") < col("c")))
      .select("a", "b", "c")
    val tris = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    canon.join(tris.select(explode(array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support")), Seq("u", "v"), "left")
      .na.fill(0L, Seq("support"))
  }
}
