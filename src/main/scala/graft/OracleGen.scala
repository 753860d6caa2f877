package graft

import graft.functions.Hashing
import graft.plans.HyperplaneBucket

/** Generators for the DuckDB oracle SQL of the hash/vector pipelines
  * (SURVEY.md §2 #30-35, #39).
  *
  * These queries are verifiable end-to-end because every primitive was
  * chosen to be ENGINE-PORTABLE:
  *  - the dedup hash family is md5-prefix-based ([[Hashing]]), so DuckDB
  *    computes bit-identical signatures from `substr(md5(x), ...)`;
  *  - the affine-family constants and the hyperplane sign matrix are
  *    plan-time constants, inlined here as SQL literals from the SAME
  *    Scala definitions the Column expressions use;
  *  - cosine similarity is unrolled into the exact sequential
  *    double-accumulation order of [[graft.plans.CosineSimilarity]]'s
  *    fused loop (left-associative `+` chains), so the doubles — and
  *    therefore every rank — are bit-identical across engines.
  */
object OracleGen {

  private val P = Hashing.PortableP

  /** `('0x'||substr(md5(x),1,8))::BIGINT % P` — mirror of
    * [[Hashing.portableHash]].
    */
  private def portableHashSql(x: String): String =
    s"('0x' || substr(md5($x), 1, 8))::BIGINT % $P"

  /** Unrolled dot product in the fused loop's accumulation order. */
  private def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  /** Unrolled cosine — bit-identical to the codegen'd vec_cosine. */
  def cosineSql(a: String, b: String, dim: Int): String =
    s"(${dotSql(a, b, dim)} / (sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})))"

  /** Signed-random-projection element list — mirror of
    * [[graft.plans.RandomProjectVec]]: each output element is the
    * left-associative sum of the fused loop, with the identical
    * plan-time sign matrix inlined.
    */
  def projListSql(vec: String, outDim: Int, dim: Int, seed: Int = 7): String = {
    val signs = HyperplaneBucket.signMatrix(outDim, dim, seed)
    (0 until outDim).map { p =>
      (0 until dim)
        .map(d => s"CAST($vec[${d + 1}] AS DOUBLE) * ${if (signs(p * dim + d) > 0) "1.0" else "-1.0"}")
        .mkString(" + ")
    }.mkString("[", ", ", "]")
  }

  /** Consecutive-pair cosine-preservation audit of the random
    * projection (q165): original-space vs projected-space cosine with
    * the absolute error, all doubles in mirrored op order.
    */
  def randomProjectionSql(outDim: Int = 16, dim: Int = 64): String =
    s"""WITH p AS (
       SELECT vec_id, embedding, ${projListSql("embedding", outDim, dim)} AS proj
       FROM embeddings),
     j AS (
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ${cosineSql("a.embedding", "b.embedding", dim)} AS co,
         ${cosineSql("a.proj", "b.proj", outDim)} AS cp
       FROM p a JOIN p b ON b.vec_id = a.vec_id + 1)
     SELECT id_a, id_b, ROUND(co, 6) AS cos_orig, ROUND(cp, 6) AS cos_proj,
       ROUND(abs(co - cp), 6) AS err
     FROM j"""

  /** Hyperplane LSH bucket with the plan-time sign matrix inlined. */
  def bucketSql(vec: String, nbits: Int, dim: Int, seed: Int = 7): String = {
    val signs = HyperplaneBucket.signMatrix(nbits, dim, seed)
    (0 until nbits).map { p =>
      val dot = (0 until dim)
        .map(d => s"CAST($vec[${d + 1}] AS DOUBLE) * ${if (signs(p * dim + d) > 0) "1.0" else "-1.0"}")
        .mkString(" + ")
      s"(CASE WHEN ($dot) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Full MinHash+LSH pipeline (operators.Dedup.minhash defaults:
    * k=16, bandWidth=1, cap 50, top 100).
    */
  def minhashSql(k: Int = 16, cap: Int = 50, topK: Int = 100): String = {
    val minCols = (0 until k)
      .map(i => s"MIN((${Hashing.affineA(i)} * h0 + ${Hashing.affineB(i)}) % $P) AS m${i}")
      .mkString(", ")
    val sigList = (0 until k).map(i => s"m$i").mkString("[", ", ", "]")
    s"""WITH toks AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
     sh AS (
       SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1]
                                            for i in generate_series(1, len(w)-1)])) AS sh
       FROM toks WHERE len(w) >= 2),
     h AS (SELECT doc_id, ${portableHashSql("sh")} AS h0 FROM sh),
     sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
     banded AS (
       SELECT doc_id, band, (band * 31 + m) % $P AS bandval FROM (
         SELECT doc_id, unnest($sigList) AS m,
                unnest(generate_series(0, ${k - 1})) AS band
         FROM sig)),
     capped AS (
       SELECT doc_id, band, bandval FROM (
         SELECT doc_id, band, bandval,
           ROW_NUMBER() OVER (PARTITION BY band, bandval ORDER BY doc_id) AS bn
         FROM banded) WHERE bn <= $cap),
     pairs AS (
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) / ${k}.0 AS est_sim
       FROM capped a JOIN capped b
         ON a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
     SELECT doc_a, doc_b, est_sim, rnk FROM (
       SELECT doc_a, doc_b, est_sim,
         CAST(ROW_NUMBER() OVER (ORDER BY est_sim DESC, doc_a, doc_b) AS INT) AS rnk
       FROM pairs) WHERE rnk <= $topK"""
  }

  /** Fuzzy benchmark decontamination
    * (operators.Dedup.decontaminateFuzzy on the q56 doc_id%10 split):
    * the same portable signature/banding family as [[minhashSql]],
    * split into train/eval, best per-position agreement per train doc
    * (ties to the smallest eval id), integer `minMatches` threshold.
    */
  def decontaminateFuzzySql(k: Int = 16, minMatches: Int = 4): String = {
    val minCols = (0 until k)
      .map(i => s"MIN((${Hashing.affineA(i)} * h0 + ${Hashing.affineB(i)}) % $P) AS m$i")
      .mkString(", ")
    val sigList = (0 until k).map(i => s"m$i").mkString("[", ", ", "]")
    s"""WITH toks AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
     sh AS (
       SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1]
                                            for i in generate_series(1, len(w)-1)])) AS sh
       FROM toks WHERE len(w) >= 2),
     h AS (SELECT doc_id, ${portableHashSql("sh")} AS h0 FROM sh),
     sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
     banded AS (
       SELECT doc_id, band, (band * 31 + m) % $P AS bandval FROM (
         SELECT doc_id, unnest($sigList) AS m,
                unnest(generate_series(0, ${k - 1})) AS band
         FROM sig)),
     tb AS (SELECT doc_id, band, bandval FROM banded WHERE doc_id % 10 <> 0),
     eb AS (SELECT doc_id AS eval_id, band, bandval FROM banded WHERE doc_id % 10 = 0),
     cand AS (
       SELECT t.doc_id, e.eval_id, COUNT(*) AS n_agree
       FROM tb t JOIN eb e USING (band, bandval) GROUP BY 1, 2),
     best AS (
       SELECT doc_id, eval_id, n_agree FROM (
         SELECT doc_id, eval_id, n_agree,
           ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY n_agree DESC, eval_id) AS rn
         FROM cand) WHERE rn = 1)
     SELECT d.doc_id, b.eval_id,
       coalesce(b.n_agree, 0) / ${k}.0 AS est_sim,
       coalesce(b.n_agree, 0) >= $minMatches AS contaminated
     FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
     LEFT JOIN best b USING (doc_id)"""
  }

  /** Per-source MinHash similarity matrix
    * (operators.Dedup.sourceMinhashMatrix defaults: k=16 trigram
    * signatures per source, pairwise agreement / k).
    */
  def sourceMinhashSql(k: Int = 16, n: Int = 3): String = {
    val gram = (1 to n).map(j => s"w[i + ${j - 1}]").mkString(" || ' ' || ")
    val minCols = (0 until k)
      .map(i => s"MIN((${Hashing.affineA(i)} * h0 + ${Hashing.affineB(i)}) % $P) AS m$i")
      .mkString(", ")
    val agree = (0 until k)
      .map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
     sh AS (
       SELECT source, unnest([$gram for i in generate_series(1, len(w) - ${n - 1})]) AS g
       FROM toks WHERE len(w) >= $n),
     h AS (SELECT source, ${portableHashSql("g")} AS h0 FROM sh),
     sig AS (SELECT source, $minCols FROM h GROUP BY source)
     SELECT a.source AS src_a, b.source AS src_b,
       ($agree) / ${k}.0 AS est_sim
     FROM sig a JOIN sig b ON a.source < b.source"""
  }

  /** Full SimHash pipeline (operators.Dedup.simhash defaults: 4×16-bit
    * bands, cap 50, top 100). The 64-bit token hash is rebuilt from the
    * two md5 32-bit halves; band values and Hamming distances are
    * recomputed from the per-bit majority signs.
    */
  def simhashSql(cap: Int = 50, topK: Int = 100): String =
    s"""WITH toks AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
     tf AS (
       SELECT doc_id, tok, COUNT(*) AS cnt
       FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1, 2),
     th AS (
       SELECT doc_id, cnt,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
       FROM tf),
     bits AS (
       SELECT doc_id, j,
         CASE WHEN SUM(CASE WHEN ((CASE WHEN j < 32 THEN (lo >> j)
                                        ELSE (hi >> (j - 32)) END) & 1) = 1
                           THEN cnt ELSE -cnt END) >= 0 THEN 1 ELSE 0 END AS bit
       FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) js
       GROUP BY doc_id, j),
     sigs AS (
       SELECT doc_id, j // 16 AS band, SUM(bit * (1 << (j % 16))) AS bandval
       FROM bits GROUP BY doc_id, j // 16),
     capped AS (
       SELECT doc_id, band, bandval FROM (
         SELECT doc_id, band, bandval,
           ROW_NUMBER() OVER (PARTITION BY band, bandval ORDER BY doc_id) AS bn
         FROM sigs) WHERE bn <= $cap),
     prs AS (
       SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       FROM capped a JOIN capped b
         ON a.band = b.band AND a.bandval = b.bandval AND a.doc_id < b.doc_id),
     ham AS (
       SELECT doc_a, doc_b,
         CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS INT) AS hamming
       FROM prs
       JOIN bits ba ON ba.doc_id = prs.doc_a
       JOIN bits bb ON bb.doc_id = prs.doc_b AND bb.j = ba.j
       GROUP BY 1, 2)
     SELECT doc_a, doc_b, hamming, rnk FROM (
       SELECT doc_a, doc_b, hamming,
         CAST(ROW_NUMBER() OVER (ORDER BY hamming, doc_a, doc_b) AS INT) AS rnk
       FROM ham) WHERE rnk <= $topK"""

  /** Full embedding near-dup pipeline (operators.Dedup.embedding
    * defaults: nbits=6, dim=64, cap 40, top 100).
    */
  def embeddingSql(nbits: Int = 6, dim: Int = 64, cap: Int = 40, topK: Int = 100): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         ${cosineSql("a.embedding", "b2.embedding", dim)} AS cos
       FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
     SELECT vec_a, vec_b, cos, rnk FROM (
       SELECT vec_a, vec_b, cos,
         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_a, vec_b) AS INT) AS rnk
       FROM prs) WHERE rnk <= $topK"""

  /** LSH ANN (operators.Similarity.lshTopK with multi-probe
    * `probeHamming = 1`: own bucket + every single-bit flip) with the
    * q28 query set `vec_id < 8`.
    */
  def lshAnnSql(nbits: Int = 4, dim: Int = 64, k: Int = 10): String = {
    val flips = (0 until nbits).map(b => s"xor(bucket, ${1L << b})").mkString(", ")
    s"""WITH c AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     q0 AS (SELECT vec_id, embedding, bucket FROM c WHERE vec_id < 8),
     q AS (SELECT vec_id, embedding,
             unnest([bucket, $flips]) AS bucket FROM q0),
     scored AS (
       SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ${cosineSql("q.embedding", "c.embedding", dim)} AS cos
       FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)
     SELECT query_id, neighbor_id, cos, rank FROM (
       SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
       FROM scored) WHERE rank <= $k"""
  }

  /** IVF ANN (operators.Similarity.ivfTopK with lloydSteps=0: centroids
    * ARE the md5-selected seed vectors, so the quantizer is exactly
    * reproducible from the table) with the q36 query set `vec_id < 8`.
    */
  def ivfAnnSql(ncells: Int = 16, nprobe: Int = 4, dim: Int = 64, k: Int = 10): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     cells AS (
       SELECT vec_id, embedding, cell FROM (
         SELECT e.vec_id, e.embedding, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1),
     probes AS (
       SELECT query_id, cell FROM (
         SELECT e.vec_id AS query_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS prn
         FROM embeddings e CROSS JOIN seeds s WHERE e.vec_id < 8) WHERE prn <= $nprobe),
     qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
     scored AS (
       SELECT p.query_id, c.vec_id AS neighbor_id,
         ${cosineSql("q.embedding", "c.embedding", dim)} AS cos
       FROM probes p
       JOIN cells c ON c.cell = p.cell
       JOIN qv q ON q.vec_id = p.query_id
       WHERE c.vec_id <> p.query_id)
     SELECT query_id, neighbor_id, cos, rank FROM (
       SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
       FROM scored) WHERE rank <= $k"""

  /** Cluster-balanced diversity sampling
    * (operators.Similarity.diverseSample): the same md5-seeded
    * quantizer as [[ivfAnnSql]], then a per-cell (md5(id), id)-ordered
    * quota — every stage reproducible from the table.
    */
  def diverseSampleSql(ncells: Int = 16, quota: Int = 20, dim: Int = 64): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     cells AS (
       SELECT vec_id, cell FROM (
         SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1)
     SELECT vec_id, cell, pick FROM (
       SELECT vec_id, cell,
         CAST(ROW_NUMBER() OVER (PARTITION BY cell
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS pick
       FROM cells) WHERE pick <= $quota"""

  /** Centroid-distance outlier scoring
    * (operators.Similarity.centroidOutliers): the diverseSample seed +
    * cell machinery, emitting the nearest-centroid cosine and the
    * DECIMAL(18,6) threshold flag instead of a quota pick.
    */
  def centroidOutliersSql(minCos: String = "0.15", ncells: Int = 16,
                          dim: Int = 64): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     best AS (
       SELECT vec_id, cell, cos FROM (
         SELECT e.vec_id, s.cell,
           ${cosineSql("e.embedding", "s.sv", dim)} AS cos,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1)
     SELECT vec_id, cell, ROUND(cos, 6) AS cos_center,
       CAST(cos AS DECIMAL(18,6)) < CAST('$minCos' AS DECIMAL(18,6)) AS is_outlier
     FROM best"""

  /** Label-conformity scoring (operators.Similarity.labelConformity):
    * exact quantized label centroids (the q76 sums), cast FLOAT (IEEE
    * round-to-nearest — same both engines), cosine in the fused-loop
    * order, DECIMAL(18,6) threshold flag.
    */
  def labelConformitySql(minCos: String = "0.1", dim: Int = 64): String =
    s"""WITH x AS (
       SELECT label, CAST(i AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e12 + 0.5) AS DECIMAL(38,0)) AS v
       FROM embeddings, unnest(generate_series(1, $dim)) t(i)),
     c AS (
       SELECT label, dim, CAST(SUM(v) AS DOUBLE) / 1e12 / COUNT(*) AS c
       FROM x GROUP BY 1, 2),
     cw AS (SELECT label, list(CAST(c AS FLOAT) ORDER BY dim) AS cent
            FROM c GROUP BY label)
     SELECT e.vec_id, e.label,
       ROUND(${cosineSql("e.embedding", "cw.cent", dim)}, 6) AS cos_centroid,
       CAST(${cosineSql("e.embedding", "cw.cent", dim)} AS DECIMAL(18,6))
         < CAST('$minCos' AS DECIMAL(18,6)) AS mislabeled
     FROM embeddings e JOIN cw USING (label)"""

  /** Hard-negative mining (operators.Similarity.hardNegatives): the
    * hyperplane bucket pipeline with labels carried, both directions,
    * different-label filter, per-anchor top-k by exact cosine.
    */
  def hardNegativesSql(k: Int = 5, nbits: Int = 6, dim: Int = 64,
                       cap: Int = 40): String =
    s"""WITH b AS (
       SELECT vec_id, label, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, label, embedding, bucket FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         a.label AS la, b2.label AS lb,
         ${cosineSql("a.embedding", "b2.embedding", dim)} AS cos
       FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
     sym AS (
       SELECT vec_a AS anchor, vec_b AS neg, la, lb, cos FROM prs
       UNION ALL
       SELECT vec_b, vec_a, lb, la, cos FROM prs),
     r AS (
       SELECT anchor, neg, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY anchor
           ORDER BY cos DESC, neg) AS INT) AS rank
       FROM sym WHERE la <> lb)
     SELECT anchor, neg, ROUND(cos, 6) AS cos, rank FROM r WHERE rank <= $k"""

  /** Dominant principal component + per-vector projection
    * (operators.Similarity.principalComponent): the moment sums are
    * rebuilt with the identical micro-unit quantization (exact,
    * order-insensitive), and the power iterations are UNROLLED as
    * CTEs with every double op in the Scala pass's left-to-right
    * order, so the axis — and each projection — is bit-identical.
    */
  def principalComponentSql(dims: Int = 16, iters: Int = 3): String = {
    def qe(i: Int) =
      s"CAST(floor(CAST(embedding[${i + 1}] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)"
    val sums =
      (0 until dims).map(i => s"SUM(CAST(${qe(i)} AS DECIMAL(38,0))) AS s$i") ++
      (for (i <- 0 until dims; j <- i until dims)
        yield s"SUM(CAST(${qe(i)} * ${qe(j)} AS DECIMAL(38,0))) AS p${i}_$j")
    def mRef(i: Int) = s"(CAST(s$i AS DOUBLE) / 1e6 / n)"
    def cRef(i: Int, j: Int) = { val (a, b) = (math.min(i, j), math.max(i, j)); s"c${a}_$b" }
    val cCols = (for (i <- 0 until dims; j <- i until dims) yield
      s"CAST(p${i}_$j AS DOUBLE) / 1e12 / n - ${mRef(i)} * ${mRef(j)} AS c${i}_$j")
      .mkString(",\n         ")
    def xRef(k: Int, j: Int) = if (k == 0) (if (j == 0) "1.0" else "0.0") else s"x${k}_$j"
    val iterCtes = (1 to iters).map { k =>
      val ys = (0 until dims).map(i =>
        (0 until dims).map(j => s"${cRef(i, j)} * ${xRef(k - 1, j)}")
          .mkString(" + ") + s" AS y${k}_$i").mkString(",\n         ")
      val nn = (0 until dims).map(i => s"y${k}_$i * y${k}_$i").mkString(" + ")
      val xs = (0 until dims).map(i => s"y${k}_$i / nn$k AS x${k}_$i")
        .mkString(", ")
      s"""yy$k AS (SELECT *, $ys FROM ${if (k == 1) "c" else s"xx${k - 1}"}),
       nnt$k AS (SELECT *, sqrt($nn) AS nn$k FROM yy$k),
       xx$k AS (SELECT *, $xs FROM nnt$k)"""
    }.mkString(",\n     ")
    val pf = (0 until dims).map(i =>
      s"CASE WHEN x${iters}_0 < 0 THEN -x${iters}_$i ELSE x${iters}_$i END AS pf$i")
      .mkString(", ")
    val proj = (0 until dims).map(i =>
      s"(CAST(e.embedding[${i + 1}] AS DOUBLE) - ${mRef(i)}) * pf$i")
      .mkString(" + ")
    s"""WITH cov AS (
       SELECT COUNT(*) AS n, ${sums.mkString(",\n         ")} FROM embeddings),
     c AS (SELECT n, ${(0 until dims).map(i => s"s$i").mkString(", ")},
         $cCols
       FROM cov),
     $iterCtes,
     fin AS (SELECT *, $pf FROM xx$iters)
     SELECT e.vec_id, ROUND($proj, 6) AS proj
     FROM embeddings e CROSS JOIN fin"""
  }

  /** One spherical k-means step (operators.Similarity.kmeansStep):
    * the q175 nearest-seed assignment + q76-style exact quantized
    * per-cell means.
    */
  def kmeansStepSql(ncells: Int = 16, dim: Int = 64): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     best AS (
       SELECT vec_id, cell FROM (
         SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1),
     x AS (
       SELECT b.cell, CAST(i AS INT) AS dim,
         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e12 + 0.5) AS DECIMAL(38,0)) AS v
       FROM embeddings e JOIN best b USING (vec_id),
            unnest(generate_series(1, $dim)) t(i))
     SELECT cell, dim, COUNT(*) AS n_vecs,
       CAST(SUM(v) AS DOUBLE) / 1e12 / COUNT(*) AS c
     FROM x GROUP BY 1, 2"""

  /** DSIR importance weights (functions.NgramLm.dsirWeights): hashed
    * unigram+bigram bucket histograms for target vs raw, add-1
    * smoothed log-ratio per bucket quantized to DECIMAL(20,6), summed
    * per document — op order mirrored token for token.
    */
  def dsirSql(nBuckets: Int = 1024, targetSource: String = "src1"): String = {
    val b = s"((('0x' || substr(md5(g), 1, 8))::BIGINT % $P) % $nBuckets)"
    s"""WITH tok AS MATERIALIZED (
       SELECT doc_id, source,
         string_split_regex(lower(trim(text)), '\\s+') AS w
       FROM documents),
     gb AS MATERIALIZED (
       SELECT doc_id, source, $b AS b FROM (
         SELECT doc_id, source,
           unnest(w || [array_to_string(w[i : i + 1], ' ')
                        for i in generate_series(1, len(w) - 1)]) AS g
         FROM tok)),
     p AS (SELECT b, COUNT(*) AS pc FROM gb WHERE source = '$targetSource' GROUP BY 1),
     q AS (SELECT b, COUNT(*) AS qc FROM gb GROUP BY 1),
     tot AS (SELECT (SELECT COALESCE(SUM(pc), 0) FROM p) AS np,
                    (SELECT COALESCE(SUM(qc), 0) FROM q) AS nq),
     lam AS (
       SELECT bb.b,
         CAST(ln((COALESCE(p.pc, 0) + 1.0) / (t.np + $nBuckets.0))
            - ln((COALESCE(q.qc, 0) + 1.0) / (t.nq + $nBuckets.0)) AS DECIMAL(20,6)) AS lam
       FROM (SELECT unnest(generate_series(0, ${nBuckets - 1})) AS b) bb
       LEFT JOIN p ON p.b = bb.b
       LEFT JOIN q ON q.b = bb.b
       CROSS JOIN tot t),
     sc AS (
       SELECT doc_id, COUNT(*) AS n_grams, SUM(lam) AS s
       FROM gb JOIN lam USING (b) GROUP BY 1)
     SELECT t.doc_id, CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(CAST(s * 1000000 AS BIGINT) AS DOUBLE) / 1e6 AS logw
     FROM tok t LEFT JOIN sc ON sc.doc_id = t.doc_id"""
  }

  /** Distributed BPE merge training (functions.Bpe
    * .learnMergesDistributed): rounds unroll as chained CTEs; each
    * round's merge application is a replace-until-fixpoint RECURSIVE
    * member (the q63-verified equivalence with the engine's mergePair
    * fixpoint), each round's vocab/pair tables MATERIALIZED (the kCore
    * inlining lesson). Tie-break mirrors the engine: count desc, then
    * binary-largest (a, b).
    */
  def bpeTrainSql(nMerges: Int = 6, sampleMod: Int = 20): String = {
    val base =
      s"""wc AS MATERIALIZED (
         SELECT word, COUNT(*) AS cnt FROM (
           SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
           FROM documents WHERE doc_id % $sampleMod = 0)
         WHERE word <> '' GROUP BY 1),
       v0 AS MATERIALIZED (
         SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s, cnt
         FROM wc)"""
    def round(r: Int): String =
      s""",
       p$r AS MATERIALIZED (
         SELECT sy[i] AS a, sy[i + 1] AS b, SUM(cnt) AS c FROM (
           SELECT string_split(trim(s), ' ') AS sy, cnt,
             unnest(generate_series(1, len(string_split(trim(s), ' ')) - 1)) AS i
           FROM v${r - 1})
         GROUP BY 1, 2),
       m$r AS MATERIALIZED (
         SELECT a, b, c FROM p$r ORDER BY c DESC, a DESC, b DESC LIMIT 1),
       a$r AS (
         SELECT s, cnt, 0 AS fin FROM v${r - 1}
         UNION ALL
         SELECT CASE WHEN rep <> s THEN rep ELSE s END AS s, cnt,
                CASE WHEN rep <> s THEN 0 ELSE 1 END AS fin
         FROM (
           SELECT x.s, x.cnt,
             replace(x.s, ' ' || m.a || ' ' || m.b || ' ',
                     ' ' || m.a || m.b || ' ') AS rep
           FROM a$r x JOIN m$r m ON x.fin = 0) t),
       v$r AS MATERIALIZED (SELECT s, cnt FROM a$r WHERE fin = 1)"""
    val selects = (1 to nMerges).map(r =>
      s"""SELECT CAST($r AS INT) AS rank, a AS sym_a, b AS sym_b,
         CAST(c AS BIGINT) AS pair_count FROM m$r""").mkString("\n UNION ALL\n ")
    s"WITH RECURSIVE $base${(1 to nMerges).map(round).mkString}\n $selects"
  }

  /** Multi-round k-means trainer (operators.Similarity.kmeansTrain):
    * the rounds unroll as chained CTEs (the kCore materialized-round
    * lesson). Every round's centroid feed-back is the integer
    * micro-unit vector m_u = SUM(quantized) // (n·10⁶) — bigint
    * division toward zero on both engines — cast to DOUBLE for the
    * unrolled bit-exact cosine; empty cells renumber via ROW_NUMBER
    * ordered by cell, mirroring the Scala list rebuild.
    */
  def kmeansTrainSql(ncells: Int = 8, dim: Int = 64, iters: Int = 3): String = {
    val seed =
      s"""s1 AS MATERIALIZED (
         SELECT CAST(rn - 1 AS INT) AS cell, sv FROM (
           SELECT list_transform(embedding, x ->
               CAST(CAST(floor(CAST(x AS DOUBLE) * 1e12 + 0.5) AS BIGINT) // 1000000 AS DOUBLE)) AS sv,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           FROM embeddings) WHERE rn <= $ncells)"""
    def round(r: Int): String = {
      val cos = cosineSql("e.embedding", "s.sv", dim)
      val relist = if (r == 1) "" else s""",
         s$r AS MATERIALIZED (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY cell) - 1 AS INT) AS cell, sv FROM (
             SELECT cell, list(CAST(m_u AS DOUBLE) ORDER BY dim) AS sv
             FROM c${r - 1} GROUP BY cell))"""
      s"""$relist,
         b$r AS MATERIALIZED (
           SELECT vec_id, cell, cs FROM (
             SELECT e.vec_id, s.cell, $cos AS cs,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, s.cell) AS crn
             FROM embeddings e CROSS JOIN s$r s) WHERE crn = 1),
         x$r AS (
           SELECT b.cell, CAST(i AS INT) AS dim,
             CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS vq
           FROM embeddings e JOIN b$r b USING (vec_id),
                unnest(generate_series(1, $dim)) t(i)),
         c$r AS MATERIALIZED (
           SELECT cell, dim, COUNT(*) AS n_vecs,
             CAST(SUM(vq) AS BIGINT) // (COUNT(*) * 1000000) AS m_u
           FROM x$r GROUP BY 1, 2),
         i$r AS (
           SELECT cell, CAST(SUM(CAST(floor((1.0 - cs) * 1e12 + 0.5) AS BIGINT))
             AS DECIMAL(38,0)) AS inertia_q
           FROM b$r GROUP BY 1)"""
    }
    val rounds = (1 to iters).map(round).mkString
    val selects = (1 to iters).map(r =>
      s"""SELECT CAST($r AS INT) AS round, c.cell, c.dim, c.n_vecs, c.m_u,
           CAST(i.inertia_q AS DOUBLE) AS inertia
         FROM c$r c JOIN i$r i USING (cell)""").mkString("\n UNION ALL\n ")
    s"WITH $seed$rounds\n $selects"
  }

  /** ANN recall@k audit (operators.Similarity.recallAudit): the q36
    * IVF pipeline intersected with the q27 exact ranking, hit counts
    * per query.
    */
  def annRecallSql(k: Int = 10, ncells: Int = 16, nprobe: Int = 4, dim: Int = 64): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     cells AS (
       SELECT vec_id, embedding, cell FROM (
         SELECT e.vec_id, e.embedding, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1),
     probes AS (
       SELECT query_id, cell FROM (
         SELECT e.vec_id AS query_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS prn
         FROM embeddings e CROSS JOIN seeds s WHERE e.vec_id < 8) WHERE prn <= $nprobe),
     qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
     approx AS (
       SELECT query_id, neighbor_id FROM (
         SELECT p.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
             ORDER BY ${cosineSql("q.embedding", "c.embedding", dim)} DESC, c.vec_id) AS rank
         FROM probes p
         JOIN cells c ON c.cell = p.cell
         JOIN qv q ON q.vec_id = p.query_id
         WHERE c.vec_id <> p.query_id) WHERE rank <= $k),
     exact AS (
       SELECT query_id, neighbor_id FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
         FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         WHERE q.vec_id < 8) WHERE rank <= $k),
     hits AS (
       SELECT e.query_id, COUNT(*) AS n_hits
       FROM exact e JOIN approx a USING (query_id, neighbor_id) GROUP BY 1)
     SELECT q.vec_id AS query_id, CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $k AS recall_at_k
     FROM qv q LEFT JOIN hits h ON h.query_id = q.vec_id"""

  /** Matryoshka truncated-dimension recall
    * (operators.Similarity.truncatedRecall): both arms brute-force —
    * the exact arm over full vectors (list_cosine_similarity, the
    * annRecallSql contract), the truncated arm over the first `dims`
    * components via the unrolled cosineSql (identical accumulation
    * order to the Spark kernel on the sliced array).
    */
  def truncatedRecallSql(dims: Int = 16, k: Int = 10, dim: Int = 64,
                         queryMax: Int = 8): String =
    s"""WITH qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $queryMax),
     exact AS (
       SELECT query_id, neighbor_id FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
         FROM qv q JOIN embeddings c ON c.vec_id <> q.vec_id) WHERE rank <= $k),
     approx AS (
       SELECT query_id, neighbor_id FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ${cosineSql("q.embedding", "c.embedding", dims)} DESC, c.vec_id) AS rank
         FROM qv q JOIN embeddings c ON c.vec_id <> q.vec_id) WHERE rank <= $k),
     hits AS (
       SELECT e.query_id, COUNT(*) AS n_hits
       FROM exact e JOIN approx a USING (query_id, neighbor_id) GROUP BY 1)
     SELECT q.vec_id AS query_id, CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $k AS recall_at_k
     FROM qv q LEFT JOIN hits h ON h.query_id = q.vec_id"""

  /** One k-means|| oversampling round
    * (operators.Similarity.kmeansOversample): md5-frac coin vs
    * l·d²/cost, d² micro-quantized, cost its exact integer sum.
    */
  def kmeansOversampleSql(ncells: Int = 16, l: Int = 32, dim: Int = 64): String =
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     best AS (
       SELECT vec_id, cell, cos FROM (
         SELECT e.vec_id, s.cell,
           ${cosineSql("e.embedding", "s.sv", dim)} AS cos,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1),
     scored AS (
       SELECT vec_id, cell,
         CAST(floor((1.0 - cos) * (1.0 - cos) * 1e12 + 0.5) AS BIGINT) AS d2q
       FROM best),
     c AS (SELECT CAST(SUM(d2q) AS DOUBLE) AS cost FROM scored)
     SELECT vec_id, CAST(cell AS INT) AS cell,
       CAST(d2q AS DOUBLE) / 1e12 AS d2
     FROM scored, c
     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
             / 1152921504606846976.0
           < $l * CAST(d2q AS DOUBLE) / cost"""

  /** Full semantic-dedup pipeline (operators.Dedup.semanticDedup):
    * bucketed pairs with cosine ≥ `minCos` → connected components
    * (recursive CTE) → keep = component minimum; vectors in no
    * qualifying pair keep trivially. Cosines are bit-identical across
    * engines (see [[cosineSql]]), so the threshold cut is exact.
    */
  def semanticDedupSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                       cap: Int = 40): String =
    s"""WITH RECURSIVE b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS (SELECT vec_a AS a, vec_b AS bb FROM prs
               UNION SELECT vec_b, vec_a FROM prs),
     reach(node, lbl) AS (
       SELECT a, a FROM edges
       UNION
       SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.bb = r.node),
     comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
     SELECT v.vec_id, (c.node IS NULL OR c.node = c.component) AS keep
     FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.node"""

  /** PageRank over the bucketed embedding-similarity graph
    * (operators.Graph.pageRank on Dedup.embeddingPairs ≥ minCos):
    * edges/degrees rebuilt from the same hyperplane pipeline, the
    * `iters` rounds UNROLLED as CTEs. Teleport constants derive from
    * exact integer division (dampNum/dampDen rationals) and per-edge
    * contributions quantize to DECIMAL(30,15) before each sum —
    * the identical arithmetic of the Spark rounds, so final ranks
    * hash-match bit-for-bit.
    */
  def pageRankSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                  cap: Int = 40, iters: Int = 3,
                  dampNum: Int = 17, dampDen: Int = 20): String = {
    val baseNum = dampDen - dampNum
    def iter(prev: String, out: String): String =
      s"""$out AS (
         SELECT e.dst AS node,
           CAST($baseNum AS DOUBLE) / (CAST($dampDen AS DOUBLE) * CAST(nv.n AS DOUBLE))
             + (CAST($dampNum AS DOUBLE) / CAST($dampDen AS DOUBLE))
               * CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(30,15))) AS DOUBLE) AS pr
         FROM edges e
         JOIN $prev p ON p.node = e.src
         JOIN deg d ON d.src = e.src
         CROSS JOIN nv
         GROUP BY e.dst, nv.n)"""
    val its = (1 to iters).map(i => iter(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS (SELECT vec_a AS src, vec_b AS dst FROM prs
               UNION SELECT vec_b, vec_a FROM prs),
     deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     nv AS (SELECT COUNT(*) AS n FROM deg),
     pr0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS pr
             FROM deg CROSS JOIN nv),
     ${its.mkString(",\n     ")}
     SELECT node, pr FROM it$iters"""
  }

  /** Label propagation over the bucketed embedding-similarity graph
    * (operators.Graph.labelPropagation on Dedup.embeddingPairs ≥
    * minCos): the same pair pipeline, `iters` rounds unrolled as
    * MATERIALIZED CTEs (the kCore lesson — DuckDB inlines multiply-
    * referenced CTEs, so an unmaterialized unroll re-runs the full
    * upstream pipeline per reference). Vote = (count DESC, label)
    * row_number — pure integer arithmetic, no float anywhere.
    */
  def labelPropSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                   cap: Int = 40, iters: Int = 2): String = {
    def round(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         SELECT node, label FROM (
           SELECT e.src AS node, p.label,
             ROW_NUMBER() OVER (PARTITION BY e.src
               ORDER BY COUNT(*) DESC, p.label) AS rn
           FROM edges e JOIN $prev p ON p.node = e.dst
           GROUP BY e.src, p.label)
         WHERE rn = 1)"""
    val rounds = (1 to iters).map(i =>
      round(if (i == 1) "l0" else s"l${i - 1}", s"l$i"))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
     ${rounds.mkString(",\n     ")}
     SELECT node, label FROM l$iters"""
  }

  /** Triangle counts over the bucketed embedding-similarity graph
    * (operators.Graph.triangleCounts on Dedup.embeddingPairs ≥ minCos):
    * the same pair pipeline, then the identical (degree, id) edge
    * orientation — each triangle closes exactly one oriented wedge, so
    * both engines count the same integer set.
    */
  def triangleSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                  cap: Int = 40): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS (SELECT vec_a AS src, vec_b AS dst FROM prs
               UNION SELECT vec_b, vec_a FROM prs),
     deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     o AS (
       SELECT e.src, e.dst, dd.deg AS dg FROM edges e
       JOIN deg ds ON ds.src = e.src
       JOIN deg dd ON dd.src = e.dst
       WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
     wed AS (
       SELECT o1.src AS a, o1.dst AS b, o2.dst AS c FROM o o1 JOIN o o2 ON o1.src = o2.src
       WHERE o1.dg < o2.dg OR (o1.dg = o2.dg AND o1.dst < o2.dst)),
     tri AS (SELECT a, b, c FROM wed JOIN o ON o.src = wed.b AND o.dst = wed.c),
     pn AS (
       SELECT node, COUNT(*) AS n_triangles FROM (
         SELECT a AS node FROM tri
         UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) GROUP BY 1)
     SELECT pn.node, pn.n_triangles,
       (SELECT COUNT(*) FROM tri) AS total_triangles FROM pn"""

  /** k-core membership over the bucketed embedding-similarity graph
    * (operators.Graph.kCore on Dedup.embeddingPairs ≥ minCos): the
    * same pair pipeline, then the iterative peel UNROLLED as `rounds`
    * fixed CTE rounds (each: degree filter ≥ k on both endpoints).
    * Spark iterates to an asserted fixpoint; the peel is monotone, so
    * once converged every extra unrolled round is the identity — the
    * oracle only needs rounds ≥ the gate corpus' peel depth (checked
    * by the compare itself: an unconverged oracle mismatches).
    */
  def kCoreSql(minCos: Double = 0.1, nbits: Int = 6, dim: Int = 64,
               cap: Int = 40, k: Int = 2, rounds: Int = 8): String = {
    // every round references its predecessor THREE times (edges + both
    // endpoint filters): AS MATERIALIZED pins each round to evaluate
    // once — inlined, the pair pipeline would re-run 3^rounds times
    def peel(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         SELECT e.src, e.dst FROM $prev e
         JOIN (SELECT src FROM $prev GROUP BY src HAVING COUNT(*) >= $k) ka ON e.src = ka.src
         JOIN (SELECT src FROM $prev GROUP BY src HAVING COUNT(*) >= $k) kb ON e.dst = kb.src)"""
    val its = (1 to rounds).map(i => peel(if (i == 1) "e0" else s"e${i - 1}", s"e$i"))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     e0 AS MATERIALIZED (SELECT vec_a AS src, vec_b AS dst FROM prs
            UNION SELECT vec_b, vec_a FROM prs),
     ${its.mkString(",\n     ")}
     SELECT src AS node, COUNT(*) AS core_degree FROM e$rounds GROUP BY 1"""
  }

  /** Resource-allocation link prediction (Graph.raLinkPrediction on
    * Dedup.embeddingPairs ≥ minCos): identical pair prelude to
    * [[kCoreSql]], then degrees, hub-capped common-neighbor shares
    * (exact integer 10⁹ // deg), neighbor-pair enumeration through
    * the shared w, and a NOT EXISTS drop of already-present edges.
    */
  def raLinksSql(minCos: Double = 0.1, nbits: Int = 6, dim: Int = 64,
                 cap: Int = 40, maxDeg: Long = 1000L): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS (SELECT vec_a AS src, vec_b AS dst FROM prs
               UNION SELECT vec_b, vec_a FROM prs),
     deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     nbr AS (
       SELECT e.src AS w, e.dst AS u, 1000000000 // d.deg AS share
       FROM edges e JOIN deg d ON d.src = e.src WHERE d.deg <= $maxDeg),
     cand AS (
       SELECT n1.u AS node_a, n2.u AS node_b, n1.share
       FROM nbr n1 JOIN nbr n2 ON n1.w = n2.w AND n1.u < n2.u),
     scored AS (
       SELECT node_a, node_b, COUNT(*) AS cn, CAST(SUM(share) AS BIGINT) AS ra_q
       FROM cand GROUP BY 1, 2)
     SELECT s.node_a, s.node_b, s.cn, s.ra_q FROM scored s
     WHERE NOT EXISTS (SELECT 1 FROM edges e
       WHERE e.src = s.node_a AND e.dst = s.node_b)"""

  /** Jaccard link prediction (Graph.jaccardLinkPrediction on
    * Dedup.embeddingPairs ≥ minCos): the raLinksSql pair prelude and
    * hub-capped wedge enumeration, union sizes from FULL degrees,
    * jaccard = one rounded double division of exact counts.
    */
  def jaccardLinksSql(minCos: Double = 0.1, nbits: Int = 6, dim: Int = 64,
                      cap: Int = 40, maxDeg: Long = 1000L): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     nbr AS (
       SELECT e.src AS w, e.dst AS u
       FROM edges e JOIN deg d ON d.src = e.src WHERE d.deg <= $maxDeg),
     cand AS (
       SELECT n1.u AS node_a, n2.u AS node_b
       FROM nbr n1 JOIN nbr n2 ON n1.w = n2.w AND n1.u < n2.u),
     cn AS (
       SELECT node_a, node_b, COUNT(*) AS cn FROM cand GROUP BY 1, 2),
     kept AS (
       SELECT c.node_a, c.node_b, c.cn FROM cn c
       WHERE NOT EXISTS (SELECT 1 FROM edges e
         WHERE e.src = c.node_a AND e.dst = c.node_b))
     SELECT k.node_a, k.node_b, k.cn,
       da.deg + db.deg - k.cn AS n_union,
       round(CAST(k.cn AS DOUBLE)
         / CAST(da.deg + db.deg - k.cn AS DOUBLE), 9) AS jaccard
     FROM kept k
     JOIN deg da ON da.src = k.node_a
     JOIN deg db ON db.src = k.node_b"""

  /** PQ encoding (operators.Similarity.pqEncode): the codebook is
    * rebuilt in SQL from the same smallest-md5 seed rows, and each
    * subspace's L2 sum is unrolled in the identical left-associative
    * double order, so the argmin codes hash-match exactly.
    */
  def pqSql(m: Int = 8, ksub: Int = 16, dim: Int = 64): String = {
    require(dim % m == 0)
    val w = dim / m
    def l2(j: Int): String = (0 until w).map { i =>
      val idx = j * w + i + 1
      s"(CAST(e.embedding[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE)) * " +
        s"(CAST(e.embedding[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE))"
    }.mkString("(", " + ", ")")
    val subqs = (0 until m).map(j =>
      s"SELECT e.vec_id, $j AS subspace, s.cid, ${l2(j)} AS d " +
        "FROM embeddings e CROSS JOIN seeds s").mkString("\n       UNION ALL ")
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cid FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ksub),
     d AS ($subqs)
     SELECT vec_id, subspace, code FROM (
       SELECT vec_id, subspace, cid AS code,
         ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, cid) AS rn
       FROM d) WHERE rn = 1"""
  }

  /** PQ-ADC top-k (operators.Similarity.pqTopK, q70 query set
    * `vec_id < 8`): codes + per-query LUT rebuilt from the same seeds,
    * LUT entries DECIMAL(20,10)-quantized before the sum so the
    * m-term additions are exact on both engines.
    */
  def pqAdcSql(m: Int = 8, ksub: Int = 16, dim: Int = 64, k: Int = 10): String = {
    require(dim % m == 0)
    val w = dim / m
    def l2(vec: String, j: Int): String = (0 until w).map { i =>
      val idx = j * w + i + 1
      s"(CAST($vec[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE)) * " +
        s"(CAST($vec[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE))"
    }.mkString("(", " + ", ")")
    val codeSubqs = (0 until m).map(j =>
      s"SELECT e.vec_id, $j AS subspace, s.cid, ${l2("e.embedding", j)} AS d " +
        "FROM embeddings e CROSS JOIN seeds s").mkString("\n       UNION ALL ")
    val lutSubqs = (0 until m).map(j =>
      s"SELECT q.vec_id AS query_id, $j AS subspace, s.cid AS code, " +
        s"CAST(${l2("q.embedding", j)} AS DECIMAL(20,10)) AS d " +
        "FROM embeddings q CROSS JOIN seeds s WHERE q.vec_id < 8").mkString("\n       UNION ALL ")
    s"""WITH seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cid FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ksub),
     cd AS ($codeSubqs),
     codes AS (
       SELECT vec_id AS neighbor_id, subspace, code FROM (
         SELECT vec_id, subspace, cid AS code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, cid) AS rn
         FROM cd) WHERE rn = 1),
     lut AS ($lutSubqs),
     adc AS (
       SELECT l.query_id, c.neighbor_id, SUM(l.d) AS adc
       FROM codes c JOIN lut l ON c.subspace = l.subspace AND c.code = l.code
       WHERE c.neighbor_id <> l.query_id
       GROUP BY 1, 2)
     SELECT query_id, neighbor_id, round(CAST(adc AS DOUBLE), 6) AS adc, rank FROM (
       SELECT query_id, neighbor_id, adc,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id) AS INT) AS rank
       FROM adc) WHERE rank <= $k"""
  }

  /** Markov removal-effect attribution
    * (operators.Behavior.removalEffect): journey construction +
    * transition matrix in plain SQL, then `rounds` value-iteration
    * steps unrolled as CTEs — each round the EXACT arithmetic of the
    * Spark loop (p·v products quantized to DECIMAL(20,10) pre-sum, v
    * carried as exact 1e-10-unit BIGINTs between rounds, never a
    * decimal→double cast).
    */
  def removalEffectSql(channels: Seq[String], convType: String = "purchase",
                       rounds: Int = 16): String = {
    val scenList = ("'__FULL__'" +: channels.map(c => s"'$c'")).mkString(", ")
    // AS MATERIALIZED on pc/pt and every round: the kCore lesson —
    // DuckDB inlines plain CTEs, so without pinning each of the
    // `rounds` levels re-expands the ENTIRE journey pipeline (v_r →
    // v_{r-1} chain, ×(pc + pt) per level): measured 8 minutes and an
    // allocator OOM at sf0.01 inside the shared gate connection;
    // materialized, the same query runs in seconds.
    def vRound(r: Int): String =
      s"""v$r AS MATERIALIZED (SELECT c.scenario, c.state,
           CAST((COALESCE(st.st, CAST(0 AS DECIMAL(20,10))) + c.pconv) * 10000000000 AS BIGINT) AS vu
         FROM pc c LEFT JOIN (
           SELECT p.scenario, p.from_s AS state,
             SUM(CAST(p.p * (CAST(v.vu AS DOUBLE) / 1e10) AS DECIMAL(20,10))) AS st
           FROM pt p JOIN v${r - 1} v ON v.scenario = p.scenario AND v.state = p.to_s
           GROUP BY 1, 2) st ON st.scenario = c.scenario AND st.state = c.state)"""
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
       j AS (
         SELECT user_id, event_id, tus, event_type,
           CASE WHEN event_type = '$convType' THEN 1 ELSE 0 END AS ic,
           SUM(CASE WHEN event_type = '$convType' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CASE WHEN event_type = '$convType' THEN 1 ELSE 0 END AS jid
         FROM e),
       ab AS (SELECT user_id, jid, MAX(ic) AS abs_,
                COUNT(CASE WHEN event_type <> '$convType' THEN 1 END) AS nch
              FROM j GROUP BY 1, 2),
       chs AS (
         SELECT user_id, jid, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id, jid ORDER BY tus, event_id) AS nxt,
           ROW_NUMBER() OVER (PARTITION BY user_id, jid ORDER BY tus, event_id) AS rn
         FROM j WHERE event_type <> '$convType'),
       tr AS (
         SELECT '__START__' AS from_s, event_type AS to_s FROM chs WHERE rn = 1
         UNION ALL SELECT event_type, nxt FROM chs WHERE nxt IS NOT NULL
         UNION ALL SELECT c.event_type,
             CASE WHEN a.abs_ = 1 THEN '__CONV__' ELSE '__NULL__' END
           FROM chs c JOIN ab a ON c.user_id = a.user_id AND c.jid = a.jid
           WHERE c.nxt IS NULL
         UNION ALL SELECT '__START__', '__CONV__' FROM ab WHERE abs_ = 1 AND nch = 0),
       tc AS (SELECT from_s, to_s, COUNT(*) AS n FROM tr GROUP BY 1, 2),
       tt AS (SELECT from_s, SUM(n) AS tot FROM tc GROUP BY 1),
       pm AS (SELECT from_s, to_s, ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS p
              FROM tc JOIN tt USING (from_s)),
       sc AS (SELECT unnest([$scenList]) AS scenario),
       ps AS (SELECT s.scenario, p.from_s, p.to_s, p.p FROM pm p CROSS JOIN sc s
              WHERE s.scenario = '__FULL__'
                 OR (p.from_s <> s.scenario AND p.to_s <> s.scenario)),
       sts AS (SELECT DISTINCT scenario, from_s AS state FROM ps),
       pc AS MATERIALIZED (SELECT s.scenario, s.state,
                CAST(COALESCE(p.p, 0) AS DECIMAL(20,10)) AS pconv
              FROM sts s LEFT JOIN
                (SELECT scenario, from_s AS state, p FROM ps WHERE to_s = '__CONV__') p
                ON p.scenario = s.scenario AND p.state = s.state),
       pt AS MATERIALIZED (SELECT scenario, from_s, to_s, p FROM ps
              WHERE to_s NOT IN ('__CONV__', '__NULL__')),
       v0 AS (SELECT scenario, state, CAST(0 AS BIGINT) AS vu FROM pc),
       ${(1 to rounds).map(vRound).mkString(",\n       ")},
       pa AS (SELECT scenario, vu FROM v$rounds WHERE state = '__START__'),
       uf AS (SELECT vu AS uf FROM pa WHERE scenario = '__FULL__'),
       re AS (SELECT scenario AS channel,
                CAST(ROUND((CAST(1 AS DOUBLE) - CAST(vu AS DOUBLE) / CAST(uf AS DOUBLE)) * 1e9, 0) AS BIGINT) AS re_u
              FROM pa CROSS JOIN uf WHERE scenario <> '__FULL__'),
       rt AS (SELECT SUM(re_u) AS re_tot FROM re),
       cv AS (SELECT CAST(COALESCE(SUM(CAST(FLOOR(value * 1e4 + 0.5) AS DECIMAL(38,0))), 0) AS BIGINT) AS cvq
              FROM events WHERE event_type = '$convType')
       SELECT channel, CAST(re_u AS DOUBLE) / 1e9 AS removal_effect,
         ROUND(CAST(re_u AS DOUBLE) / CAST(re_tot AS DOUBLE), 6) AS credit_share,
         ROUND(CAST(re_u AS DOUBLE) / CAST(re_tot AS DOUBLE) * (CAST(cvq AS DOUBLE) / 1e4), 4) AS attributed_value
       FROM re CROSS JOIN rt CROSS JOIN cv"""
  }

  /** Rolling-hash fingerprint (functions.TextFunctions.fingerprint). */
  def fingerprintSql: String =
    s"""WITH t AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents)
     SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(w, x -> ${portableHashSql("x")})),
         (acc, hx) -> (acc * 31 + hx) % $P) AS fp
     FROM t"""

  /** Local clustering coefficient (operators.Graph.clusteringCoefficient
    * over Dedup.embeddingPairs): the triangleSql pipeline — identical
    * bucketing, capping, cosine gate, (deg,id) orientation, wedge
    * closure — finished with the degree join and the mirrored
    * cc = 2T/(d(d−1)) double instead of the global roll-up.
    */
  def clusteringSql(minCos: Double = 0.1, nbits: Int = 6, dim: Int = 64,
                    cap: Int = 40): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS (SELECT vec_a AS src, vec_b AS dst FROM prs
               UNION SELECT vec_b, vec_a FROM prs),
     deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     o AS (
       SELECT e.src, e.dst, dd.deg AS dg FROM edges e
       JOIN deg ds ON ds.src = e.src
       JOIN deg dd ON dd.src = e.dst
       WHERE ds.deg < dd.deg OR (ds.deg = dd.deg AND e.src < e.dst)),
     wed AS (
       SELECT o1.src AS a, o1.dst AS b, o2.dst AS c FROM o o1 JOIN o o2 ON o1.src = o2.src
       WHERE o1.dg < o2.dg OR (o1.dg = o2.dg AND o1.dst < o2.dst)),
     tri AS (SELECT a, b, c FROM wed JOIN o ON o.src = wed.b AND o.dst = wed.c),
     pn AS (
       SELECT node, COUNT(*) AS n_triangles FROM (
         SELECT a AS node FROM tri
         UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) GROUP BY 1)
     SELECT d.src AS node, d.deg, COALESCE(pn.n_triangles, 0) AS n_triangles,
       CASE WHEN d.deg >= 2 THEN
         round(2.0 * CAST(COALESCE(pn.n_triangles, 0) AS DOUBLE)
           / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)), 9)
       END AS cc
     FROM deg d LEFT JOIN pn ON pn.node = d.src"""

  /** Poisson bootstrap CI (functions.Eval.bootstrapCiMean): replicate
    * multiplicities from the SAME md5-uniform + integer CDF thresholds
    * ([[graft.functions.Eval.PoissonThresholds32]], inlined here from
    * the one Scala definition), replicate means as mirrored double
    * divisions, exact cross-multiply rank selection of the percentile
    * interval over the B means.
    */
  def bootstrapCiSql(groupExpr: String, valueExpr: String, idExpr: String,
                     table: String, b: Int = 100, unitScale: Long = 1000000L,
                     alphaNum: Long = 5L, alphaDen: Long = 100L,
                     groupAlias: String = "event_type"): String = {
    val th = graft.functions.Eval.PoissonThresholds32
    val mCase = th.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")
    val aList = (0 until b).map(graft.functions.Hashing.affineA).mkString("[", ", ", "]")
    val bList = (0 until b).map(graft.functions.Hashing.affineB).mkString("[", ", ", "]")
    s"""WITH base AS (
       SELECT $groupExpr AS g,
         CAST(floor(CAST($valueExpr AS DOUBLE) * $unitScale + 0.5) AS BIGINT) AS v,
         ('0x' || substr(md5('bs|' || CAST($idExpr AS VARCHAR)), 1, 8))::BIGINT % $P AS hb
       FROM $table),
     reps AS (
       SELECT g, v, r.r,
         (list_extract($aList, r.r + 1) * hb + list_extract($bList, r.r + 1)) % $P AS h
       FROM base CROSS JOIN (SELECT unnest(range(0, $b)) AS r) r),
     mm AS (SELECT g, r, v, $mCase AS m FROM reps),
     means AS (
       SELECT g, r, SUM(CAST(m AS HUGEINT) * v) AS sv, SUM(m) AS sm
       FROM mm GROUP BY 1, 2 HAVING SUM(m) > 0),
     mv AS (
       SELECT g, (CAST(sv AS DOUBLE) / CAST(sm AS DOUBLE)) / $unitScale.0 AS mean_r
       FROM means),
     ranked AS (
       SELECT g, mean_r,
         COUNT(*) OVER (PARTITION BY g ORDER BY mean_r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         COUNT(*) OVER (PARTITION BY g) AS nb
       FROM mv),
     lo AS (SELECT g, MIN(mean_r) AS lo FROM ranked
            WHERE cum * ${2 * alphaDen} >= nb * $alphaNum GROUP BY 1),
     hi AS (SELECT g, MIN(mean_r) AS hi FROM ranked
            WHERE cum * ${2 * alphaDen} >= nb * ${2 * alphaDen - alphaNum} GROUP BY 1),
     overall AS (
       SELECT g, COUNT(*) AS n, SUM(CAST(v AS HUGEINT)) AS s FROM base GROUP BY 1)
     SELECT o.g AS $groupAlias, o.n,
       round((CAST(o.s AS DOUBLE) / CAST(o.n AS DOUBLE)) / $unitScale.0, 9) AS mean,
       round(lo.lo, 9) AS ci_lo, round(hi.hi, 9) AS ci_hi
     FROM overall o JOIN lo ON o.g = lo.g JOIN hi ON o.g = hi.g"""
  }

  /** Personalized PageRank over the bucketed embedding-similarity
    * graph (Graph.personalizedPageRank on Dedup.embeddingPairs >=
    * minCos, seeds = vec_id % seedMod = 0 present in the edge list):
    * the pageRankSql arithmetic with the teleport restricted to the
    * seed CTE; each round's spread FULL OUTER JOINs the seeds so the
    * sparse frontier frame matches Spark's row set exactly.
    */
  def pprSql(seedMod: Int, minCos: Double = 0.4, nbits: Int = 6,
             dim: Int = 64, cap: Int = 40, iters: Int = 3,
             dampNum: Int = 17, dampDen: Int = 20): String = {
    val baseNum = dampDen - dampNum
    // contributions quantize by integer floor(x*1e15 + 0.5), mirroring
    // Graph.personalizedPageRank — a double->DECIMAL cast rounds via
    // different paths on the two engines (Spark: shortest-string;
    // DuckDB: full binary expansion)
    def iter(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         SELECT COALESCE(sp.node, sd.node) AS node,
           CASE WHEN sd.node IS NOT NULL THEN
             CAST($baseNum AS DOUBLE) / (CAST($dampDen AS DOUBLE) * CAST((SELECT n FROM ns) AS DOUBLE))
           ELSE 0.0 END
           + (CAST($dampNum AS DOUBLE) / CAST($dampDen AS DOUBLE))
             * (COALESCE(CAST(sp.csum AS DOUBLE), 0.0) / 1000000000000000.0) AS pr
         FROM (SELECT e.dst AS node,
                 SUM(CAST(floor(p.pr / d.deg * 1000000000000000.0 + 0.5) AS HUGEINT)) AS csum
               FROM edges e
               JOIN $prev p ON p.node = e.src
               JOIN deg d ON d.src = e.src
               GROUP BY e.dst) sp
         FULL OUTER JOIN seeds sd ON sd.node = sp.node)"""
    val its = (1 to iters).map(i => iter(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     seeds AS MATERIALIZED (
       SELECT DISTINCT vec_id AS node FROM embeddings
       WHERE vec_id % $seedMod = 0 AND vec_id IN (SELECT src FROM deg)),
     ns AS (SELECT COUNT(*) AS n FROM seeds),
     pr0 AS (SELECT node, CAST(1 AS DOUBLE) / CAST((SELECT n FROM ns) AS DOUBLE) AS pr
             FROM seeds),
     ${its.mkString(",\n     ")}
     SELECT node, pr FROM it$iters"""
  }

  /** Degree assortativity over the bucketed embedding-similarity
    * graph (Graph.assortativity on Dedup.embeddingPairs >= minCos):
    * same pair prelude, Pearson of endpoint degrees over the directed
    * edge list from exact HUGEINT sums, one mirrored double formula.
    */
  def assortativitySql(minCos: Double = 0.4, nbits: Int = 6,
                       dim: Int = 64, cap: Int = 40): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     j AS (
       SELECT dx.deg AS x, dy.deg AS y
       FROM edges e JOIN deg dx ON dx.src = e.src JOIN deg dy ON dy.src = e.dst),
     s AS (
       SELECT COUNT(*) AS m,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
       FROM j)
     SELECT CAST(m AS BIGINT) AS n_directed_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
         round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
       END AS assortativity
     FROM s"""

  /** HITS over the bipartite customer→part purchase graph
    * (operators.Graph.hits, iters alternating rounds unrolled as
    * MATERIALIZED CTEs): per-edge contributions quantize by integer
    * floor(score·10¹⁵ + ½) exactly like the Spark side (the pprSql
    * rule — double→DECIMAL casts round differently between engines),
    * each round's L1 normalization is one double division of two
    * exact integer sums.
    */
  def hitsSql(iters: Int = 2): String = {
    def half(prev: String, tag: String, edgeKey: String, outKey: String): Seq[String] = Seq(
      s"""${tag}s AS MATERIALIZED (
       SELECT e.$outKey AS node,
         SUM(CAST(floor(p.score * 1000000000000000.0 + 0.5) AS HUGEINT)) AS s
       FROM edges e JOIN $prev p ON p.node = e.$edgeKey
       GROUP BY 1)""",
      s"""$tag AS MATERIALIZED (
       SELECT node, CAST(s AS DOUBLE)
         / CAST((SELECT SUM(s) FROM ${tag}s) AS DOUBLE) AS score
       FROM ${tag}s)""")
    val rounds = (1 to iters).flatMap { i =>
      half(if (i == 1) "h0" else s"h${i - 1}", s"a$i", "src", "dst") ++
        half(s"a$i", s"h$i", "dst", "src")
    }
    s"""WITH edges AS MATERIALIZED (
       SELECT DISTINCT o_custkey AS src, l_partkey AS dst
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
     nh AS (SELECT COUNT(DISTINCT src) AS n FROM edges),
     h0 AS (SELECT DISTINCT src AS node,
              1.0 / CAST((SELECT n FROM nh) AS DOUBLE) AS score FROM edges),
     ${rounds.mkString(",\n     ")}
     SELECT 'hub' AS side, node, round(score, 9) AS score FROM h$iters
     UNION ALL
     SELECT 'authority', node, round(score, 9) FROM a$iters"""
  }

  /** Multi-source BFS hop-distance histogram over the bucketed
    * embedding-similarity graph (Graph.bfsDistances on
    * Dedup.embeddingPairs ≥ minCos, seeds = vec_id % seedMod):
    * relaxation rounds unrolled as MATERIALIZED CTEs — min-hop per
    * node is unique regardless of expansion order, so the simple
    * full-relaxation unroll matches the frontier-optimized plan.
    */
  def bfsSql(seedMod: Int, maxDepth: Int = 3, minCos: Double = 0.1,
             nbits: Int = 6, dim: Int = 64, cap: Int = 40): String = {
    def relax(prev: String, r: Int): String =
      s"""d$r AS MATERIALIZED (
       SELECT node, MIN(dist) AS dist FROM (
         SELECT node, dist FROM $prev
         UNION ALL
         SELECT e.dst AS node, $r AS dist
         FROM edges e JOIN $prev p ON p.node = e.src) GROUP BY 1)"""
    val rounds = (1 to maxDepth).map(r => relax(s"d${r - 1}", r))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     d0 AS MATERIALIZED (
       SELECT DISTINCT vec_id AS node, 0 AS dist FROM embeddings
       WHERE vec_id % $seedMod = 0 AND vec_id IN (SELECT src FROM edges)),
     ${rounds.mkString(",\n     ")}
     SELECT CAST(dist AS INT) AS dist, COUNT(*) AS n_nodes
     FROM d$maxDepth GROUP BY 1"""
  }

  /** Hill tail-index of the similarity graph's degree distribution
    * (operators.Graph.degreeTailAlpha on Dedup.embeddingPairs ≥
    * minCos): the raLinksSql pair prelude; top-(k+1) exact rank
    * selection tie-broken by node; each ln(dᵢ)−ln(d_{k+1}) term (the
    * difference form, mirroring the Spark expression exactly)
    * quantized DECIMAL(20,9) pre-sum.
    */
  def degreeTailSql(k: Int = 50, minCos: Double = 0.1, nbits: Int = 6,
                    dim: Int = 64, cap: Int = 40): String =
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     deg AS (
       SELECT node, COUNT(*) AS deg FROM (
         SELECT vec_a AS node FROM prs UNION ALL SELECT vec_b FROM prs)
       GROUP BY 1),
     top AS (
       SELECT node, deg, ROW_NUMBER() OVER (ORDER BY deg DESC, node) AS rk
       FROM deg),
     ref AS (SELECT deg AS dref FROM top WHERE rk = ${k + 1}),
     terms AS (
       SELECT CAST(ln(CAST(t.deg AS DOUBLE)) - ln(CAST(r.dref AS DOUBLE))
         AS DECIMAL(20,9)) AS tm
       FROM top t, ref r WHERE t.rk <= $k AND r.dref > 0)
     SELECT CAST(COUNT(*) AS INT) AS k,
       round(CAST($k AS DOUBLE) / CAST(SUM(tm) AS DOUBLE), 9) AS alpha
     FROM terms"""

  /** Shared weighted-edge prelude (r8): the bucketed similarity pairs
    * WITH their cosine, symmetrized, weights quantized to integer
    * units (floor(cos·scale + ½)), duplicate orientations collapsed
    * to max, zero-quantum edges dropped — mirrors
    * Graph.pageRankWeighted's edge construction exactly.
    */
  private def weightedEdgesPrelude(minCos: Double, nbits: Int, dim: Int,
                                   cap: Int, weightScale: Long): String =
    s"""b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         ${cosineSql("a.embedding", "b2.embedding", dim)} AS cos
       FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     e0 AS (
       SELECT vec_a AS src, vec_b AS dst,
         CAST(floor(cos * $weightScale + 0.5) AS BIGINT) AS wq FROM prs
       UNION ALL
       SELECT vec_b, vec_a, CAST(floor(cos * $weightScale + 0.5) AS BIGINT) FROM prs),
     edges AS MATERIALIZED (
       SELECT src, dst, MAX(wq) AS wq FROM e0 GROUP BY 1, 2 HAVING MAX(wq) > 0),
     ws AS MATERIALIZED (SELECT src, SUM(wq) AS wtot FROM edges GROUP BY src)"""

  /** Weighted PageRank (Graph.pageRankWeighted over
    * Dedup.embeddingPairs ≥ minCos with the cosine as edge weight):
    * contributions floor(pr·wq/Wq·10¹⁵ + ½) summed as HUGEINT —
    * the pprSql integer-quantization contract with weight-proportional
    * spread.
    */
  def pageRankWeightedSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                          cap: Int = 40, iters: Int = 3,
                          dampNum: Int = 17, dampDen: Int = 20,
                          weightScale: Long = 1000000L): String = {
    val baseNum = dampDen - dampNum
    def iter(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         SELECT e.dst AS node,
           CAST($baseNum AS DOUBLE) / (CAST($dampDen AS DOUBLE) * CAST(nv.n AS DOUBLE))
             + (CAST($dampNum AS DOUBLE) / CAST($dampDen AS DOUBLE))
               * (CAST(SUM(CAST(floor(p.pr * e.wq / w.wtot * 1000000000000000.0 + 0.5)
                   AS HUGEINT)) AS DOUBLE) / 1000000000000000.0) AS pr
         FROM edges e
         JOIN $prev p ON p.node = e.src
         JOIN ws w ON w.src = e.src
         CROSS JOIN nv
         GROUP BY e.dst, nv.n)"""
    val its = (1 to iters).map(i => iter(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
    s"""WITH ${weightedEdgesPrelude(minCos, nbits, dim, cap, weightScale)},
     nv AS (SELECT COUNT(*) AS n FROM ws),
     pr0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS pr
             FROM ws CROSS JOIN nv),
     ${its.mkString(",\n     ")}
     SELECT node, pr FROM it$iters"""
  }

  /** Weighted personalized PageRank
    * (Graph.personalizedPageRankWeighted): the pprSql sparse-frontier
    * unroll with weight-proportional spread.
    */
  def pprWeightedSql(seedMod: Int, minCos: Double = 0.1, nbits: Int = 6,
                     dim: Int = 64, cap: Int = 40, iters: Int = 3,
                     dampNum: Int = 17, dampDen: Int = 20,
                     weightScale: Long = 1000000L): String = {
    val baseNum = dampDen - dampNum
    def iter(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (
         SELECT COALESCE(sp.node, sd.node) AS node,
           CASE WHEN sd.node IS NOT NULL THEN
             CAST($baseNum AS DOUBLE) / (CAST($dampDen AS DOUBLE) * CAST((SELECT n FROM ns) AS DOUBLE))
           ELSE 0.0 END
           + (CAST($dampNum AS DOUBLE) / CAST($dampDen AS DOUBLE))
             * (COALESCE(CAST(sp.csum AS DOUBLE), 0.0) / 1000000000000000.0) AS pr
         FROM (SELECT e.dst AS node,
                 SUM(CAST(floor(p.pr * e.wq / w.wtot * 1000000000000000.0 + 0.5) AS HUGEINT)) AS csum
               FROM edges e
               JOIN $prev p ON p.node = e.src
               JOIN ws w ON w.src = e.src
               GROUP BY e.dst) sp
         FULL OUTER JOIN seeds sd ON sd.node = sp.node)"""
    val its = (1 to iters).map(i => iter(if (i == 1) "pr0" else s"it${i - 1}", s"it$i"))
    s"""WITH ${weightedEdgesPrelude(minCos, nbits, dim, cap, weightScale)},
     seeds AS MATERIALIZED (
       SELECT DISTINCT vec_id AS node FROM embeddings
       WHERE vec_id % $seedMod = 0 AND vec_id IN (SELECT src FROM ws)),
     ns AS (SELECT COUNT(*) AS n FROM seeds),
     pr0 AS (SELECT node, CAST(1 AS DOUBLE) / CAST((SELECT n FROM ns) AS DOUBLE) AS pr
             FROM seeds),
     ${its.mkString(",\n     ")}
     SELECT node, pr FROM it$iters"""
  }

  /** Shared IVF-PQ candidate machinery (r8): md5-seeded IVF cells +
    * probes (ivfAnnSql) over md5-seeded PQ codes + per-query LUT
    * (pqAdcSql) — the ADC sum runs over PROBED CELLS ONLY.
    */
  private def ivfPqCandidates(ncells: Int, nprobe: Int, m: Int, ksub: Int,
                              dim: Int): String = {
    val w = dim / m
    def l2(vec: String, j: Int): String = (0 until w).map { i =>
      val idx = j * w + i + 1
      s"(CAST($vec[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE)) * " +
        s"(CAST($vec[$idx] AS DOUBLE) - CAST(s.sv[$idx] AS DOUBLE))"
    }.mkString("(", " + ", ")")
    val codeSubqs = (0 until m).map(j =>
      s"SELECT e.vec_id, $j AS subspace, s.cid, ${l2("e.embedding", j)} AS d " +
        "FROM embeddings e CROSS JOIN pqseeds s").mkString("\n       UNION ALL ")
    val lutSubqs = (0 until m).map(j =>
      s"SELECT q.vec_id AS query_id, $j AS subspace, s.cid AS code, " +
        s"CAST(${l2("q.embedding", j)} AS DECIMAL(20,10)) AS d " +
        "FROM embeddings q CROSS JOIN pqseeds s WHERE q.vec_id < 8").mkString("\n       UNION ALL ")
    s"""seeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cell FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ncells),
     pqseeds AS (
       SELECT sv, CAST(rn - 1 AS INT) AS cid FROM (
         SELECT embedding AS sv,
           ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         FROM embeddings) WHERE rn <= $ksub),
     cells AS MATERIALIZED (
       SELECT vec_id, cell FROM (
         SELECT e.vec_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS crn
         FROM embeddings e CROSS JOIN seeds s) WHERE crn = 1),
     probes AS MATERIALIZED (
       SELECT query_id, cell FROM (
         SELECT e.vec_id AS query_id, s.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ${cosineSql("e.embedding", "s.sv", dim)} DESC, s.cell) AS prn
         FROM embeddings e CROSS JOIN seeds s WHERE e.vec_id < 8) WHERE prn <= $nprobe),
     cd AS ($codeSubqs),
     codes AS MATERIALIZED (
       SELECT vec_id AS neighbor_id, subspace, code FROM (
         SELECT vec_id, subspace, cid AS code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, subspace ORDER BY d, cid) AS rn
         FROM cd) WHERE rn = 1),
     lut AS ($lutSubqs),
     adc AS MATERIALIZED (
       SELECT p.query_id, c.neighbor_id, SUM(l.d) AS adc
       FROM codes c
       JOIN cells cl ON cl.vec_id = c.neighbor_id
       JOIN probes p ON p.cell = cl.cell
       JOIN lut l ON l.query_id = p.query_id
         AND l.subspace = c.subspace AND l.code = c.code
       WHERE c.neighbor_id <> p.query_id
       GROUP BY 1, 2)"""
  }

  /** IVF-PQ top-k (operators.Similarity.ivfPqTopK, query set
    * `vec_id < 8`): the FAISS IVFADC composition, every stage
    * rebuilt from the table.
    */
  def ivfPqSql(ncells: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
               dim: Int = 64, k: Int = 10): String = {
    require(dim % m == 0)
    s"""WITH ${ivfPqCandidates(ncells, nprobe, m, ksub, dim)}
     SELECT query_id, neighbor_id, round(CAST(adc AS DOUBLE), 6) AS adc, rank FROM (
       SELECT query_id, neighbor_id, adc,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id) AS INT) AS rank
       FROM adc) WHERE rank <= $k"""
  }

  /** IVF-PQ recall@k vs exact cosine top-k
    * (operators.Similarity.ivfPqRecall): membership compare, the
    * annRecallSql contract.
    */
  def ivfPqRecallSql(ncells: Int = 16, nprobe: Int = 4, m: Int = 8,
                     ksub: Int = 16, dim: Int = 64, k: Int = 10): String = {
    require(dim % m == 0)
    s"""WITH ${ivfPqCandidates(ncells, nprobe, m, ksub, dim)},
     approx AS (
       SELECT query_id, neighbor_id FROM (
         SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY adc, neighbor_id) AS rank
         FROM adc) WHERE rank <= $k),
     exact AS (
       SELECT query_id, neighbor_id FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
         FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         WHERE q.vec_id < 8) WHERE rank <= $k),
     hits AS (
       SELECT e.query_id, COUNT(*) AS n_hits
       FROM exact e JOIN approx a USING (query_id, neighbor_id) GROUP BY 1)
     SELECT q.vec_id AS query_id, CAST(COALESCE(h.n_hits, 0) AS INT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $k AS recall_at_k
     FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
     LEFT JOIN hits h ON h.query_id = q.vec_id"""
  }

  /** Synchronous Louvain local-move rounds (Graph.louvainMove over
    * Dedup.embeddingPairs ≥ minCos): labels unrolled as MATERIALIZED
    * CTEs (the labelPropSql shape); the gain argmax is pure integer
    * arithmetic — score = 2m·e_{i→c} − k_i·d'_c in HUGEINT, ties
    * (score desc, community asc).
    */
  def louvainSql(minCos: Double = 0.4, nbits: Int = 6, dim: Int = 64,
                 cap: Int = 40, rounds: Int = 2): String = {
    def round(prev: String, r: Int): String =
      s"""dc$r AS MATERIALIZED (
         SELECT l.community, SUM(d.deg) AS dtot
         FROM $prev l JOIN deg d ON d.src = l.node GROUP BY 1),
     lk$r AS MATERIALIZED (
         SELECT e.src AS node, l.community AS c, COUNT(*) AS e_ic
         FROM edges e JOIN $prev l ON l.node = e.dst GROUP BY 1, 2),
     cd$r AS MATERIALIZED (
         SELECT node, c, MAX(e_ic) AS e_ic FROM (
           SELECT node, c, e_ic FROM lk$r
           UNION ALL SELECT node, community AS c, 0 AS e_ic FROM $prev)
         GROUP BY 1, 2),
     sc$r AS MATERIALIZED (
         SELECT cd.node, cd.c,
           CAST((SELECT m2 FROM m2t) AS HUGEINT) * cd.e_ic
             - CAST(d.deg AS HUGEINT)
               * (dc.dtot - CASE WHEN cur.community = cd.c THEN d.deg ELSE 0 END) AS score
         FROM cd$r cd
         JOIN deg d ON d.src = cd.node
         JOIN dc$r dc ON dc.community = cd.c
         JOIN $prev cur ON cur.node = cd.node),
     l$r AS MATERIALIZED (
         SELECT node, c AS community FROM (
           SELECT node, c,
             ROW_NUMBER() OVER (PARTITION BY node ORDER BY score DESC, c) AS rn
           FROM sc$r) WHERE rn = 1)"""
    val its = (1 to rounds).map(r => round(if (r == 1) "l0" else s"l${r - 1}", r))
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     prs AS (
       SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     edges AS MATERIALIZED (
       SELECT vec_a AS src, vec_b AS dst FROM prs
       UNION SELECT vec_b, vec_a FROM prs),
     deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
     m2t AS (SELECT COUNT(*) AS m2 FROM edges),
     l0 AS MATERIALIZED (SELECT src AS node, src AS community FROM deg),
     ${its.mkString(",\n     ")}
     SELECT node, community FROM l$rounds"""
  }

  /** Greedy k-center coreset (Similarity.kCenterCoreset): the
    * farthest-first traversal unrolled — each center a MATERIALIZED
    * 1-row argmax (mind desc, id), min-dist updated via the mirrored
    * 1−cosine; radius = the pick's min-dist at selection.
    */
  def kCenterSql(k: Int = 8, dim: Int = 64): String = {
    require(k >= 2)
    def cosTo(c: String) = cosineSql("d.embedding", s"$c.embedding", dim)
    val steps = (2 to k).map { i =>
      val prevD = s"d${i - 1}"
      val upd =
        if (i == 2) "" // d1 already holds the first center's distances
        else s""",
     d${i - 1} AS MATERIALIZED (
         SELECT d.vec_id, d.embedding,
           LEAST(d.mind, 1.0 - ${cosTo("c")}) AS mind
         FROM d${i - 2} d CROSS JOIN c${i - 1} c)"""
      s"""$upd,
     c$i AS MATERIALIZED (
         SELECT vec_id, embedding, mind FROM $prevD
         ORDER BY mind DESC, vec_id LIMIT 1)"""
    }
    val selects = (2 to k).map(i =>
      s"UNION ALL SELECT $i, vec_id, round(mind, 9) FROM c$i").mkString("\n     ")
    s"""WITH c1 AS MATERIALIZED (
       SELECT vec_id, embedding FROM embeddings
       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
     d1 AS MATERIALIZED (
       SELECT d.vec_id, d.embedding, 1.0 - ${cosTo("c")} AS mind
       FROM embeddings d CROSS JOIN c1 c)${steps.mkString("")}
     SELECT CAST(1 AS INT) AS pick, vec_id, CAST(NULL AS DOUBLE) AS radius FROM c1
     $selects"""
  }

  /** Incremental-dedup index lookup (Dedup.indexLookupPairs over the
    * committed band index): bands rebuilt for the whole corpus, split
    * base/batch on the doc_id%5 rule, joined on (band, bandval) —
    * collision-count scoring, threshold filter.
    */
  def bandIndexLookupSql(k: Int = 16, minSim: Double = 0.25): String = {
    val minCols = (0 until k)
      .map(i => s"MIN((${Hashing.affineA(i)} * h0 + ${Hashing.affineB(i)}) % $P) AS m$i")
      .mkString(", ")
    val sigList = (0 until k).map(i => s"m$i").mkString("[", ", ", "]")
    s"""WITH toks AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents),
     sh AS (
       SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1]
                                            for i in generate_series(1, len(w)-1)])) AS sh
       FROM toks WHERE len(w) >= 2),
     h AS (SELECT doc_id, ${portableHashSql("sh")} AS h0 FROM sh),
     sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
     banded AS (
       SELECT doc_id, band, (band * 31 + m) % $P AS bandval FROM (
         SELECT doc_id, unnest($sigList) AS m,
                unnest(generate_series(0, ${k - 1})) AS band
         FROM sig)),
     tb AS (SELECT doc_id AS corpus_id, band, bandval FROM banded WHERE doc_id % 5 <> 0),
     pb AS (SELECT doc_id AS batch_id, band, bandval FROM banded WHERE doc_id % 5 = 0),
     pairs AS (
       SELECT batch_id, corpus_id, COUNT(*) / ${k}.0 AS est_sim
       FROM pb JOIN tb USING (band, bandval)
       WHERE batch_id <> corpus_id
       GROUP BY 1, 2)
     SELECT batch_id, corpus_id, est_sim FROM pairs WHERE est_sim >= $minSim"""
  }

  /** Bloom-filter file skipping (TxTable bloomCols + readWhereKey):
    * per-file blooms REBUILT from the versioned data files
    * (`filename=true`), probe keys hashed with the same md5-affine
    * family, kept-file counts and returned rows both checked — the
    * full membership-pruning decision verified from the data alone.
    */
  def bloomSkipSql(tablePath: String, m: Int = 4096, k: Int = 3,
                   presentKey: String = "1", absentKey: String = "-7"): String = {
    def bitList(h: String) = (0 until k)
      .map(j => s"(${Hashing.affineA(j)} * $h + ${Hashing.affineB(j)}) % $P % $m")
      .mkString("[", ", ", "]")
    s"""WITH rows AS (
       SELECT o_orderkey, o_totalprice, filename
       FROM read_parquet('$tablePath/data/v1_*.parquet', filename=true)),
     hs AS (
       SELECT DISTINCT filename,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % $P AS h
       FROM rows),
     bits AS (
       SELECT DISTINCT filename, bit FROM (
         SELECT filename, unnest(${bitList("h")}) AS bit FROM hs)),
     ph AS (
       SELECT tag, ('0x' || substr(md5(kv), 1, 8))::BIGINT % $P AS h
       FROM (VALUES ('present', '$presentKey'), ('absent', '$absentKey')) AS t(tag, kv)),
     pb AS (
       SELECT DISTINCT tag, bit FROM (
         SELECT tag, unnest(${bitList("h")}) AS bit FROM ph)),
     need AS (SELECT tag, COUNT(*) AS nb FROM pb GROUP BY 1),
     hits AS (
       SELECT p.tag, b.filename, COUNT(DISTINCT p.bit) AS got
       FROM pb p JOIN bits b ON b.bit = p.bit GROUP BY 1, 2),
     kept AS (
       SELECT h.tag, COUNT(*) AS n_kept
       FROM hits h JOIN need n ON n.tag = h.tag
       WHERE h.got = n.nb GROUP BY 1),
     exp AS (
       SELECT 'present' AS tag, COUNT(*) AS n_rows,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       FROM rows WHERE CAST(o_orderkey AS VARCHAR) = '$presentKey'
       UNION ALL
       SELECT 'absent', CAST(0 AS BIGINT), CAST(NULL AS DOUBLE))
     SELECT e.tag AS label, CAST(COALESCE(kp.n_kept, 0) AS BIGINT) AS n_files_kept,
       e.n_rows, e.sum_price
     FROM exp e LEFT JOIN kept kp ON kp.tag = e.tag"""
  }

  /** Per-band summary of the MinHash band index over the post-
    * maintenance corpus (doc_id % 10 <> 1 — base minus takedowns plus
    * the appended batch), emitted TWICE (sections incremental/rebuild):
    * the incremental TxTable-maintained index and the from-scratch
    * rebuild must both hash-equal this single expected table.
    */
  def bandIndexSummarySql(k: Int = 16): String = {
    val minCols = (0 until k)
      .map(i => s"MIN((${Hashing.affineA(i)} * h0 + ${Hashing.affineB(i)}) % $P) AS m$i")
      .mkString(", ")
    val sigList = (0 until k).map(i => s"m$i").mkString("[", ", ", "]")
    s"""WITH toks AS (
       SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       FROM documents WHERE doc_id % 10 <> 1),
     sh AS (
       SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1]
                                            for i in generate_series(1, len(w)-1)])) AS sh
       FROM toks WHERE len(w) >= 2),
     h AS (SELECT doc_id, ${portableHashSql("sh")} AS h0 FROM sh),
     sig AS (SELECT doc_id, $minCols FROM h GROUP BY doc_id),
     banded AS (
       SELECT doc_id, band, (band * 31 + m) % $P AS bandval FROM (
         SELECT doc_id, unnest($sigList) AS m,
                unnest(generate_series(0, ${k - 1})) AS band
         FROM sig)),
     summary AS (
       SELECT CAST(band AS INT) AS band, COUNT(*) AS n_docs,
         COUNT(DISTINCT bandval) AS n_vals,
         CAST(SUM(((bandval % 1000003) + 1000003) % 1000003) AS BIGINT) AS checksum
       FROM banded GROUP BY 1)
     SELECT t.section, s.band, s.n_docs, s.n_vals, s.checksum
     FROM summary s
     CROSS JOIN (VALUES ('incremental'), ('rebuild')) AS t(section)"""
  }

  /** MMR greedy selection over the query-0 top-`poolK` cosine pool
    * ([[graft.operators.Similarity.mmrSelect]]): pool and pairwise
    * similarities quantized to 1e-9 longs via the SAME unrolled
    * cosine as the codegen'd kernel, then `selectK` picks unrolled as
    * CTE rounds with the integer score 7·relq − 3·maxSimq.
    */
  def mmrSql(poolK: Int = 15, dim: Int = 64): String = {
    def pick(i: Int): String = {
      val selSet = if (i == 2) "p1" else s"s${i - 1}"
      s"""c$i AS MATERIALIZED (
           SELECT p.id, p.relq, 7 * p.relq - 3 * MAX(s.simq) AS scoreq
           FROM pool p JOIN sym s ON s.ia = p.id AND s.ib IN (SELECT id FROM $selSet)
           WHERE p.id NOT IN (SELECT id FROM $selSet) GROUP BY 1, 2),
         p$i AS MATERIALIZED (SELECT * FROM c$i ORDER BY scoreq DESC, id LIMIT 1),
         s$i AS MATERIALIZED (SELECT id FROM $selSet UNION ALL SELECT id FROM p$i)"""
    }
    s"""WITH pool AS MATERIALIZED (
       SELECT id, relq FROM (
         SELECT c.vec_id AS id,
           CAST(floor(${cosineSql("q.embedding", "c.embedding", dim)}
             * 1000000000 + 0.5) AS BIGINT) AS relq,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ${cosineSql("q.embedding", "c.embedding", dim)} DESC,
                      c.vec_id) AS INT) AS rank
         FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         WHERE q.vec_id = 0)
       WHERE rank <= $poolK),
     sims AS MATERIALIZED (
       SELECT a.id AS ia, b.id AS ib,
         CAST(floor(${cosineSql("ea.embedding", "eb.embedding", dim)}
           * 1000000000 + 0.5) AS BIGINT) AS simq
       FROM pool a JOIN pool b ON a.id < b.id
       JOIN embeddings ea ON ea.vec_id = a.id
       JOIN embeddings eb ON eb.vec_id = b.id),
     sym AS MATERIALIZED (SELECT ia, ib, simq FROM sims
             UNION ALL SELECT ib, ia, simq FROM sims),
     p1 AS MATERIALIZED (SELECT id, relq, 7 * relq AS scoreq FROM pool
            ORDER BY relq DESC, id LIMIT 1),
     ${(2 to 5).map(pick).mkString(",\n     ")},
     picks AS (
       SELECT 1 AS pick, id, relq, scoreq FROM p1
       UNION ALL SELECT 2, id, relq, scoreq FROM p2
       UNION ALL SELECT 3, id, relq, scoreq FROM p3
       UNION ALL SELECT 4, id, relq, scoreq FROM p4
       UNION ALL SELECT 5, id, relq, scoreq FROM p5)
     SELECT CAST(pick AS INT) AS pick, id AS vec_id,
       round(CAST(relq AS DOUBLE) / 1000000000.0, 9) + 0.0 AS rel,
       round(CAST(scoreq AS DOUBLE) / 10000000000.0, 9) + 0.0 AS mmr
     FROM picks"""
  }

  /** k-truss over the bucketed embedding-similarity graph
    * ([[graft.operators.Graph.kTruss]] on Dedup.embeddingPairs ≥
    * minCos): the kCore oracle's pair pipeline, then the SUPPORT peel
    * unrolled as MATERIALIZED rounds (per round: per-edge common-
    * neighbor count, keep support ≥ k−2). Monotone like the k-core
    * peel — post-convergence rounds are identity, and an unconverged
    * oracle mismatches the compare by construction.
    */
  def kTrussSql(minCos: Double = 0.1, nbits: Int = 6, dim: Int = 64,
                cap: Int = 40, k: Int = 4, rounds: Int = 5): String = {
    val need = k - 2
    def peel(i: Int): String = {
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""a$i AS MATERIALIZED (SELECT u AS s, v AS d FROM $prev
           UNION ALL SELECT v, u FROM $prev),
         e$i AS MATERIALIZED (
           SELECT e.u, e.v FROM $prev e
           WHERE (SELECT COUNT(*) FROM a$i x JOIN a$i y ON x.d = y.d
                  WHERE x.s = e.u AND y.s = e.v) >= $need)"""
    }
    s"""WITH b AS (
       SELECT vec_id, embedding, ${bucketSql("embedding", nbits, dim)} AS bucket
       FROM embeddings),
     capped AS (
       SELECT vec_id, embedding, bucket FROM (
         SELECT vec_id, embedding, bucket,
           ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS bn
         FROM b) WHERE bn <= $cap),
     e0 AS MATERIALIZED (
       SELECT DISTINCT a.vec_id AS u, b2.vec_id AS v FROM capped a JOIN capped b2
         ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       WHERE ${cosineSql("a.embedding", "b2.embedding", dim)} >= $minCos),
     ${(1 to rounds).map(peel).mkString(",\n     ")},
     af AS MATERIALIZED (SELECT u AS s, v AS d FROM e$rounds
           UNION ALL SELECT v, u FROM e$rounds)
     SELECT e.u, e.v,
       CAST((SELECT COUNT(*) FROM af x JOIN af y ON x.d = y.d
         WHERE x.s = e.u AND y.s = e.v) AS BIGINT) AS support
     FROM e$rounds e"""
  }
}
