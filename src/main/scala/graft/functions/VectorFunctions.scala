package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

import graft.plans.{CosineSimilarity, DotProduct, RandomProjectVec}

/** Vector math over `array<float>` embedding columns (SURVEY.md §2
  * #34-35).
  *
  * `dot`/`cosine` are native codegen'd Catalyst expressions
  * (graft.plans.VectorExpressions): one fused Java loop per pair inside
  * WholeStageCodegen. The `*Hof` variants are the same math via Spark's
  * higher-order functions — kept as an executable specification the
  * native expressions are cross-validated against in FunctionsSpec
  * (HOFs are interpreted and 3-pass, so they lose by a wide margin on
  * the ANN hot path).
  *
  * Accumulation is sequential in element order with a double
  * accumulator, so results are deterministic (same bits every run and
  * on every cluster layout).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (normHof(a) * normHof(b))

  /** Signed random projection to `outDim` dimensions (JL/Rademacher) —
    * native codegen'd kernel sharing [[graft.plans.HyperplaneBucket]]'s
    * deterministic sign matrix; emits `array<double>`. Cosine over
    * projections is scale-free, so no 1/√k factor is applied.
    */
  def randomProject(c: Column, outDim: Int, dim: Int, seed: Int = 7): Column =
    ColumnBridge.column(RandomProjectVec(ColumnBridge.expression(c), outDim, dim, seed))

  /** Per-group embedding ISOTROPY diagnostics (Ethayarajh EMNLP'19 /
    * Mu & Viswanath's "all-but-the-top" observation): the mean pairwise
    * cosine of the group's unit vectors — computed WITHOUT any pairwise
    * work via the norm-of-sum identity Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖².
    * A healthy embedding space sits near 0 (directions spread over the
    * sphere); anisotropy collapse (every vector in one cone — the
    * classic contextual-embedding failure that sinks cosine retrieval)
    * shows as mean cosine ≫ 0. Reported with the group's mean raw
    * norm, the other drift signal retrieval monitoring watches.
    *
    * Scale shape: one map-side pass quantizes each unit vector, then
    * per-(group, position) partial-agg component sums — shuffle volume
    * is groups × dim, never rows × rows. Nothing pairwise anywhere.
    *
    * Exactness: ‖v‖² folds to exact long micro-units (floor(x²·10¹² +
    * 0.5), integer sum — order-free), so the norm is one IEEE sqrt of
    * one IEEE division both engines reproduce bit-for-bit; unit
    * components quantize to 10⁻⁹ longs; every cross sum is exact
    * DECIMAL; the only doubles are the mirrored final expressions.
    */
  def isotropyByGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
                      vecCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val xd = (x: Column) => x.cast("double")
    val ssq = aggregate(col(vecCol), lit(0L),
      (acc, x) => acc + floor(xd(x) * xd(x) * lit(1e12) + lit(0.5)).cast("long"))
    val base = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
        col(vecCol).as("_v"), ssq.as("_ssq"))
      .filter(col("_ssq") > 0L)
      .withColumn("_norm", sqrt(col("_ssq").cast("double") / lit(1e12)))
    // per-vector scalars: count + mean norm (norm quantized pre-sum)
    val perVec = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("_norm").cast("decimal(20,9)")).as("_sn"))
    // unit components quantized to 1e-9 longs; Q = Σᵢ‖uqᵢ‖², exact
    val comps = base.select(col("_g"), col("_ssq"),
        posexplode(col("_v")).as(Seq("_p", "_x")))
      .select(col("_g"), col("_p"),
        floor(xd(col("_x")) / sqrt(col("_ssq").cast("double") / lit(1e12))
          * lit(1e9) + lit(0.5)).cast("long").as("_uq"))
    val byPos = comps.groupBy(col("_g"), col("_p"))
      .agg(sum(col("_uq").cast("decimal(38,0)")).as("_s"),
        sum((col("_uq").cast("decimal(19,0)") * col("_uq")).cast("decimal(38,0)")).as("_q"))
    val cross = byPos.groupBy(col("_g"))
      .agg(sum(col("_s") * col("_s")).as("_s2"), sum(col("_q")).as("_qt"))
    val n = col("n_vecs").cast("double")
    perVec.join(cross, Seq("_g"))
      .select(col("_g").as(groupCol), col("n_vecs"),
        round(col("_sn").cast("double") / n, 6).as("mean_norm"),
        when(col("n_vecs") >= 2L,
          round((col("_s2").cast("double") - col("_qt").cast("double")) /
            (n * (n - lit(1.0)) * lit(1e18)), 9)).as("mean_pair_cos"))
  }
}
