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
}
