package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Signed random projection (Johnson–Lindenstrauss / Achlioptas
  * Rademacher form) as a native codegen'd expression: project an
  * `array<float>` embedding onto `outDim` ±1 hyperplane directions —
  * the dimensionality-reduction step in front of cheaper ANN /
  * clustering / storage (pairwise angles are preserved in expectation;
  * cosine over projections needs no scaling because any common factor
  * cancels).
  *
  * The sign matrix is the SAME plan-time Rademacher construction as
  * [[HyperplaneBucket]] (xxhash64-seeded, deterministic from
  * (outDim, dim, seed)) — this expression emits the raw projection
  * values where HyperplaneBucket emits only their sign bits, so the
  * two share constants, and the oracle generator inlines the identical
  * matrix into SQL. Per-row work is one outDim×dim fused multiply-add
  * loop inside WholeStageCodegen; accumulation is sequential in
  * element order (deterministic bits at any parallelism).
  */
case class RandomProjectVec(child: Expression, outDim: Int, dim: Int, seed: Int = 7)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  @transient private lazy val signs: Array[Double] =
    HyperplaneBucket.signMatrix(outDim, dim, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Any](outDim)
    var p = 0
    while (p < outDim) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * signs(p * dim + d)
        d += 1
      }
      out(p) = dot
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $arr = new double[$outDim];
         |for (int $p = 0; $p < $outDim; $p++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double) $v.getFloat($d) * $signsRef[$p * $dim + $d];
         |  }
         |  $arr[$p] = $dot;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RandomProjectVec =
    copy(child = newChild)

  override def prettyName: String = "vec_random_project"
}
