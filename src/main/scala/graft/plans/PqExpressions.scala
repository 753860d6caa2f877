package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels (SURVEY.md §2 #35c/#35d).
  *
  * The Column-expression formulation of PQ encode/LUT unrolls
  * m × ksub × (dim/m) arithmetic nodes into ONE projection —
  * thousands of Catalyst nodes that cost seconds of Janino compile
  * per plan and megabytes of serialized task binary, repeated on
  * every (re)plan because fresh expression ids change the generated
  * source. These expressions collapse each kernel to a single node
  * whose GENERATED CODE loops (like [[HyperplaneBucket]]) — compile
  * time and task size become O(1) in m·ksub while the per-row work
  * stays inside whole-stage codegen.
  *
  * Bit-exactness contract (mirrored by the DuckDB oracle and pinned
  * by PropertySpec): each subspace's L2² accumulates `diff * diff`
  * over ascending element index in a double accumulator — the same
  * left-associative order the unrolled `reduceLeft` form used — and
  * argmin ties break toward the smaller centroid id via strict
  * less-than scanning centroids in ascending order.
  *
  * The codebook rides in the expression as a structural `Seq[Float]`
  * (ksub × dim, row-major): a few KB model artifact, serialized with
  * the plan like any literal; case-class equality stays structural so
  * identical kernels dedupe in CSE.
  */
abstract class PqKernelExpression extends UnaryExpression {
  def codebook: Seq[Float]
  def ksub: Int
  def m: Int

  protected def dim: Int = codebook.length / ksub
  protected def w: Int = dim / m

  @transient protected lazy val cb: Array[Float] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if ksub > 0 && m > 0 && codebook.nonEmpty &&
        codebook.length % ksub == 0 && dim % m == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: codebook length ${codebook.length} not divisible into " +
        s"ksub=$ksub rows of m=$m subspaces")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
}

/** pq_codes(vec) → array<int> of m nearest-sub-centroid codes. */
case class PqCodes(child: Expression, codebook: Seq[Float], ksub: Int, m: Int)
    extends PqKernelExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestC = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        while (i < w) {
          val d = v.getFloat(j * w + i).toDouble - cb(c * dim + j * w + i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestC = ctx.freshName("bestC")
      val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $bestC = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $w; $i++) {
         |      double $d = (double) $v.getFloat($j * $w + $i)
         |        - (double) $cbRef[$c * $dim + $j * $w + $i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

/** pq_lut(vec) → array<double> of m·ksub asymmetric sub-distances,
  * index = subspace·ksub + code.
  */
case class PqLut(child: Expression, codebook: Seq[Float], ksub: Int, m: Int)
    extends PqKernelExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        while (i < w) {
          val d = v.getFloat(j * w + i).toDouble - cb(c * dim + j * w + i).toDouble
          acc += d * d
          i += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "float[]")
      val lut = ctx.freshName("lut")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double[] $lut = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $w; $i++) {
         |      double $d = (double) $v.getFloat($j * $w + $i)
         |        - (double) $cbRef[$c * $dim + $j * $w + $i];
         |      $acc += $d * $d;
         |    }
         |    $lut[$j * $ksub + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}
