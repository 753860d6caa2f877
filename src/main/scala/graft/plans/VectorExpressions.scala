package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §2 #34-35).
  *
  * The `aggregate`/`zip_with` higher-order-function formulation of
  * cosine similarity is correct but interpreted (HOF lambdas don't
  * participate in whole-stage codegen) and traverses each array three
  * times (dot, ‖a‖, ‖b‖) — with ‖query‖ recomputed for every corpus
  * row. These expressions generate a single fused Java loop with three
  * scalar accumulators, so the ANN hot path (|queries| × |corpus| dot
  * products at 100 TB) stays inside WholeStageCodegen at memory
  * bandwidth, not lambda-dispatch, speed.
  *
  * Inputs are `array<float>` embeddings (no null elements — training
  * -data embedding columns are dense by construction); accumulation is
  * sequential in element order with double accumulators, so results
  * are bit-deterministic on any cluster layout. Arrays of unequal
  * length use the common prefix (same as `zip_with`-minus-nulls).
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** (dot, na, nb) → result */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  /** Java source: expression over accumulators `dot`, `na`, `nb`. */
  protected def finishCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ${finishCode(dot, na, nb)};
       """.stripMargin
    })
}

/** dot(a, b) with a fused codegen'd loop. */
case class DotProduct(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** cosine(a, b) = dot/(‖a‖·‖b‖) in ONE pass over both arrays.
  * Zero-norm inputs yield NaN (0/0), matching the HOF formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishCode(dot: String, na: String, nb: String): String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}
