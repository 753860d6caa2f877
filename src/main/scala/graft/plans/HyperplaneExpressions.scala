package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket id as a native codegen'd expression
  * (SURVEY.md §2 #33/#35).
  *
  * The hyperplane sign matrix is a plan-time CONSTANT — `nbits × dim`
  * Rademacher ±1 entries derived from xxhash64(seed, plane, dim_idx).
  * The higher-order-function formulation recomputes those hashes for
  * every row × plane × dimension (nbits·dim interpreted hash calls per
  * vector); here they are precomputed once at expression construction
  * and the per-row work collapses to an nbits·dim fused multiply-add
  * loop inside WholeStageCodegen.
  *
  * Bit-compatible with `Hashing.hyperplaneBucket` (the HOF executable
  * spec, cross-validated in FunctionsSpec): the sign of plane p,
  * dimension d is the sign of the chained XXH64 Spark's `xxhash64`
  * column function computes for (seed: int, p: int, d: int) with its
  * default 42L initial seed.
  */
case class HyperplaneBucket(child: Expression, nbits: Int, dim: Int, seed: Int = 7)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  /** signs(p*dim + d) ∈ {+1.0, -1.0}; @transient lazy so the executor
    * side rebuilds it deterministically after serialization.
    */
  @transient private lazy val signs: Array[Double] =
    HyperplaneBucket.signMatrix(nbits, dim, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < nbits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * signs(p * dim + d)
        d += 1
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |${ev.value} = 0L;
         |for (int $p = 0; $p < $nbits; $p++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += (double) $v.getFloat($d) * $signsRef[$p * $dim + $d];
         |  }
         |  if ($dot > 0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)

  override def prettyName: String = "vec_hyperplane_bucket"
}

object HyperplaneBucket {
  /** The plan-time Rademacher sign matrix, exposed so the oracle-SQL
    * generator can inline the EXACT same constants into DuckDB SQL
    * (the matrix is a deterministic function of (nbits, dim, seed) —
    * per-plane/dim hashes never depend on the data).
    */
  def signMatrix(nbits: Int, dim: Int, seed: Int): Array[Double] = {
    val a = new Array[Double](nbits * dim)
    var p = 0
    while (p < nbits) {
      val hp = XXH64.hashInt(p, XXH64.hashInt(seed, 42L))
      var d = 0
      while (d < dim) {
        a(p * dim + d) = if (XXH64.hashInt(d, hp) >= 0L) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    a
  }
}
