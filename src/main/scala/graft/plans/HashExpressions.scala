package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Md5Word]]: one thread-confined digest instance reused
  * across rows (MessageDigest is not thread-safe and allocating one per
  * row would dominate the hash itself).
  */
object GraftHash {
  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  /** The `word`-th big-endian 32-bit word of md5(bytes) as a
    * non-negative long — bit-identical to
    * `conv(substring(md5(x), 8*word+1, 8), 16, 10)`.
    */
  def md5Word(bytes: Array[Byte], word: Int): Long = {
    val d = md.get(); d.reset()
    val h = d.digest(bytes)
    val o = 4 * word
    ((h(o) & 0xffL) << 24) | ((h(o + 1) & 0xffL) << 16) |
      ((h(o + 2) & 0xffL) << 8) | (h(o + 3) & 0xffL)
  }
}

/** Native form of the engine-portable hash base (SURVEY.md §3
  * functions/Hashing): the `word`-th 32-bit word of the md5 digest,
  * straight from the digest bytes.
  *
  * The Column formulation — `conv(substring(md5(x), 1, 8), 16, 10)` —
  * is the executable spec and the DuckDB-oracle mirror, but per row it
  * materializes the full 32-char hex string, substrings it, and
  * base-16-parses the prefix. This is THE hot path of every dedup
  * pipeline (one hash per distinct shingle/token: millions per
  * partition), so the native expression skips the hex round trip
  * entirely while producing the identical value — the oracle contract
  * is untouched. Cross-validated against the spec formulation in
  * FunctionsSpec; stays inside WholeStageCodegen (plan-asserted).
  */
case class Md5Word(child: Expression, word: Int) extends UnaryExpression {
  require(word >= 0 && word < 4, s"md5_word: word must be in [0, 4), got $word")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_word requires a string argument, got ${t.simpleString}")
  }

  protected override def nullSafeEval(input: Any): Any =
    GraftHash.md5Word(input.asInstanceOf[UTF8String].getBytes, word)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftHash.md5Word($c.getBytes(), $word)")

  override protected def withNewChildInternal(newChild: Expression): Md5Word =
    copy(child = newChild)
  override def prettyName: String = "md5_word"
}
