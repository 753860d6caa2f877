package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns via Spark's
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd, no UDFs
  * (SURVEY.md §2 #34-35).
  *
  * Accumulation is sequential in element order with a double
  * accumulator, so results are deterministic (same bits every run and
  * on every cluster layout).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
