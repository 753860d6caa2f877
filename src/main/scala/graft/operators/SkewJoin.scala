package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins (SURVEY.md §5).
  *
  * AQE's skew-join split (on by default) handles most skew at runtime
  * by splitting oversized shuffle partitions, but it cannot split ONE
  * pathological key. Salting can: the left (skewed) side gets a
  * deterministic salt in [0, nsalts); the right side is replicated
  * nsalts times; the join key becomes (key, salt), spreading a hot
  * key's rows over nsalts reducers at the cost of nsalts× the right
  * side's shuffle volume — the standard trade when the right side is
  * much smaller but too big to broadcast.
  *
  * The salt is a hash of the left row's columns (not `rand()`), so
  * replays and retries are deterministic. Join semantics are identical
  * to the unsalted join: every (l, r) pair with equal keys appears
  * exactly once because each left row carries exactly one salt and the
  * right side covers all salts.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     nsalts: Int = 8, how: String = "inner"): DataFrame = {
    require(nsalts > 0, "nsalts must be positive")
    val l = left.withColumn("_graft_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(nsalts.toLong)).cast("int"))
    val r = right.withColumn("_graft_salt",
      explode(array((0 until nsalts).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("_graft_salt") === r("_graft_salt"), how)
      .drop("_graft_salt")
  }
}
