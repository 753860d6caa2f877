package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key mitigation for equi-joins (SURVEY.md §5).
  *
  * AQE's skew-join split (on by default) handles most skew at runtime
  * by splitting oversized shuffle partitions, but it cannot split ONE
  * pathological key. Salting can: a hot left key's rows get a
  * deterministic salt in [0, nsalts); the right rows for that key are
  * replicated nsalts times; the join key becomes (key, salt), spreading
  * the hot key over nsalts reducers.
  *
  * Salting is applied ONLY to detected hot keys: blanket salting
  * replicates the ENTIRE right side nsalts× (nsalts× its shuffle
  * volume) to fix what is usually a handful of keys. Here a cheap
  * exact frequency pass over the left key column (map-side combined —
  * shuffle volume is #distinct-keys-per-partition, not rows) finds
  * keys above `hotThreshold`; that set is broadcast (≤ |left|/threshold
  * keys, small by construction), the hot slices of both sides join
  * salted, and the cold remainder — virtually all of the data — joins
  * plain. A key's rows land entirely on one side of the split on BOTH
  * inputs (membership is decided by key value), so the union is exactly
  * the unsalted join for `inner` and `left` alike.
  *
  * The salt is a hash of the left row's columns (not `rand()`), so
  * replays and retries are deterministic.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     nsalts: Int = 8, how: String = "inner",
                     hotThreshold: Long = 1L << 20): DataFrame = {
    require(nsalts > 0, "nsalts must be positive")
    require(hotThreshold > 0, "hotThreshold must be positive")
    // right/full outer would emit every unmatched replicated hot-right
    // row nsalts times — fail fast instead of silently duplicating
    require(how == "inner" || how == "left",
      s"saltedEquiJoin supports inner/left only, got '$how'")
    val hot = left.groupBy(col(leftKey)).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > hotThreshold)
      .select(col(leftKey).as("_hk"))

    val lHot = left.join(broadcast(hot), left(leftKey) === col("_hk"), "left_semi")
    val lCold = left.join(broadcast(hot), left(leftKey) === col("_hk"), "left_anti")
    val rHot = right.join(broadcast(hot), right(rightKey) === col("_hk"), "left_semi")
    val rCold = right.join(broadcast(hot), right(rightKey) === col("_hk"), "left_anti")

    val ls = lHot.withColumn("_graft_salt",
      pmod(xxhash64(lHot.columns.toSeq.map(col): _*), lit(nsalts.toLong)).cast("int"))
    val rs = rHot.withColumn("_graft_salt",
      explode(array((0 until nsalts).map(lit): _*)))
    val salted = ls.join(rs,
        ls(leftKey) === rs(rightKey) && ls("_graft_salt") === rs("_graft_salt"), how)
      .drop("_graft_salt")
    val plain = lCold.join(rCold, lCold(leftKey) === rCold(rightKey), how)

    plain.unionByName(salted)
  }
}
