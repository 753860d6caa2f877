package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys: z-order (Morton) interleaving —
  * the clustering technique behind Delta `OPTIMIZE ZORDER BY` and
  * Iceberg sort orders. Sorting/range-partitioning by the interleaved
  * key gives LOCALITY IN EVERY DIMENSION at once, so a parquet
  * min/max-pruned scan filtered on either column (or both) skips most
  * files — a plain sort by (a, b) clusters only the leading column.
  *
  * The key is a pure per-row bit-interleave expression — map-only,
  * codegen'd, no shuffle; the layout pass is one range exchange.
  */
object Layout {

  /** Bits per dimension; two dimensions fill 32 bits of the long. */
  val DimBits = 16

  /** Morton key of two dimensions, each first reduced into
    * [0, 2^16) via `pmod` (callers feeding already-bucketed ranks can
    * pass them straight through — pmod is the identity there).
    * Interleave: bit i of `a` lands at 2i, bit i of `b` at 2i+1 —
    * 32 shift/mask terms summed, exactly reproducible in SQL integer
    * arithmetic, so the oracle computes the identical key.
    */
  def zorderKey(a: Column, b: Column): Column = {
    val am = pmod(a.cast("long"), lit(1L << DimBits))
    val bm = pmod(b.cast("long"), lit(1L << DimBits))
    (0 until DimBits).map { i =>
      (shiftright(am, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(bm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Rendezvous (highest-random-weight) shard assignment: key k goes
    * to argmax over shards s of md5(salt|s|k) — the STATELESS
    * consistent-placement rule (Thaler–Ravishankar): every reader
    * computes the same owner with no lookup table, no coordination,
    * and when the shard count changes n→n+1 only ≈ 1/(n+1) of keys
    * move (mod-n reshuffles nearly everything). The placement map for
    * shard-local caches, embedding-index partitions, and sticky
    * routing — and, content-addressed on md5, re-shard-stable in the
    * same sense as the sampling family (Tafra.sampleHash).
    *
    * Map-only: the argmax folds over a plan-time literal shard
    * sequence per row (`array_max` over (hash, shard) structs —
    * struct order compares hash first, shard breaks the ~impossible
    * md5 tie deterministically); no shuffle, no state. O(n) hashes
    * per key bounds practical n to the thousands — the regime HRW is
    * for; ring-based consistent hashing is the log-n alternative when
    * shards reach the millions, at the cost of a materialized ring.
    */
  def rendezvousShard(keyCol: Column, nShards: Int, salt: String = "hrw"): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096] (O(n) hashes per row), got $nShards")
    val pairs = (0 until nShards).map { s =>
      struct(
        Hashing.md5Long32(concat_ws("|", lit(salt), lit(s), keyCol)).as("h"),
        lit(s).as("s"))
    }
    array_max(array(pairs: _*)).getField("s")
  }

  /** Re-cluster a frame on the z-curve of (`aCol`, `bCol`): ONE range
    * exchange on the key (sampled bounds, so files get balanced byte
    * counts) plus an in-partition sort — the standard OPTIMIZE pass a
    * table owner runs before handing a corpus to min/max-pruned
    * readers. `nFiles` pins the output partition count (file count is
    * a layout decision, not AQE's).
    */
  /** Small-file compaction plan (SURVEY.md §2 #43c): assign a file
    * listing to merge groups of ≈ `targetBytes` each — the lakehouse
    * maintenance op (OPTIMIZE / rewriteDataFiles) in its planning
    * half, which is the half that needs engine-exact audit (the
    * rewrite itself is a copy). Deterministic contract: files order by
    * name; a file joins the group its EXCLUSIVE byte prefix-sum falls
    * in (`prefix div target` — exact integer arithmetic), so group
    * sizes hover around the target and a file larger than the target
    * claims its span of group ids without splitting.
    *
    * Scale note: the input is a FILE LISTING — metadata-scale by
    * definition (millions of rows where the data is petabytes), so
    * the single unpartitioned window over it is the histogram-sized
    * exception the percentileRank rule allows; the plan output is
    * group-count-sized.
    */
  def compactionPlan(files: DataFrame, nameCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = Window.orderBy(col(nameCol)).rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_pfx", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("_grp", expr(s"_pfx div $targetBytes"))
      .groupBy(col("_grp").as("group_id"))
      .agg(count(lit(1)).as("n_files"),
           sum(col(sizeCol)).as("total_bytes"),
           min(col(nameCol)).as("first_file"),
           max(col(nameCol)).as("last_file"))
  }

  /** Per-file column statistics of a parquet layout: for every file,
    * row count plus min/max of each listed column — the PRUNING AUDIT
    * that makes layout decisions measurable ([[zorderLayout]] claims
    * min/max-pruned scans skip most files; this table is the proof: on
    * a z-ordered layout the per-file ranges are near-disjoint in BOTH
    * dimensions, on a heap layout every file spans everything).
    *
    * One partial agg grouped on `input_file_name()` (basename — the
    * engine-neutral identity): output is file-count-sized (metadata
    * scale), the scan itself is column-pruned to the audited columns.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val df = spark.read.parquet(path)
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file_name"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def zorderLayout(df: DataFrame, aCol: String, bCol: String, nFiles: Int): DataFrame = {
    val keyed = df.withColumn("_zkey", zorderKey(col(aCol), col(bCol)))
    keyed.repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }
}
