package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded hash families as Column expressions (SURVEY.md §3): MinHash
  * signatures, band hashes, and random-hyperplane LSH buckets.
  *
  * The MinHash / band / fingerprint primitives are ENGINE-PORTABLE by
  * construction (same contract as `Tafra.splitByHash`): the base hash is
  * the first 32 bits of md5 — byte-identical in every engine — and the
  * k seeded variants are an affine universal family
  * `h_i = (a_i·h + b_i) mod P` whose constants are plain literals both
  * here and in the DuckDB oracle SQL. That is what lets the driver
  * hash-verify the full minhash/simhash pipelines instead of settling
  * for rows-only checks, and it makes every dedup decision auditable
  * from SQL against the production corpus.
  */
object Hashing {

  /** Modulus for the portable affine family; ~2^30 so `a·h + b` stays
    * far under 2^63 (ANSI-overflow-safe in both engines).
    */
  val PortableP: Long = 1000000007L

  /** splitmix64 finalizer — deterministic constant derivation shared by
    * the Column expressions and the oracle-SQL generator.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** Multiplier of family member i, in [1, P). */
  def affineA(i: Int): Long = java.lang.Math.floorMod(mix(2L * i), PortableP - 1) + 1
  /** Offset of family member i, in [0, P). */
  def affineB(i: Int): Long = java.lang.Math.floorMod(mix(2L * i + 1), PortableP)

  private def md5Word(c: Column, word: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.Md5Word(org.apache.spark.sql.graft.ColumnBridge.expression(c), word))

  /** First 32 bits of md5 as a non-negative long. DuckDB mirror:
    * `('0x' || substr(md5(x), 1, 8))::BIGINT`. Runs as the native
    * [[graft.plans.Md5Word]] expression (digest bytes direct, no hex
    * round trip); [[md5Long32Spec]] is the Column-level executable spec
    * it is cross-validated against.
    */
  def md5Long32(c: Column): Column = md5Word(c, 0)

  /** Bits 32-63 of md5 (hex chars 9-16). */
  def md5Long32b(c: Column): Column = md5Word(c, 1)

  /** Spec/mirror formulation of [[md5Long32]] (what the DuckDB oracle
    * computes); kept for cross-validation, not the hot path.
    */
  def md5Long32Spec(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** Spec/mirror formulation of [[md5Long32b]]. */
  def md5Long32bSpec(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("bigint")

  /** Base hash for the affine family: md5 prefix reduced mod P. */
  def portableHash(c: Column): Column = pmod(md5Long32(c), lit(PortableP))

  /** Family member i over an already-reduced base hash. */
  def affine(i: Int, h: Column): Column =
    pmod(lit(affineA(i)) * h + lit(affineB(i)), lit(PortableP))

  /** k-component MinHash signature over a shingle array:
    * sig[i] = min over shingles of the i-th affine variant of the
    * portable md5 base hash (one md5 per shingle, k fused
    * multiply-adds — cheaper than k independent hashes AND
    * oracle-replicable).
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hs = transform(shingles, s => portableHash(s))
    array((0 until k).map(i => array_min(transform(hs, h => affine(i, h)))): _*)
  }

  /** LSH band hashes: the signature is cut into bands of `r` rows, each
    * band folded to one value with the portable polynomial
    * `acc = (acc·31 + component) mod P`, seeded with the band index.
    * Docs sharing any band value are candidate near-duplicates.
    */
  def bandHashes(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"k=$k not divisible by band width r=$r")
    array((0 until k / r).map { b =>
      (b * r until (b + 1) * r).foldLeft(lit(b.toLong): Column) { (acc, j) =>
        pmod(acc * lit(31L) + element_at(sig, j + 1), lit(PortableP))
      }
    }: _*)
  }

  /** Fraction of matching components between two signatures — the
    * standard MinHash estimate of Jaccard similarity.
    */
  def signatureAgreement(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), m => m)).cast("double") / lit(k.toDouble)

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id over a
    * float-array embedding: `nbits` Rademacher hyperplanes whose ±1
    * components are derived from xxhash64(seed, plane, dim); the bucket
    * is the integer of the dot-product sign bits. Cosine-similar vectors
    * collide with high probability.
    *
    * Implemented as the native codegen'd expression
    * [[graft.plans.HyperplaneBucket]] (sign matrix precomputed at plan
    * time); `hyperplaneBucketHof` is the HOF executable spec it is
    * cross-validated against in FunctionsSpec.
    */
  def hyperplaneBucket(vec: Column, nbits: Int, dim: Int, seed: Int = 7): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.HyperplaneBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec), nbits, dim, seed))

  /** The same bucket computation via interpreted higher-order functions
    * (nbits·dim hash evaluations per row — spec/reference only).
    */
  def hyperplaneBucketHof(vec: Column, nbits: Int, dim: Int, seed: Int = 7): Column = {
    val bits = (0 until nbits).map { p =>
      val dotp = aggregate(
        transform(sequence(lit(0), lit(dim - 1)), d =>
          element_at(vec, d + 1).cast("double") *
            when(xxhash64(lit(seed), lit(p), d) >= 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(dotp > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** 64-bit SimHash assembled from per-bit signed sums (callers produce
    * the 64 sums via an aggregation; see operators.Dedup.simhash).
    * Summing distinct powers of two cannot overflow a long.
    */
  def assembleSimhash(bitSums: Seq[Column]): Column = {
    require(bitSums.size == 64)
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
