package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded hash families as Column expressions (SURVEY.md §3): MinHash
  * signatures, band hashes, and random-hyperplane LSH buckets. All built
  * on `xxhash64` with the seed mixed in as a leading column, so every
  * executor computes identical values with no driver-shipped state.
  */
object Hashing {

  /** k-component MinHash signature over a shingle array:
    * sig[i] = min over shingles of xxhash64(i, shingle).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(shingles, s => xxhash64(lit(i), s)))): _*)

  /** LSH band hashes: the signature is cut into bands of `r` rows, each
    * band hashed to one long. Docs sharing any band value are candidate
    * near-duplicates.
    */
  def bandHashes(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"k=$k not divisible by band width r=$r")
    array((0 until k / r).map { b =>
      xxhash64((lit(b) +: (b * r until (b + 1) * r).map(j => element_at(sig, j + 1))): _*)
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
