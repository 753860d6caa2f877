package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Sequence packing for LLM training (SURVEY.md §2 #46): assign each
  * document to a fixed-capacity context-window chunk, the
  * concat-and-chunk layout training pipelines feed to the model. A
  * document's chunk is determined by the running token offset of the
  * documents before it, so chunk assignment is the prefix-sum of token
  * counts — fully declarative (one window over a shard), no sequential
  * driver state.
  *
  * Scale design: a single global prefix-sum would serialize the corpus
  * through one ordering. Instead documents are sharded by a key-derived
  * shard id and packed independently per shard — shards are
  * embarrassingly parallel (each is one window partition), and the only
  * cross-shard effect is at most one under-filled trailing chunk per
  * shard, negligible for any real shard size. At 100 TB, set `nShards`
  * to O(corpus tokens / desired tokens-per-writer-task).
  */
object Packing {

  /** Token offsets and chunk ids per document. Returns
    * (doc_id, shard, n_tokens, tok_offset, chunk): `tok_offset` is the
    * document's starting position in its shard's concatenated token
    * stream; `chunk` = floor(tok_offset / capacity) is the context window
    * its first token lands in.
    */
  def packSequences(docs: DataFrame, capacity: Int = 2048, nShards: Int = 8,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(capacity > 0 && nShards > 0, s"bad capacity=$capacity / nShards=$nShards")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        size(T.tokens(col(textCol))).as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk", floor(col("tok_offset") / capacity.toDouble).cast("long"))
  }

  /** Chunk-level summary of a packing: per (shard, chunk), how many
    * documents start there and the total tokens they contribute —
    * `tokens > capacity` flags chunks whose trailing document spills
    * into the next window (the concat-and-chunk split point).
    */
  def chunkStats(packed: DataFrame): DataFrame =
    packed.groupBy("shard", "chunk")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
}
