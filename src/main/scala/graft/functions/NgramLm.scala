package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** CCNet-style perplexity quality filtering (the standard LLM-data
  * quality op beyond SURVEY §2 #37's ratio features): score every
  * document by the negative mean log-likelihood of its word bigrams
  * under an add-k-smoothed bigram language model trained on a
  * high-quality seed split. High nll = unlike the seed distribution =
  * candidate for dropping — the filter CCNet/CC-MultiLingual pipelines
  * run with a KenLM 5-gram; the bigram form keeps the model a small
  * relational artifact both engines can rebuild exactly.
  *
  * Scale shape: the LM (bigram counts + context counts) is a derived
  * aggregate persisted as a MODEL ARTIFACT (same budget class as the
  * IVF centroids); its size is counted and the scoring joins are
  * broadcast only under a row budget, else plain shuffled joins — the
  * q25 size-gate pattern, so a huge seed degrades to extra shuffles
  * instead of a driver OOM. Scoring itself is one pass over the corpus:
  * pinned rebalance → bigram explode (map-side) → two gated joins →
  * partial-agg per doc on the partitioning the rebalance installed.
  *
  * Determinism across engines: each bigram's log term is quantized to
  * DECIMAL(20,6) BEFORE summation — decimal addition is exact and
  * order-insensitive, so Spark's partial aggregation and DuckDB's
  * sequential sum cannot drift on float association — and the final
  * mean is rounded to 4 decimals. P(w2|w1) = (c(w1w2)+k)/(c(w1·)+k·V).
  */
object NgramLm {

  def perplexity(docs: DataFrame, lmDocs: DataFrame, k: Double = 0.5,
                 textCol: String = "text", idCol: String = "doc_id",
                 broadcastMaxRows: Long = 2000000L): DataFrame = {
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

    // ---- the LM artifact (persisted: counted once, joined twice) ----
    val seedBg = lmDocs
      .select(explode(T.boundNGrams(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .persist()
    val ctx = seedBg.groupBy("w1").agg(sum("c2").as("c1")).persist()
    val nBigrams = seedBg.count()
    val vocab = lmDocs.select(explode(T.tokens(col(textCol))).as("w")).distinct().count()
    val bgT = if (nBigrams <= broadcastMaxRows) broadcast(seedBg.select("bg", "c2"))
              else seedBg.select("bg", "c2")
    val ctxT = if (nBigrams <= broadcastMaxRows) broadcast(ctx) else ctx

    // ---- one scoring pass over the corpus ----
    // tokens pre-exchange (Dedup.minhashPairs pattern): materialized
    // through the shuffle so the bigram lambda reads an O(1) attribute
    val spine = docs.select(col(idCol).as("doc_id"), T.tokens(col(textCol)).as("w"))
      .repartition(n, col("doc_id"))
      .select(col("doc_id"), T.wordNGrams(col("w"), 2).as("bgs"))
    val terms = spine.select(col("doc_id"), explode(col("bgs")).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(bgT, Seq("bg"), "left")
      .join(ctxT, Seq("w1"), "left")
      .select(col("doc_id"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        coalesce(col("c1"), lit(0L)).as("c1"))
      .withColumn("termd",
        log((col("c2") + lit(k)) / (col("c1") + lit(k * vocab))).cast("decimal(20,6)"))
    val scored = terms.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("c2") === 0L, 1L).otherwise(0L)).as("oov_bigrams"),
      sum(col("termd")).as("s"))
      .withColumn("nll", round(-col("s").cast("double") / col("n_bigrams"), 4))
    // docs with < 2 tokens have no bigrams: keep them with 0 counts,
    // null score (nothing to measure, not "perfect")
    spine.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        col("nll"))
  }
}
