package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the classical
  * bag-of-words classifier (McCallum/Nigam AAAI-98 workshop form) and
  * the standing baseline for the corpus-curation classifier slot
  * (fastText-style quality/domain/language tagging of a 100 TB corpus
  * before sampling): counts-only training makes it the one classifier
  * whose DISTRIBUTED fit is exact — the sufficient statistics are two
  * group-by-counts, so training is two partial aggregations over the
  * corpus, no SGD, no iteration, no driver-side model state beyond a
  * scalar vocabulary size.
  *
  * Scale shape: train = one (label, token) count pass + one label
  * count pass (map-side partial aggs); score = explode test tokens,
  * broadcast the per-label priors/unseen constants, one shuffle join
  * against the (label, token) log-prob table keyed by token, one
  * partial-agg sum per (doc, label), one per-doc window argmax. With a
  * capped vocabulary the model broadcasts and the scoring pass is
  * map-only; unbounded vocab falls back to the shuffle join used here.
  *
  * Engine-exact scoring (the DuckDB-oracle contract): every per-token
  * log-probability ln((c+1)/(T+V)) is ONE double expression of exact
  * integers, quantized to a micro-unit long; per-document scores are
  * then INTEGER sums of (count × logpQ), so the summation order can
  * never flip an argmax; ties break to the lexicographically smallest
  * label.
  */
object NaiveBayes {

  private def tok(textCol: String): Column =
    explode(TextFunctions.tokens(col(textCol)))

  private def lnQ(x: Column, unitScale: Long): Column =
    floor(log(x) * unitScale + 0.5).cast("long")

  /** Train on `train`, score `test`, and return the confusion matrix
    * (label_true, label_pred, n_docs) — the end-to-end evaluation
    * read-out. Laplace-1 smoothing over the TRAIN vocabulary; tokens
    * unseen in training score the per-label unseen mass 1/(T_l + V).
    * Documents with zero tokens take the prior-only argmax.
    */
  def trainScoreConfusion(train: DataFrame, test: DataFrame,
                          labelCol: String, textCol: String, idCol: String,
                          unitScale: Long = 1000000L): DataFrame = {
    // sufficient statistics: (label, token) counts and per-label
    // totals. `counts` is checkpointed ONCE: it feeds the vocab
    // scalar, the model, the totals, and the unseen table —
    // uncheckpointed, each consumer (two scalar actions + two subtrees
    // of the final plan) re-ran the corpus tokenize pass.
    // Vocab-bounded rows, the model artifact.
    val trTok = train
      .select(col(labelCol).as("_lbl"), tok(textCol).as("_tok"))
      .filter(length(col("_tok")) > 0)
    val counts = trTok.groupBy("_lbl", "_tok").agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val totals = counts.groupBy("_lbl").agg(sum(col("_c")).as("_t"))
    // vocab size + train doc count: ONE driver action (two 1-row aggs
    // cross-joined) instead of one job each
    val vnRow = counts.agg(countDistinct(col("_tok")).as("_v"))
      .crossJoin(train.agg(count(lit(1)).as("_n"))).head()
    val vocab = vnRow.getLong(0).toDouble
    val nTrain = vnRow.getLong(1).toDouble
    // per-(label, token) and per-label-unseen quantized log-probs
    val model = counts.join(totals, Seq("_lbl"))
      .select(col("_lbl"), col("_tok"),
        lnQ((col("_c") + 1.0).cast("double") /
            (col("_t").cast("double") + vocab), unitScale).as("_lpq"))
    val labels = totals
      .select(col("_lbl"),
        lnQ(lit(1.0) / (col("_t").cast("double") + vocab), unitScale)
          .as("_unseenq"))
    // quantized log-priors from train document counts
    val priors = train.groupBy(col(labelCol).as("_lbl"))
      .agg(count(lit(1)).as("_nd"))
      .select(col("_lbl"),
        lnQ(col("_nd").cast("double") / nTrain, unitScale).as("_priorq"))
    // test tokens with multiplicity × every candidate label
    val teTok = test
      .select(col(idCol).as("_id"), col(labelCol).as("_true"),
        tok(textCol).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .groupBy("_id", "_true", "_tok").agg(count(lit(1)).as("_n"))
    val scored = teTok
      .join(broadcast(labels))
      .join(model, Seq("_lbl", "_tok"), "left")
      .withColumn("_q", coalesce(col("_lpq"), col("_unseenq")))
      .groupBy("_id", "_true", "_lbl")
      .agg(sum(col("_n") * col("_q")).as("_sq"))
    // prior-only rows keep zero-token docs in the argmax
    val withEmpty = test
      .select(col(idCol).as("_id"), col(labelCol).as("_true"))
      .join(broadcast(labels.select(col("_lbl"))))
      .join(scored, Seq("_id", "_true", "_lbl"), "left")
      .na.fill(0L, Seq("_sq"))
      .join(broadcast(priors), Seq("_lbl"))
      .withColumn("_score", col("_sq") + col("_priorq"))
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("_score").desc, col("_lbl").asc)
    withEmpty.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy(col("_true").as("label_true"), col("_lbl").as("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
