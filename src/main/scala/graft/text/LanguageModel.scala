package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.GlobalRank

/** Count-based n-gram language-model scoring — the perplexity quality
  * filter of a pretraining pipeline (CCNet, Wenzek et al. 2020: score every
  * web document with an LM trained on a trusted target corpus, then keep
  * the low-perplexity head/middle). The reference pipeline's quality
  * screens are frequency heuristics (SURVEY §2.12 X1); this is the
  * model-based screen that complements them.
  *
  * Scale shape: training is two count aggregations over the train corpus
  * (bigram table keyed by the pair, context table derived from it by one
  * more vocabulary-sized aggregation — never a second corpus pass). Scoring
  * is the score corpus's exploded bigrams equi-joined to the two count
  * tables — plain shuffle hash joins on the gram keys that AQE broadcasts
  * when the vocabulary is small; no window, no driver state beyond the
  * 1-row vocabulary-size bind. Everything downstream of tokenization is
  * exact integer counts, so the smoothed probabilities are bit-reproducible
  * across engines.
  */
object LanguageModel {

  /** Adjacent word-pair structs (w1, w2) of a token array; empty when the
    * doc has fewer than 2 tokens (`sequence(1, 0)` in Spark is DESCENDING,
    * not empty — the guard is mandatory). `bindOnce` pins the token array:
    * HOF lambdas re-evaluate referenced outer expressions per element, so
    * an unbound `toks` (a split() tree) would re-tokenize the whole text
    * for every element_at — O(len²) per doc.
    */
  private[graft] def bigrams(toks: Column): Column =
    TextFunctions.bindOnce(toks) { tk =>
      when(size(tk) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(
          transform(
            sequence(lit(1), size(tk) - 1),
            i => struct(element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"))))
    }

  /** Score `score` docs with an add-α-smoothed bigram LM trained on `train`
    * docs (both whitespace-tokenized, lowercased).
    *
    * P(w2 | w1) = (c(w1,w2) + α) / (ctx(w1) + α·V), where ctx(w1) is w1's
    * count as a bigram LEFT symbol (so the conditional sums to 1 over the
    * closed vocabulary + one unseen slot) and V = |train vocab| + 1. Docs
    * with fewer than 2 tokens are dropped (no bigram evidence).
    *
    * Returns (idCol, n_bigrams, cross_entropy) — cross-entropy in bits per
    * bigram, -avg(log2 P). Perplexity is 2^cross_entropy; buckets over it
    * via [[ccnetBuckets]].
    */
  def bigramCrossEntropy(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive: $alpha")

    val toks: Column = TextFunctions.tokens(lower(col(textCol)))

    val trainBi = train
      .filter(trim(col(textCol)) =!= "")
      .select(explode(bigrams(toks)).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))

    // bigram counts; context counts derived by a vocab-sized re-aggregation
    val c2 = trainBi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))

    // |vocab| + 1 unseen slot — a 1-row scalar bind, broadcast not collected
    val vdf = train
      .filter(trim(col(textCol)) =!= "")
      .select(explode(toks).as("w"))
      .agg((countDistinct(col("w")) + 1L).cast("double").as("v_"))

    val docBi = score
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(bigrams(toks)).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

    val p =
      (coalesce(col("c2"), lit(0L)).cast("double") + lit(alpha)) /
        (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("v_"))

    docBi
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vdf))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(-log2(p)).as("cross_entropy"))
  }

  /** CCNet's head/middle/tail split: exact terciles of the scored docs by
    * ascending cross-entropy. Callers pass the cross-entropy PRE-ROUNDED so
    * the tercile order is reproducible across engines; ties break on
    * `idCol`. One GlobalRank range exchange — no single-partition window.
    */
  def ccnetBuckets(scored: DataFrame, idCol: String, ceCol: String): DataFrame = {
    val labels = Seq("head", "middle", "tail")
    GlobalRank
      .globalNtile(scored, Seq(col(ceCol), col(idCol)), 3, "_tercile")
      .withColumn(
        "bucket",
        element_at(array(labels.map(lit).toIndexedSeq: _*), col("_tercile")))
      .drop("_tercile")
  }
}
