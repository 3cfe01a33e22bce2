package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document repetition diagnostics — the Gopher-style quality rules a
  * pretraining corpus filter applies before tokenization (Rae et al. 2021,
  * "Scaling Language Models", table A1: fraction-of-duplicate-ngrams and
  * top-ngram-fraction cuts).
  *
  * Scale shape: unigram stats are pure per-row expressions (codegen'd, no
  * shuffle); bigram stats shuffle (doc_id, bigram) once and aggregate twice
  * — the only data-sized exchange, keyed by doc so no hot keys regardless
  * of corpus-level term skew. Nothing here grows with corpus size per
  * group: every group is one document.
  */
object Repetition {

  /** Per-doc repetition metrics over whitespace tokens:
    *
    *   - `n_tokens`       — whitespace token count
    *   - `distinct_ratio` — distinct unigrams / tokens (low ⇒ repetitive)
    *   - `top_bigram_frac`— occurrences of the most frequent bigram / all
    *                        bigram occurrences
    *   - `dup_bigram_frac`— occurrences of bigrams seen more than once /
    *                        all bigram occurrences
    *
    * Documents with fewer than 2 tokens have no bigram and are dropped —
    * same contract as the SQL oracle's inner join on the bigram frame.
    * Ratios are raw doubles; callers round for presentation/oracle parity.
    */
  def metrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val filtered = docs.filter(trim(col(textCol)) =!= "")
    val uni = filtered.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      size(array_distinct(TextFunctions.tokens(col(textCol)))).as("n_distinct"))
    val bigram = filtered
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), 2)).as("bg"))
      .groupBy(col(idCol), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        max(col("c")).as("top_bigram_cnt"),
        sum(col("c")).as("n_bigrams"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_bigram_occ"))
    uni
      .join(bigram, Seq(idCol))
      .select(
        col(idCol),
        col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams")).as("top_bigram_frac"),
        (col("dup_bigram_occ").cast("double") / col("n_bigrams")).as("dup_bigram_frac"))
  }
}
