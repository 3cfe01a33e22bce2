package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Inverted-index construction: term → document frequency + sorted posting
  * list — the index-build step of a corpus search/retrieval stack (the
  * aggregation dual of the q51 BM25 scorer, which consumes tf/df stats).
  *
  * Scale shape: one shuffle keyed by term. Posting lists are the classic
  * skew hazard — a stopword's list is the whole corpus — so the operator
  * takes a `maxPostings` truncation (applied AFTER the per-term sort, so the
  * kept prefix is the lowest doc ids, deterministic); `doc_freq` is always
  * the full count. At 100 TB the untruncated variant would delta-encode and
  * shard hot terms; the truncated form here is the index-sample shape a
  * relevance pipeline materializes.
  */
object InvertedIndex {

  /** Build posting lists over whitespace tokens.
    *
    * Returns (term, doc_freq, postings: array<idCol-type>) with postings
    * sorted ascending and truncated to `maxPostings` entries. A document
    * contributes each distinct term once (`doc_freq` = document frequency,
    * not collection frequency).
    */
  def postings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Int = Int.MaxValue): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive: $maxPostings")
    docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("doc_freq"),
        slice(sort_array(collect_list(col(idCol))), 1, maxPostings).as("postings"))
  }
}
