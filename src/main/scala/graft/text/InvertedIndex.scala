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
    * Returns (term, doc_freq, postings: array<long>) with postings sorted
    * ascending and truncated to `maxPostings` entries. A document
    * contributes each distinct term once (`doc_freq` = document frequency,
    * not collection frequency).
    *
    * Bounded truncation happens INSIDE the aggregation (the TopK bounded
    * heap, ≤ maxPostings entries per partial buffer with map-side combine)
    * — a `slice(collect_list)` would buffer a stopword term's ENTIRE
    * corpus-sized posting list on one reducer before truncating. The
    * unbounded default keeps the collect_list path (callers asking for the
    * full index accept the full list per term).
    */
  def postings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Int = Int.MaxValue): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive: $maxPostings")
    val exploded = docs
      .filter(trim(col(textCol)) =!= "")
      .select(
        col(idCol).cast("long").as("_doc"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    if (maxPostings == Int.MaxValue)
      exploded
        .groupBy(col("term"))
        .agg(
          count(lit(1)).as("doc_freq"),
          sort_array(collect_list(col("_doc"))).as("postings"))
    else {
      // negated-id score ranks ascending ids first; on equal (collapsed)
      // scores the heap tie-breaks by id asc, so the kept prefix is exactly
      // the smallest maxPostings ids even past double precision
      val heap = udaf(
        new graft.functions.TopKBySim(maxPostings),
        org.apache.spark.sql.Encoders.product[graft.functions.ScoredEntry])
      exploded
        .groupBy(col("term"))
        .agg(
          count(lit(1)).as("doc_freq"),
          heap(-col("_doc").cast("double"), col("_doc"), lit(0L)).as("_tk"))
        .select(col("term"), col("doc_freq"), col("_tk.ids").as("postings"))
    }
  }
}
