package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog physical-plan audit: every declared batch query is planned
  * at sf0.001 and swept for the two operators that do not survive a 100×
  * scale-up — CartesianProduct and BroadcastNestedLoopJoin — so a future
  * query (or a join-condition typo that silently degrades an equi-join)
  * fails here before it ships. Streaming queries are skipped: building
  * their DataFrame executes the replay, and their stateful plans are
  * asserted separately in StreamOpsSpec.
  *
  * Allowlisted BroadcastNestedLoopJoin uses, each deliberate:
  *  - brute-force kNN family (q14/q18/q47/q59/q151): broadcast query side ×
  *    STREAMED corpus — the corpus is never shuffled or materialized, which
  *    is the correct exact-baseline shape (VERDICT r1 §LLM table);
  *  - q29: the size-gated exact path engages below the LSH cutover at this
  *    tiny sf (the sf0.1 declared plan is the bucketed equi-join, asserted
  *    in PlanSpec);
  *  - q45/q51/q62/q70/q79/q94/q106/q108: a crossJoin binding one broadcast
  *    1-ROW aggregate frame (IVF cell count / BM25 corpus stats / unigram
  *    total / decile cuts / histogram min-max / recency anchor / TF-IDF doc
  *    count / kappa marginal product) — a scalar bind, not a pairwise
  *    product;
  *  - q102: the chi-square R×C expected-count grid is the product of two
  *    AGGREGATE frames (row/column marginals, ≤ tens of rows each) plus a
  *    1-row total bind — bounded by category cardinalities, not input size;
  *  - q152: the densification spine is the grid of two AGGREGATE frames
  *    (selected users × distinct days) — the intended dense output shape,
  *    not a pairwise product over inputs.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  private val nljAllowed = Set(
    "q14_knn_bruteforce", "q18_knn_classify", "q47_knn_confusion",
    "q59_quantized_knn", "q151_knn_regression", "q29_embedding_neardups",
    "q45_ann_ivf", "q51_bm25_search", "q62_surprisal", "q70_quality_deciles",
    "q79_histogram", "q94_user_features", "q102_chi_square",
    "q106_tfidf_terms", "q108_langid_kappa", "q112_pagerank",
    "q116_psi_drift", "q117_bigram_surprisal", "q122_rfm_segments",
    "q132_mutual_information", "q134_funnel_windowed", "q136_token_pmi",
    "q145_dedup_savings", "q152_densify_ffill", "q155_target_encoding",
    "q164_activation_latency", "q173_triple_itemsets",
    "q193_rank_stability", "q196_value_bands")

  test("no declared batch query plans a CartesianProduct or unexpected nested-loop join") {
    val offenders = SparkEntry.queries.toSeq
      .filterNot(_._1.contains("stream"))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
        val nlj =
          if (plan.contains("BroadcastNestedLoopJoin") && !nljAllowed(name))
            Seq(s"$name: BroadcastNestedLoopJoin")
          else Nil
        cart ++ nlj
      }
    assert(offenders.isEmpty, s"scale-killer plans: ${offenders.mkString("; ")}")
  }
}
