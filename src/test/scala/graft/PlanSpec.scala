package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §4.2: "verify via explain, don't
  * reimplement"): the properties the 100-TB story depends on — filter/column
  * pushdown into the parquet scan, broadcast joins for dimensions,
  * distributed top-k, partial aggregation — must hold in the produced plans.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("filters and projections push into the parquet scan") {
    val df = Engine.table(spark, sf, "lineitem")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"),
      s"no pushed filter in:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more columns than projected:\n$p")
  }

  test("star-join query broadcasts every dimension side") {
    val df = SparkEntry.queries("q02_regional_revenue")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    // customer, nation, region all broadcast -> at least 3 broadcast exchanges
    assert("BroadcastExchange".r.findAllIn(p).size >= 3, s"missing broadcast exchanges:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q03_top_orders")(spark, sf)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
  }

  test("group-by aggregates do partial (map-side) aggregation") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val p = plan(df)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial aggregation before the shuffle:\n$p")
  }

  test("keep-last dedup shuffles once on the key (no extra exchange)") {
    val df = SparkEntry.queries("q05_latest_events")(spark, sf)
    val p = plan(df)
    // one exchange for the window partition key + final order; the window
    // itself must not introduce repeated shuffles on the same key
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"unexpected extra hash exchanges ($exchanges):\n$p")
  }

  test("kNN top-k plans as partial aggregation, not a full-pair window shuffle") {
    val q14 = SparkEntry.queries("q14_knn_bruteforce")(spark, sf)
    val p = plan(q14)
    assert(!p.contains("Window"), s"full-pair window shuffle in kNN plan:\n$p")
    // the bounded-heap aggregator must run a partial phase before the
    // exchange: ObjectHashAggregate with partial_topkbysim upstream
    assert(p.contains("ObjectHashAggregate"), s"expected object hash aggregate:\n$p")
    assert(p.toLowerCase.contains("partial_topkbysim"),
      s"expected map-side partial top-k before the exchange:\n$p")
  }

  test("kNN classification plans without any window operator") {
    val q18 = SparkEntry.queries("q18_knn_classify")(spark, sf)
    val p = plan(q18)
    assert(!p.contains("Window"), s"window shuffle in kNN-classify plan:\n$p")
    assert(p.toLowerCase.contains("partial_topkbysim"),
      s"expected map-side partial top-k before the exchange:\n$p")
  }

  test("whole-stage codegen covers the pricing-summary aggregate") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = plan(df)
    // executedPlan.toString renders WholeStageCodegen spans as "*(n)" prefixes
    assert(p.contains("*("), s"expected codegen spans:\n$p")
  }

  test("simhash near-dup banding plans as an equi-join, never a cartesian") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, i * 0x9e3779b97f4a7c15L)).toDF("doc_id", "sh")
    val p = plan(graft.operators.Dedup.simhashNearDupPairs(docs, "doc_id", "sh"))
    assert(!p.contains("CartesianProduct"), s"cartesian in simhash banding:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in simhash banding:\n$p")
  }

  test("lang-ID query is a single scan with partial aggregation, no join/window") {
    val p = plan(SparkEntry.queries("q41_lang_id")(spark, sf))
    assert(!p.contains("Join"), s"unexpected join in lang-ID plan:\n$p")
    assert(!p.contains("Window"), s"unexpected window in lang-ID plan:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected partial aggregation:\n$p")
  }

  test("corpus curation dedup shuffles digests, not document payloads") {
    val p = plan(SparkEntry.queries("q40_corpus_curation")(spark, sf))
    // the keep-set side of the semi join must reduce to (digest, doc_id)
    // before its exchange: no `text` column may appear in an exchange input
    val exchangeInputs = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeInputs.contains("text"), s"document payload in a shuffle:\n$p")
  }

  test("BM25 ranking plans distributed top-k, partial stats agg, no explode") {
    val p = plan(SparkEntry.queries("q51_bm25_search")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-15:\n$p")
    // the one-row corpus-stats aggregate must have a map-side partial phase
    // (assert the partial_* functions specifically — a bare HashAggregate
    // string also matches final-mode aggregates and would never fail)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected partial aggregation:\n$p")
    // per-doc tf/dl come from one projection over the token array — an
    // Expand/Generate (explode) would mean the token-level shuffle returned
    assert(!p.contains("Generate"), s"unexpected explode in BM25 plan:\n$p")
  }

  test("IVF ANN candidate join is an equi-join with bounded top-k, no window") {
    val p = plan(SparkEntry.queries("q45_ann_ivf")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in IVF plan:\n$p")
    assert(!p.contains("Window"), s"window ranking in IVF plan:\n$p")
    assert(p.contains("top_k_by_sim") || p.contains("ObjectHashAggregate"),
      s"expected bounded top-k aggregation:\n$p")
  }

  test("relational rules broadcast the item-support side (no extra shuffle)") {
    val df = SparkEntry.queries("q53_rule_metrics")(spark, sf)
    val p = plan(df)
    // the two direction joins against the per-item support table must be
    // broadcasts — rule derivation adds no hash exchange beyond the pair
    // and item aggregations themselves
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected both item-support joins broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"rule join fell back to sort-merge:\n$p")
  }

  test("ROC curve pre-aggregates per score before its single-partition window") {
    val df = SparkEntry.queries("q55_roc_auc")(spark, sf)
    val p = plan(df)
    // the windows may legally run single-partition ONLY because the
    // per-threshold tally shrank the frame first: a partial aggregate must
    // appear, and the window input must be the aggregated (thr,pos,neg) frame
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial per-score aggregation before the curve windows:\n$p")
    assert(p.contains("Window"), s"expected window operators:\n$p")
  }

  test("MG heavy-hitters sketch plans with a map-side partial phase") {
    val sh = Engine.table(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.charShingles(col("text"), 5)).as("sh"))
    val sketch = udaf(new graft.functions.MisraGries(100),
      org.apache.spark.sql.Encoders.STRING)
    val p = plan(sh.agg(sketch(col("sh"))))
    // typed Aggregator => ObjectHashAggregate; the partial phase bounds what
    // reaches the exchange at m counters per map partition
    assert(p.contains("ObjectHashAggregate"), s"expected object hash aggregate:\n$p")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final sketch phases:\n$p")
  }

  test("blocked Jaccard pair join never plans a cartesian or single-key shuffle") {
    val p = plan(SparkEntry.queries("q46_ngram_jaccard")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in pair join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop in pair join:\n$p")
    // the equi-join key must include the triangle group, not just `lang`
    assert(p.contains("_g"), s"triangle salt missing from join key:\n$p")
  }
}
