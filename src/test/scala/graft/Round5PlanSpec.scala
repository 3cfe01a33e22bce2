package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-5 operators — the properties their
  * 100-TB contracts depend on, asserted from the produced plans.
  */
class Round5PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q222: the train-slice lang filter reaches the parquet scan") {
    // assert on the LM frame itself — the final q222 plan starts from
    // GlobalRank's localCheckpoint, which truncates the scan lineage
    val docs = Engine.table(spark, sf, "documents")
    val p = plan(graft.text.LanguageModel
      .bigramCrossEntropy(docs.filter(col("lang") === "en"), docs, "doc_id", "text"))
    assert(p.contains("EqualTo(lang,en)"), s"lang filter not pushed:\n${p.take(4000)}")
  }

  test("CMS sketch aggregates partially before the exchange (bounded map-side state)") {
    val docs = Engine.table(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
    val p = plan(graft.functions.CountMin.sketch(docs, col("w"), depth = 4, width = 64))
    assert(p.contains("partial_count"), s"no partial aggregation:\n$p")
  }

  test("CMS estimate broadcasts the cell table (never shuffles the items side)") {
    val docs = Engine.table(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
    val sk = graft.functions.CountMin.sketch(docs, col("w"), depth = 4, width = 64)
    val items = docs.distinct()
    val p = plan(graft.functions.CountMin.estimate(sk, items, "w", 4, 64))
    assert(p.contains("BroadcastHashJoin"), s"cell-table probe not broadcast:\n$p")
  }

  test("q228: candidate generation and verify are equi-joins, zero nested loops") {
    val p = plan(SparkEntry.queries("q228_incremental_neardup")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"non-equi join in the similarity join:\n$p")
  }

  test("q229: the z-value is pure native arithmetic — no UDF, no extra exchange") {
    val df = SparkEntry.queries("q229_zorder_layout")(spark, sf)
    val p = plan(df)
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), s"UDF in plan:\n$p")
    // the interleave shows up as native shiftleft/shiftright bit expressions
    assert(p.contains("shiftleft") && p.contains("shiftright"),
      s"z arithmetic not inlined as native expressions:\n${p.take(2000)}")
    // one exchange for the groupBy, one for the final orderBy — nothing more
    assert("Exchange".r.findAllIn(p).size <= 3, s"unexpected exchanges:\n$p")
  }

  test("q227: the negative-scoring side broadcasts the anchor set") {
    val p = plan(SparkEntry.queries("q227_contrastive_triplets")(spark, sf))
    assert(p.contains("BroadcastExchange"), s"anchors not broadcast:\n$p")
  }
}
