package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-6 operators — the properties their
  * 100-TB contracts depend on, asserted from the produced plans.
  */
class Round6PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("HLL cells aggregate partially before the exchange (bounded map-side state)") {
    val docs = Engine.table(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
    val p = plan(graft.functions.HyperLogLog.cells(docs, col("w"), p = 9))
    assert(p.contains("partial_max"), s"no partial max aggregation:\n$p")
  }

  test("HLL bucket/rho are pure native expressions — no UDF anywhere in q234") {
    val p = plan(SparkEntry.queries("q234_hll_distinct")(spark, sf))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), s"UDF in plan:\n$p")
  }

  test("q19: one broadcast of the 1-row centroid frame; the test side never shuffles") {
    val df = SparkEntry.queries("q19_scored_classifier")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("BroadcastExchange"),
      s"centroid row not broadcast:\n$p")
    // exchanges: centroid aggregation (2 rows), final orderBy — the scored
    // side itself must not shuffle row-scale data
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"unexpected row-scale shuffles:\n$p")
  }

  test("q20: Lloyd assignment is a narrow map over literal centroids (no join in the final pass)") {
    val p = plan(SparkEntry.queries("q20_cluster_summary")(spark, sf))
    // the final assignment + one-pass summary: a scan, a project with the
    // distance expressions, and ONE aggregate — no join of any kind
    assert(!p.contains("Join"), s"final Lloyd pass must not join:\n$p")
    assert(!p.contains("ScalaUDF"), s"UDF in plan:\n$p")
  }

  test("self-join BlockedAllPairs strategy plans equi-joins only (salted, no nested loop)") {
    import spark.implicits._
    val rows = (1L to 50L).map(i => (i, Seq(i, i + 1, i + 2)))
    val p = plan(graft.operators.SimilarityJoin.jaccardSelfJoin(
      rows.toDF("id", "s"), "id", "s", 0.5,
      strategy = graft.operators.SimilarityStrategy.AllPairs))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs path must stay an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
  }

  test("writeClustered output plan: z-sorted write is one range exchange, no extra shuffle") {
    val ev = Engine.table(spark, sf, "events").select(
      pmod(col("user_id"), lit(64)).cast("long").as("x"),
      pmod(dayofyear(col("ts")), lit(64)).cast("long").as("y"))
    val laid = graft.operators.ZOrder.zOrderBy(ev, Seq(col("x"), col("y")), bits = 6)
    val p = plan(laid)
    assert(p.contains("rangepartitioning"), s"no range exchange on z:\n$p")
    // exactly the one range exchange (Engine.table's single-row-group
    // round-robin rebalance is input plumbing, not layout cost); no
    // hash-partitioned shuffle may appear
    assert("rangepartitioning".r.findAllIn(p).size == 1 &&
      !p.contains("Exchange hashpartitioning"),
      s"extra shuffles in the layout pass:\n$p")
  }
}
