package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the round-7 operators — the properties their
  * 100-TB contracts depend on, asserted from the produced plans.
  */
class Round7PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("KMV bufs aggregate partially before the exchange (bounded map-side state)") {
    val ev = Engine.table(spark, sf, "events")
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val p = plan(graft.functions.Kmv.bufs(ev, col("u"), 16, Seq("event_type")))
    // the typed bottom-k Aggregator must plan with a partial phase: each
    // map task reduces to <= 2k live entries per group before the exchange
    assert(p.contains("ObjectHashAggregate"), s"bottom-k not ObjectHashAggregate:\n$p")
    assert(p.contains("partial_bottomkbyhash") ||
      "partial_.*BottomK".r.findFirstIn(p.toLowerCase).isDefined ||
      p.toLowerCase.contains("partial"), s"no partial aggregation phase:\n$p")
  }

  test("q245 weighted sample: bounded-heap aggregation, never a corpus window sort") {
    val p = plan(SparkEntry.queries("q245_weighted_sample")(spark, sf))
    assert(!p.contains("Window"), s"weighted sample must not window-sort the corpus:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no bounded-heap aggregate:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), s"UDF in plan:\n$p")
  }

  test("q247 domain caps: bounded-heap aggregation, never a corpus window sort") {
    val p = plan(SparkEntry.queries("q247_domain_caps")(spark, sf))
    assert(!p.contains("Window"), s"domain caps must not window-sort the corpus:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"no bounded-heap aggregate:\n$p")
  }

  test("q244 KMV set algebra: the only nested-loop product is the segment pair domain") {
    val p = plan(SparkEntry.queries("q244_kmv_overlap")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian product:\n$p")
    // every BNLJ must be the segs x segs pair frame (dimension-bounded, so a
    // nested loop over it is fine even duplicated across the estimate and
    // exact-truth branches); sketch-cell and truth joins stay equi-joins
    val nlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(nlj.nonEmpty, s"expected the pair-domain nested loop:\n$p")
    nlj.foreach { l =>
      assert(l.contains("seg_a") && l.contains("seg_b"),
        s"nested loop that is not the bounded pair domain: $l\n$p")
    }
  }

  test("q244 estimates agree with the exact columns at sketch accuracy") {
    val rows = SparkEntry.queries("q244_kmv_overlap")(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val estU = r.getAs[Double]("est_union")
      val exU = r.getAs[Long]("exact_union").toDouble
      // k = 128 => sigma ~ 1/sqrt(126) ~ 8.9%; 4 sigma
      assert(math.abs(estU - exU) / exU <= 4.0 / math.sqrt(126.0),
        s"union estimate off: $estU vs $exU for $r")
    }
  }

  test("CountMin estimate probes are broadcast joins over pinned cells (items never shuffle)") {
    val docs = Engine.table(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
    val sk = graft.functions.CountMin.sketch(docs, col("w"), depth = 4, width = 512)
    val items = docs.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val p = plan(graft.functions.CountMin.estimate(sk, items, "w", depth = 4, width = 512))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, s"expected 4 broadcast probes:\n$p")
    // the pinned cell table surfaces as a checkpointed scan, not the
    // caller's sketch aggregation re-planned per depth
    assert(!p.contains("partial_sum"), s"sketch aggregation re-executed inside estimate:\n$p")
  }
}
