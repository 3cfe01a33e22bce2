package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** Shape/invariant tests for the q60+ pipeline queries (funnel, retention,
  * surprisal, decontamination, sliding windows) on the sf0.001 tables. The
  * value-exact check is the driver's DuckDB oracle; these pin the structural
  * invariants a refactor could silently break.
  */
class PipelineQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf
  import spark.implicits._

  test("q60 funnel: stage counts are monotone non-increasing") {
    val rows = SparkEntry.queries("q60_funnel")(spark, sf)
      .orderBy("stage").as[(String, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq("S1_view", "S2_click_4h", "S3_purchase_48h"))
    val counts = rows.map(_._2)
    assert(counts.head > 0)
    assert(counts.sliding(2).forall { case Seq(a, b) => a >= b })
  }

  test("q61 retention: offsets non-negative, cohort day is the user's first day") {
    val ret = SparkEntry.queries("q61_retention")(spark, sf).collect()
    assert(ret.nonEmpty)
    assert(ret.forall(r => r.getLong(1) >= 0 && r.getLong(2) > 0))
    val minCohort = ret.map(_.getDate(0).toString).min
    val minEvent = Engine.table(spark, sf, "events")
      .agg(min(to_date(col("ts")))).head().getDate(0).toString
    assert(minCohort == minEvent)
  }

  test("q62 surprisal: positive scores, doc counts add up to non-blank docs") {
    val out = SparkEntry.queries("q62_surprisal")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) > 0))
    val nonBlank = Engine.table(spark, sf, "documents")
      .filter(trim(col("text")) =!= "").count()
    assert(out.map(_.getLong(1)).sum == nonBlank)
  }

  test("q63 decontaminate: hashed-gram counts equal a string-gram recount") {
    val out = SparkEntry.queries("q63_decontaminate")(spark, sf).collect()
    assert(out.forall(_.getLong(0) % 50 == 0))
    // independent recount joining on the gram STRINGS (no xxhash64): any
    // hash collision or binding bug in the declared plan would diverge here
    val grams = Engine.table(spark, sf, "documents")
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), explode(TF.wordShingles(lower(col("text")), 3)).as("g"))
      .distinct()
    val bench = grams.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_doc"), col("g"))
    val expected = grams.filter(col("doc_id") % 50 =!= 0)
      .join(bench, "g")
      .groupBy(col("bench_doc"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated"),
        countDistinct(col("g")).as("n_shared_grams"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q63 plan: broadcast equi-join on the hashed gram, no cartesian product") {
    val plan = SparkEntry.queries("q63_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("hashSplit: assignment is independent of partition layout, fractions near cuts") {
    import graft.ml.Features
    val cuts = Seq(("train", 80), ("val", 90), ("test", 100))
    val docs = Engine.table(spark, sf, "documents").select("doc_id")
    val a = docs.withColumn("s", Features.hashSplit(col("doc_id"), cuts))
    val b = docs.repartition(7).withColumn("s", Features.hashSplit(col("doc_id"), cuts))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    val n = docs.count().toDouble
    val byS = a.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum == n)
    assert(math.abs(byS("train") / n - 0.8) < 0.1)
  }

  test("centroids: Summarizer mean equals a per-element average") {
    import org.apache.spark.ml.functions.array_to_vector
    import graft.ml.Clustering
    val df = Seq((0, Seq(1.0, 3.0)), (0, Seq(3.0, 5.0)), (1, Seq(2.0, 2.0)))
      .toDF("g", "arr").withColumn("v", array_to_vector(col("arr")))
    val out = Clustering.centroids(df, "g", "v")
      .orderBy("g").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray.toSeq))
    assert(out.toSeq == Seq((0, 2L, Seq(2.0, 4.0)), (1, 1L, Seq(2.0, 2.0))))
  }

  test("sliding windows: every event lands in exactly window/slide windows (batch form)") {
    val ev = Engine.table(spark, sf, "events")
    val total = ev.count()
    val windowed = ev
      .groupBy(window(col("ts"), "7 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(windowed.agg(sum(col("n"))).head().getLong(0) == 7 * total)
  }

  test("q20 cluster summary: sizes sum to the input count, metrics in range") {
    val r = SparkEntry.queries("q20_cluster_summary")(spark, sf).head()
    val (sil, cons) = (r.getDouble(0), r.getDouble(1))
    val (smaller, larger, n) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(smaller + larger == n, "cluster sizes must partition the input")
    assert(n == Engine.table(spark, sf, "embeddings").count())
    assert(smaller > 0 && smaller <= larger)
    assert(sil >= -1.0 && sil <= 1.0)
    // consistency is majority-vote agreement against the binary label split,
    // so it cannot fall below random-majority 0.5
    assert(cons >= 0.5 && cons <= 1.0)
  }
}
