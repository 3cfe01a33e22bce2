package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pin, SimilarityJoin, SimilarityStrategy}

/** Physical-plan pins for the round-8 operators — the properties their
  * 100-TB contracts depend on, asserted from the produced plans.
  */
class Round8PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("leftIndex removes every corpus-side explode from the prefix join") {
    // THE point of the postings index: the stored corpus postings are
    // scanned, never re-derived — the only Generate(explode) left in the
    // plan is the batch (right) side's postings build. Pin.Off keeps every
    // subtree visible in one plan string (localCheckpoint would hide the
    // prep inside RDD scans).
    val l = (1 to 40).map(i => (i.toLong, Seq.tabulate(12)(j => (i * 7 + j).toLong)))
      .toDF("lid", "s")
    val r = (100 to 120).map(i => (i.toLong, Seq.tabulate(12)(j => (i * 3 + j).toLong)))
      .toDF("rid", "s")
    val (freq, posts) = SimilarityJoin.prefixIndex(l, "lid", "s", 0.5)
    val f = freq.localCheckpoint()
    val p = posts.localCheckpoint()
    def explodes(df: DataFrame): Int =
      plan(df).linesIterator.count(_.contains("Generate explode"))
    val without = explodes(SimilarityJoin.jaccardJoin(
      l, "lid", r, "rid", "s", 0.5,
      strategy = SimilarityStrategy.PrefixFilter, pin = Pin.Off))
    val withIdx = explodes(SimilarityJoin.jaccardJoin(
      l, "lid", r, "rid", "s", 0.5,
      strategy = SimilarityStrategy.PrefixFilter, pin = Pin.Off,
      leftIndex = Some((f, p)), leftPinned = true))
    assert(withIdx == 1,
      s"indexed join must explode ONLY the batch side (got $withIdx)")
    assert(without > withIdx,
      s"baseline should re-derive more ($without vs $withIdx)")
  }

  test("q249 adaptive quantiles: windows only over cell tables, no UDFs") {
    val p = plan(SparkEntry.queries("q249_adaptive_quantiles")(spark, sf))
    // the only windows in the read-off run over <= bins rows per group —
    // every Window line must be partitioned by the group column, never a
    // global (empty-partition) window over data-sized input
    val wins = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(wins.nonEmpty, s"expected the cumulative-rank window:\n$p")
    wins.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("o_orderpriority"),
        s"window not partitioned by the group column: $l")
    }
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      s"UDF in plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("streaming ES sample core plans as a partial bounded-heap aggregate") {
    val ev = Engine.table(spark, sf, "events")
    val p = plan(graft.operators.WeightedSample.bufs(
      ev, "event_type", "event_id", floor(col("value")).cast("long"), 16))
    assert(p.contains("ObjectHashAggregate"), s"no bounded-heap aggregate:\n$p")
    assert(!p.contains("Window"), s"ES bufs must never window-sort the stream:\n$p")
  }
}
