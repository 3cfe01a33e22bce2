package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val points = Seq(0L, 1L, 5L, 9L, 10L, 17L, 23L, 99L).toDF("p")
  private val intervals = Seq(
    (1L, 0L, 10L),   // wide: spans several bins
    (2L, 9L, 10L),   // single point
    (3L, 10L, 18L),  // adjacent, [10,18)
    (4L, 23L, 23L),  // empty: end == start
    (5L, 40L, 38L))  // inverted: end < start
    .toDF("iid", "s", "e")

  private def naive =
    points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("p", "iid").as[(Long, Long)].collect().toSet

  test("binned range join equals the naive cross-join filter, any bin width") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("p", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate matches at binWidth=$w")
      assert(got.toSet == naive, s"mismatch at binWidth=$w")
    }
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 3L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
