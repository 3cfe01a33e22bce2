package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q70's scale gate swaps exact `percentile` for `percentile_approx` above
  * the gate; this pins how far the sketch's decile cuts can drift from the
  * exact interpolated ones at the accuracy the query uses (10000) — at that
  * accuracy the rank error bound is n/10000, i.e. sub-decile for any n.
  */
class ApproxPercentileParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx decile cuts track exact cuts on a skewed distribution") {
    // deterministic long-tailed values (quadratic ramp + heavy head)
    val xs = (1 to 5000).map(i => math.pow(i % 997, 2) / 997.0)
    val df = xs.toDF("v")
    val pcts = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val row = df
      .agg(
        percentile(col("v"), pcts).as("exact"),
        percentile_approx(col("v"), pcts, lit(10000)).as("approx"))
      .collect()(0)
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    val range = xs.max - xs.min
    exact.zip(approx).zipWithIndex.foreach { case ((e, a), i) =>
      // rank error n/accuracy = 0.5 ranks; allow the two adjacent values
      assert(math.abs(e - a) <= range * 0.01, s"decile ${i + 1}: exact=$e approx=$a")
    }
  }
}
