package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class WeightedMedianSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: the sorted cumulative-window form of the same lower-median
    * convention — the small-cardinality alternative the histogram path must
    * agree with exactly.
    */
  private def windowForm(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Double)] = {
    val byV = df.groupBy(col("g"), col("v")).agg(sum(col("w")).as("wt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("g"))
    byV
      .withColumn("cum", sum(col("wt")).over(wCum))
      .withColumn("tot", sum(col("wt")).over(wAll))
      .filter(col("cum") >= col("tot") / 2)
      .groupBy(col("g"))
      .agg(first(col("tot")).as("tot"), min(col("v")).as("med"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(1)))
      .toMap
  }

  test("histogram path equals the window form on randomized grouped data") {
    val rnd = new scala.util.Random(20260813)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(5)}"
      // 2-dp money-style values with heavy ties, integer weights incl. zero
      (g, math.round(rnd.nextDouble() * 10000) / 100.0, rnd.nextInt(9).toDouble)
    }
    val df = rows.toDF("g", "v", "w")
    val expected = windowForm(df)
    val got = WeightedMedian(df, Seq("g"), "v", "w", outCol = "med", totCol = "tot")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("med"), r.getAs[Double]("tot")))
      .toMap
    assert(got == expected)
  }

  test("single-value groups, null keys, and null values/weights") {
    val df = Seq[(Option[String], Option[Double], Option[Double])](
      (Some("a"), Some(5.0), Some(3.0)),
      (Some("a"), Some(5.0), Some(2.0)),          // single distinct value
      (None, Some(1.0), Some(1.0)),               // null group key is a real group
      (None, Some(2.0), Some(1.0)),
      (Some("b"), None, Some(9.0)),               // null value excluded
      (Some("b"), Some(7.0), None),               // null weight excluded
      (Some("b"), Some(4.0), Some(1.0)),
      (Some("b"), Some(8.0), Some(1.0))
    ).toDF("g", "v", "w")
    val got = WeightedMedian(df, Seq("g"), "v", "w", outCol = "med", totCol = "tot")
      .collect()
      .map(r => Option(r.getString(0)) -> (r.getAs[Double]("med"), r.getAs[Double]("tot")))
      .toMap
    // null group: cum at v=1 is 1 >= 2/2 -> lower median 1
    assert(got == Map(
      Option("a") -> (5.0, 5.0),
      Option.empty[String] -> (1.0, 2.0),
      Option("b") -> (4.0, 2.0)))
  }

  test("multi-column group keys do not collide across the separator") {
    val df = Seq(
      ("ab", "c", 1.0, 1.0), ("ab", "c", 3.0, 1.0),
      ("a", "bc", 10.0, 1.0), ("a", "bc", 30.0, 1.0)
    ).toDF("g1", "g2", "v", "w")
    val got = WeightedMedian(df, Seq("g1", "g2"), "v", "w", outCol = "med", totCol = "tot")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("med"))
      .toMap
    assert(got == Map(("ab", "c") -> 1.0, ("a", "bc") -> 10.0))
  }

  test("negative weights are rejected, not silently folded into the descent") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, -0.5)).toDF("k", "v", "w")
    val e = intercept[IllegalArgumentException] {
      WeightedMedian(df, Seq("k"), "v", "w").collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("adjacent-double values converge (range refinement bottoms out)") {
    val v1 = 1.0
    val v2 = math.nextUp(v1)
    val df = Seq(("g", v1, 1.0), ("g", v2, 3.0)).toDF("g", "v", "w")
    val got = WeightedMedian(df, Seq("g"), "v", "w", outCol = "med", totCol = "tot").collect()
    // cum(v1)=1 < 2, cum(v2)=4 >= 2 -> median v2
    assert(got.head.getAs[Double]("med") == v2)
  }
}
