package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SoftSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hashFrac(id: Long): Double =
    (((id % 2147483648L) * 2654435761L) % 4294967296L).toDouble / 4294967296.0

  test("membership matches the hash formula exactly") {
    val rows = (0L to 400L).map(i => (i, (i % 10) / 10.0))
    val df = rows.toDF("id", "p")
    val kept = Features.softSample(df, "id", col("p"))
      .select("id").as[Long].collect().toSet
    val exp = rows.filter { case (id, p) => hashFrac(id) < p }.map(_._1).toSet
    assert(kept == exp)
    assert(kept.nonEmpty && kept.size < rows.size)
  }

  test("p=1 keeps everything, p=0 keeps nothing, and clamping holds") {
    val df = (1L to 100L).map(i => (i, 0.0)).toDF("id", "z")
    assert(Features.softSample(df, "id", lit(1.0)).count() == 100L)
    assert(Features.softSample(df, "id", lit(5.0)).count() == 100L) // clamped to 1
    assert(Features.softSample(df, "id", lit(0.0)).count() == 0L)
    assert(Features.softSample(df, "id", lit(-3.0)).count() == 0L) // clamped to 0
  }

  test("monotone: raising the probability never drops a kept row") {
    val df = (1L to 500L).map(i => (i, ())).map(_._1).toDF("id")
    val low = Features.softSample(df, "id", lit(0.3)).as[Long].collect().toSet
    val high = Features.softSample(df, "id", lit(0.7)).as[Long].collect().toSet
    assert(low.subsetOf(high))
    // acceptance rate tracks p closely (systematic-sampling low discrepancy)
    assert(math.abs(low.size / 500.0 - 0.3) < 0.05)
    assert(math.abs(high.size / 500.0 - 0.7) < 0.05)
  }

  test("no shuffle: the plan is scan -> filter only") {
    val df = (1L to 50L).map(i => (i, 0.5)).toDF("id", "p")
    val plan = Features.softSample(df, "id", col("p"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }
}
