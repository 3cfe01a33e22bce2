package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketches (Apache DataSketches via Spark 3.5+ functions) —
  * the canonical 100-TB distinct-counting pattern: per-partition (here
  * per-day) sketches aggregate once, then MERGE into any coarser rollup
  * without re-scanning rows. Estimates must land within the sketch's
  * error bound of the exact distinct count at every rollup level.
  */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  test("per-day user sketches merge to month/global distincts within error bounds") {
    val ev = Engine.table(spark, sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .withColumn("month", trunc(col("day"), "month"))
    // lgConfigK=12 -> relative standard error ~1.04/sqrt(2^12) ~ 1.6%
    val daily = ev
      .groupBy(col("day"), col("month"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val monthly = daily
      .groupBy(col("month"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
    val exactM = ev.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val rows = monthly.join(exactM, "month").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"month ${r.get(0)}: est $est vs exact $exact")
    }
    // global: merge ALL daily sketches
    val global = daily.agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect()(0).getAs[Long]("est").toDouble
    val exactG = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0).toDouble
    assert(math.abs(global - exactG) / exactG < 0.05, s"global est $global vs $exactG")
  }
}
