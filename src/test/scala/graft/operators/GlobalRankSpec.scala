package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample(n: Int) = {
    val rnd = new scala.util.Random(42)
    // heavy ties (values 0..9) force tie runs to straddle range boundaries;
    // id tiebreak restores the deterministic total order
    (1 to n).map(i => (i, rnd.nextInt(10).toDouble)).toDF("id", "v")
  }

  test("globalRowNumber equals single-partition row_number on a tie-broken order") {
    val df = sample(500)
    val expected = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val actual = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), "rk", 7)
    assert(
      expected.select("id", "rk").except(actual.select("id", "rk")).isEmpty &&
        actual.select("id", "rk").except(expected.select("id", "rk")).isEmpty)
  }

  test("globalNtile matches SQL ntile for N % k != 0, descending order") {
    val df = sample(103) // 103 = 5*20 + 3: buckets 1-3 get 21 rows, 4-5 get 20
    val expected = df.withColumn(
      "b", ntile(5).over(Window.orderBy(col("v").desc, col("id"))))
    val actual = GlobalRank.globalNtile(df, Seq(col("v").desc, col("id")), 5, "b", 6)
    assert(
      expected.select("id", "b").except(actual.select("id", "b")).isEmpty &&
        actual.select("id", "b").except(expected.select("id", "b")).isEmpty)
  }

  test("globalNtile with fewer rows than buckets gives bucket i = rank i") {
    val df = Seq((1, 5.0), (2, 1.0), (3, 3.0)).toDF("id", "v")
    val out = GlobalRank.globalNtile(df, Seq(col("v"), col("id")), 10, "b", 4)
      .orderBy("b").select("id", "b").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((2, 1), (3, 2), (1, 3)))
  }

  test("null sort values rank first, matching Window.orderBy null ordering") {
    val df = Seq((1, Some(2.0)), (2, None), (3, Some(1.0)), (4, None))
      .toDF("id", "v")
    val expected = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val actual = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), "rk", 3)
    assert(
      expected.select("id", "rk").except(actual.select("id", "rk")).isEmpty &&
        actual.select("id", "rk").except(expected.select("id", "rk")).isEmpty)
  }

  test("globalCumSum equals the single-partition running sum (long and double)") {
    val df = sample(301).withColumn("d", col("v") / 3.0)
    val wRef = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cs", sum(col("id")).over(wRef))
      .withColumn("cd", sum(col("d")).over(wRef))
    val actual0 = GlobalRank.globalCumSum(df, Seq(col("v"), col("id")), col("id"), "cs", 9)
    val actual = GlobalRank.globalCumSum(actual0, Seq(col("v"), col("id")), col("d"), "cd", 9)
    val expMap = expected.select("id", "cs", "cd").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val actMap = actual.select("id", "cs", "cd").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(expMap.keySet == actMap.keySet)
    expMap.foreach { case (id, (cs, cd)) =>
      val (acs, acd) = actMap(id)
      assert(cs == acs, s"id=$id long cumsum")
      assert(math.abs(cd - acd) < 1e-9, s"id=$id double cumsum")
    }
  }

  test("globalRunningMaxExclusive equals the single-partition exclusive running max") {
    val df = sample(250)
    val wRef = Window.orderBy(col("id").desc).rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("pm", max(col("v")).over(wRef))
    val actual = GlobalRank.globalRunningMaxExclusive(df, Seq(col("id").desc), col("v"), "pm", 7)
    assert(
      expected.select("id", "pm").except(actual.select("id", "pm")).isEmpty &&
        actual.select("id", "pm").except(expected.select("id", "pm")).isEmpty)
  }

  test("plan contains no unpartitioned WindowExec (the single-partition sort)") {
    val df = sample(200)
    val plan = GlobalRank.globalNtile(df, Seq(col("v"), col("id")), 10, "b", 5)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned WindowExec found:\n$plan")
  }

  test("globalCumSum over a DECIMAL column stays decimal and exact (no double collapse)") {
    import org.apache.spark.sql.types.DecimalType
    val df = (1 to 100).map(i => (i.toLong, BigDecimal(i) * BigDecimal("0.01")))
      .toDF("id", "amt")
      .select(col("id"), col("amt").cast(DecimalType(12, 2)).as("amt"))
    val got = GlobalRank.globalCumSum(df, Seq(col("id")), col("amt"), "cs", 5)
    assert(got.schema("cs").dataType.isInstanceOf[DecimalType],
      s"cumsum type degraded to ${got.schema("cs").dataType}")
    val expected = df.withColumn(
      "cs",
      sum(col("amt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val mismatches = got.select(col("id"), col("cs").cast("string"))
      .except(expected.select(col("id"), col("cs").cast("string")))
    assert(mismatches.isEmpty, s"decimal cumsum diverged: ${mismatches.collect().toSeq}")
  }

  test("globalNtileGrouped = per-group SQL ntile off one exchange") {
    val rnd = new scala.util.Random(7)
    // 3 groups of different sizes (uneven N % k), heavy value ties
    val df = (1 to 400).map { i =>
      (i, i % 3, rnd.nextInt(10).toDouble)
    }.toDF("id", "g", "v")
    val expected = df.withColumn(
      "b", ntile(7).over(Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
    val actual = GlobalRank.globalNtileGrouped(
      df, "g", Seq(col("v").desc, col("id")), 7, "b", 6)
    assert(
      expected.select("id", "b").except(actual.select("id", "b")).isEmpty &&
        actual.select("id", "b").except(expected.select("id", "b")).isEmpty)
    // exactly ONE range exchange in the plan (the point of the grouped form)
    val plan = actual.queryExecution.executedPlan
    val rangeExchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
    }
    // the checkpointed exchange is upstream of the scanned RDD — the plan
    // AFTER the checkpoint must not add another range exchange
    assert(rangeExchanges.isEmpty, s"unexpected post-checkpoint range exchange:\n$plan")
    // and the ranking window is partition-parallel, not a global sort
    val bad = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"unpartitioned WindowExec found:\n$plan")
  }

  test("counts per bucket follow the SQL sizing q+1 for the first r buckets") {
    val df = sample(47) // k=10: q=4, r=7 -> buckets 1..7 size 5, 8..10 size 4
    val sizes = GlobalRank.globalNtile(df, Seq(col("v"), col("id")), 10, "b", 8)
      .groupBy("b").count().orderBy("b").as[(Int, Long)].collect().toSeq
    assert(sizes == (1 to 7).map(b => (b, 5L)) ++ (8 to 10).map(b => (b, 4L)))
  }
}
