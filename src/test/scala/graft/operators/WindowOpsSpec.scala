package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Closed-form identities for the COVID-style window features
  * (SURVEY.md §5.2-3: "window features match closed-form lag/diff identities").
  */
class WindowOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // series x_t = t^2 for t = 1..10 — closed forms are easy
  val df = (1 to 10).map(t => (t, (t * t).toDouble)).toDF("t", "x")
  val w = WindowOps.spec(Seq.empty, Seq(col("t")))

  test("lag-k returns x[t-k]") {
    val out = WindowOps.lagFeatures(df, w, Seq("x"), Seq(1, 3))
      .orderBy("t").collect()
    out.foreach { r =>
      val t = r.getInt(0)
      if (t > 1) assert(r.getDouble(r.fieldIndex("x_lag1")) == math.pow(t - 1, 2))
      else assert(r.isNullAt(r.fieldIndex("x_lag1")))
      if (t > 3) assert(r.getDouble(r.fieldIndex("x_lag3")) == math.pow(t - 3, 2))
    }
  }

  test("trailingMean excludes current row and honors min_periods=1") {
    val out = WindowOps.trailingMean(df, w, "x", 3).orderBy("t").collect()
    // t=1: empty frame -> null (pandas shift(1) of rolling -> NaN)
    assert(out.head.isNullAt(out.head.fieldIndex("x_ma3")))
    // t=2: mean of {x1} = 1  (min_periods=1: short frame still averages)
    assert(out(1).getDouble(out(1).fieldIndex("x_ma3")) == 1.0)
    // t=5: mean of {x2,x3,x4} = (4+9+16)/3
    assert(math.abs(out(4).getDouble(out(4).fieldIndex("x_ma3")) - 29.0 / 3) < 1e-12)
  }

  test("laggedPctChange = (x[t-1]-x[t-2])/x[t-2]") {
    val out = WindowOps.laggedPctChange(df, w, "x").orderBy("t").collect()
    val r5 = out(4) // t=5: (16-9)/9
    assert(math.abs(r5.getDouble(r5.fieldIndex("x_pct_change")) - 7.0 / 9) < 1e-12)
    assert(out(0).isNullAt(out(0).fieldIndex("x_pct_change")))
    assert(out(1).isNullAt(out(1).fieldIndex("x_pct_change")))
  }

  test("laggedDiff k = x[t-1]-x[t-1-k]") {
    val out = WindowOps.laggedDiff(df, w, "x", 2).orderBy("t").collect()
    val r6 = out(5) // t=6: x5 - x3 = 25 - 9
    assert(r6.getDouble(r6.fieldIndex("x_diff2")) == 16.0)
  }

  test("trendLabel discretizes next-vs-current with ±band") {
    val s = Seq((1, 100.0), (2, 110.0), (3, 100.0), (4, 102.0), (5, 102.0))
      .toDF("t", "v")
    val out = WindowOps.trendLabel(s, w.orderBy(col("t")), "v", 0.05)
      .orderBy("t").select("trend").collect()
      .map(r => Option(r.getString(0))).toSeq
    // 100->110 up (+10%), 110->100 down (-9%), 100->102 flat (+2%), 102->102 flat, last null
    assert(out == Seq(Some("up"), Some("down"), Some("flat"), Some("flat"), None))
  }

  test("ordinal materializes 1-based row numbers in order") {
    val out = WindowOps.ordinal(df.orderBy(rand()), w, "rn")
      .orderBy("t").select("rn").as[Int].collect().toSeq
    assert(out == (1 to 10))
  }
}
