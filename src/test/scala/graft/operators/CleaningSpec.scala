package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("whitespaceToNull nulls whitespace-only strings, keeps others") {
    val df = Seq(("  ", "a"), ("b", " c "), ("", "d")).toDF("x", "y")
    val out = Cleaning.whitespaceToNull(df).collect()
    assert(out.map(r => (r.isNullAt(0), r.getString(1))).toSeq ==
      Seq((true, "a"), (false, " c "), (true, "d")))
  }

  test("dropNullColumns keeps only fully-populated columns") {
    val df = Seq((1, Some(2), None: Option[Int]), (3, Some(4), Some(5))).toDF("a", "b", "c")
    assert(Cleaning.dropNullColumns(df).columns.toSeq == Seq("a", "b"))
  }

  test("replaceInf wipes infinities and NaN") {
    val df = Seq(1.0, Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN)
      .toDF("v")
    val out = Cleaning.replaceInf(df, Seq("v")).as[Double].collect().toSeq
    assert(out == Seq(1.0, 0.0, 0.0, 0.0))
  }

  test("remap maps known values, nulls unknown (pandas map semantics)") {
    val df = Seq("M", "B", "X").toDF("d")
    val out = df.select(Cleaning.remap(col("d"), Map("M" -> "1", "B" -> "0")).as("m"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("1"), Some("0"), None))
  }

  test("nullAudit counts nulls per column") {
    val df = Seq((Some(1), None: Option[Int]), (None, None), (Some(3), Some(4))).toDF("a", "b")
    val r = Cleaning.nullAudit(df).head()
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
  }

  test("numericSummary matches hand stats") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val r = Cleaning.numericSummary(df).head()
    assert(r.getLong(0) == 4L)          // count
    assert(r.getDouble(1) == 2.5)       // mean
    assert(math.abs(r.getDouble(2) - 1.2910) < 1e-4) // stddev_samp
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 4.0)
  }
}
