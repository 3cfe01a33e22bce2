package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("corrMatrix emits one row per ordered pair with exact ±1 for linear columns") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i + 1, -3.0 * i)).toDF("x", "y", "z")
    val out = Stats.corrMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_a", "col_b").collect()
    val byPair = out.map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(byPair.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(approx(byPair(("x", "y")), 1.0))
    assert(approx(byPair(("x", "z")), -1.0))
    assert(approx(byPair(("y", "z")), -1.0))
  }

  test("chiSquareIndependence matches the hand-computed 2x2 table") {
    // observed [[10, 20], [20, 10]]: all expected = 15, chi2 = 4*(25/15)
    val rows =
      Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
        Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").head()
    assert(r.getLong(0) == 60L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (2L, 2L, 1L))
    assert(approx(r.getDouble(4), 100.0 / 15.0))
    assert(approx(r.getDouble(5), math.sqrt(100.0 / 15.0 / 60.0)))
  }

  test("chiSquareIndependence charges expected counts for zero-observed cells") {
    // perfectly dependent 2x2: only (a,x) and (b,y) observed -> chi2 = n, V = 1
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Stats.chiSquareIndependence(rows.toDF("r", "c"), "r", "c").head()
    assert(r.getLong(0) == 20L)
    assert(approx(r.getDouble(4), 20.0))
    assert(approx(r.getDouble(5), 1.0))
  }

  test("olsFit recovers y = 2x + 3 exactly and nulls degenerate groups") {
    val fit = (1 to 10).map(i => ("fit", i.toDouble, 2.0 * i + 3))
    val flat = (1 to 10).map(i => ("flat", 5.0, i.toDouble)) // constant x
    val out = Stats.olsFit((fit ++ flat).toDF("g", "x", "y"), Seq("g"), "x", "y")
      .orderBy("g").collect()
    val Array(f, d) = out.partition(_.getString(0) == "fit") match {
      case (a, b) => Array(a.head, b.head)
    }
    assert(f.getLong(1) == 10L)
    assert(approx(f.getDouble(2), 2.0))
    assert(approx(f.getDouble(3), 3.0))
    assert(approx(f.getDouble(4), 1.0))
    assert(d.isNullAt(2) && d.isNullAt(3) && d.isNullAt(4))
  }

  test("madOutliers flags the planted outlier and reports exact median/MAD") {
    // 1..9 plus 100: med 5.5; |dev| sorted has median 2.5; z(100) = 25.4937
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("g", "v")
    val r = Stats.madOutliers(df, Seq("g"), "v").head()
    assert(r.getLong(1) == 10L)
    assert(approx(r.getDouble(2), 5.5))
    assert(approx(r.getDouble(3), 2.5))
    assert(r.getLong(4) == 1L)
    assert(approx(r.getDouble(5), 94.5 * 0.6745 / 2.5))
  }

  test("madOutliers on a constant group yields MAD 0, null z, no outliers") {
    val df = Seq.fill(5)(("g", 7.0)).toDF("g", "v")
    val r = Stats.madOutliers(df, Seq("g"), "v").head()
    assert(r.getDouble(3) == 0.0)
    assert(r.getLong(4) == 0L)
    assert(r.isNullAt(5))
  }

  test("theilSen recovers the exact slope of a clean line") {
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i + 3)).toDF("x", "y")
    val r = Stats.theilSen(df, "x", "y").head()
    assert(r.getLong(0) == 45L) // 10 choose 2
    assert(approx(r.getDouble(1), 2.0))
  }

  test("theilSen shrugs off a gross outlier that would wreck OLS") {
    val df = (1 to 11).map(i => (i.toDouble, if (i == 6) 1e6 else 2.0 * i + 3)).toDF("x", "y")
    val slope = Stats.theilSen(df, "x", "y").head().getDouble(1)
    assert(approx(slope, 2.0)) // median of pair slopes ignores the 10 corrupted pairs
  }

  test("mannKendall flags a strictly increasing series and computes S exactly") {
    val df = (1 to 20).map(i => (i, i.toDouble)).toDF("t", "v")
    val r = Stats.mannKendall(df, "t", "v").head()
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 190L)
    assert(r.getLong(2) == 190L) // every pair ascending
    // var_s = 20*19*45/18 = 950; z = (190-1)/sqrt(950)
    assert(approx(r.getDouble(3), 950.0))
    assert(approx(r.getDouble(4), 189.0 / math.sqrt(950.0)))
    assert(r.getString(5) == "trend")
  }

  test("mannKendall on a constant series is S=0, z=0, no_trend") {
    val df = (1 to 15).map(i => (i, 4.2)).toDF("t", "v")
    val r = Stats.mannKendall(df, "t", "v").head()
    assert(r.getLong(2) == 0L)
    // every value tied: tie-adjusted Var(S) = 0, z defined as 0
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.0)
    assert(r.getString(5) == "no_trend")
  }

  test("mannKendall applies the Kendall tie correction to Var(S)") {
    // series 1,1,2,2,2,3,...,8 (n=10): tie groups t={2,3} ⇒
    // tie_term = 2*1*9 + 3*2*11 = 84; var_s = (10*9*25 - 84)/18 = 120.333…
    val vs = Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v")
    val r = Stats.mannKendall(df, "t", "v").head()
    // S: all non-tied pairs ascend; tied pairs contribute 0.
    // n_pairs = 45; tied pairs = C(2,2)+C(3,2) = 1+3 = 4 ⇒ S = 41
    assert(r.getLong(2) == 41L)
    assert(approx(r.getDouble(3), (10.0 * 9 * 25 - 84) / 18))
    assert(approx(r.getDouble(4), 40.0 / math.sqrt((10.0 * 9 * 25 - 84) / 18)))
    assert(r.getString(5) == "trend")
  }
}
