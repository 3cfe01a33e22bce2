package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class HoltSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(ys: Seq[Double], alpha: Double, beta: Double): (Double, Double) = {
    var l = ys.head
    var b = 0.0
    ys.tail.foreach { y =>
      val nl = alpha * y + (1.0 - alpha) * (l + b)
      b = beta * (nl - l) + (1.0 - beta) * b
      l = nl
    }
    (l, b)
  }

  test("holt matches the scalar recursion per group and tracks a linear series") {
    val g1 = (1 to 12).map(i => ("a", i, 3.0 * i + 5)) // exact line
    val g2 = Seq(("b", 1, 10.0), ("b", 2, 12.0), ("b", 3, 11.0), ("b", 4, 15.0))
    val out = WindowOps
      .holt((g1 ++ g2).toDF("g", "i", "v"), Seq("g"), Seq("i"), "v", 0.3, 0.2)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val (l1, b1) = reference(g1.map(_._3), 0.3, 0.2)
    val (l2, b2) = reference(g2.map(_._3), 0.3, 0.2)
    assert(out("a")._1 == 12L && out("b")._1 == 4L)
    assert(math.abs(out("a")._2 - l1) < 1e-12 && math.abs(out("a")._3 - b1) < 1e-12)
    assert(math.abs(out("b")._2 - l2) < 1e-12 && math.abs(out("b")._3 - b2) < 1e-12)
    // on a long linear ramp the trend estimate approaches the true slope
    assert(math.abs(out("a")._3 - 3.0) < 1.5)
  }

  test("holt ignores null values and seeds from the first non-null") {
    val df = Seq(
      ("g", 1, Option.empty[Double]), ("g", 2, Some(5.0)), ("g", 3, Some(7.0)))
      .toDF("g", "i", "v")
    val r = WindowOps.holt(df, Seq("g"), Seq("i"), "v", 0.5, 0.5).head()
    assert(r.getLong(1) == 2L)
    // l1=5, b1=0; l2 = .5*7 + .5*5 = 6, b2 = .5*(6-5) = 0.5
    assert(r.getDouble(2) == 6.0 && r.getDouble(3) == 0.5)
  }
}
