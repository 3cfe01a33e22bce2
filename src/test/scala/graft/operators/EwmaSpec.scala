package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EwmaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** pandas ewm(alpha, adjust=True).mean() reference implementation. */
  private def ref(xs: Seq[Double], alpha: Double): Seq[Double] = {
    val r = 1.0 - alpha
    xs.indices.map { t =>
      val ws = (0 to t).map(i => math.pow(r, t - i))
      (0 to t).map(i => ws(i) * xs(i)).sum / ws.sum
    }
  }

  test("ewma matches the pandas adjust=True closed form per group") {
    val xs = Seq(10.0, 12.0, 9.0, 15.0, 14.0, 20.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i, v) }.toDF("g", "i", "v")
      .union(xs.reverse.zipWithIndex.map { case (v, i) => ("b", i, v) }.toDF("g", "i", "v"))
    val out = WindowOps
      .ewma(df, Seq("g"), Seq("i"), "v", 0.3)
      .orderBy("g", "i")
      .select("g", "v_ewma")
      .as[(String, Double)]
      .collect()
    val (ga, gb) = out.partition(_._1 == "a")
    val expA = ref(xs, 0.3)
    val expB = ref(xs.reverse, 0.3)
    ga.map(_._2).zip(expA).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
    gb.map(_._2).zip(expB).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
  }

  test("first row's ewma is the value itself; alpha near 1 approaches last value") {
    val df = Seq(("a", 0, 5.0), ("a", 1, 100.0)).toDF("g", "i", "v")
    val out = WindowOps
      .ewma(df, Seq("g"), Seq("i"), "v", 0.999)
      .orderBy("i").select("v_ewma").as[Double].collect()
    assert(out(0) == 5.0)
    assert(math.abs(out(1) - 100.0) < 0.2) // weight on x0 is (1-α)=0.001
  }

  test("long series and aggressive alpha stay finite (overflow regression)") {
    // the closed-form pow(r, -i) formulation overflowed to Inf/NaN here:
    // alpha=0.99 dies near row 155, alpha=0.3 near row 2000
    for (alpha <- Seq(0.3, 0.99)) {
      val n = 3000
      val df = (0 until n).map(i => ("g", i, 50.0 + (i % 7))).toDF("g", "i", "v")
      val out = WindowOps.ewma(df, Seq("g"), Seq("i"), "v", alpha)
        .orderBy("i").select("v_ewma").as[Double].collect()
      assert(out.length == n)
      assert(out.forall(e => !e.isNaN && !e.isInfinite), s"alpha=$alpha produced NaN/Inf")
      // every ewma of values in [50, 56] stays in [50, 56]
      assert(out.forall(e => e >= 50.0 && e <= 56.0))
    }
  }

  test("null values emit null ewma and leave the state unchanged") {
    val df = Seq(
      ("a", 0, Some(10.0)), ("a", 1, None), ("a", 2, Some(10.0))
    ).toDF("g", "i", "v")
    val out = WindowOps.ewma(df, Seq("g"), Seq("i"), "v", 0.5)
      .orderBy("i").select("v_ewma").as[Option[Double]].collect()
    assert(out(0).contains(10.0))
    assert(out(1).isEmpty)
    assert(out(2).contains(10.0)) // constant series, gap skipped
  }
}
