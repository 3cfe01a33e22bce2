package graft.operators

import org.apache.spark.sql.functions._
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
      .ewma(df, WindowOps.spec(Seq("g"), Seq(col("i"))), "v", 0.3)
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

  test("first row's ewma is the value itself; alpha=0.999... approaches last value") {
    val df = Seq(("a", 0, 5.0), ("a", 1, 100.0)).toDF("g", "i", "v")
    val out = WindowOps
      .ewma(df, WindowOps.spec(Seq("g"), Seq(col("i"))), "v", 0.999)
      .orderBy("i").select("v_ewma").as[Double].collect()
    assert(out(0) == 5.0)
    assert(math.abs(out(1) - 100.0) < 0.2) // weight on x0 is (1-α)=0.001
  }
}
