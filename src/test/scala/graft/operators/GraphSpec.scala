package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def prMap(
      edges: Seq[(String, String, Long)],
      iters: Int,
      damping: Double = 0.85): Map[String, Double] =
    Graph
      .pageRank(edges.toDF("s", "d", "w"), "s", "d", "w", iters, damping)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap

  test("symmetric 2-cycle stays uniform at every iteration count") {
    for (it <- Seq(0, 1, 5)) {
      val pr = prMap(Seq(("a", "b", 1L), ("b", "a", 1L)), it)
      assert(math.abs(pr("a") - 0.5) < 1e-12 && math.abs(pr("b") - 0.5) < 1e-12)
    }
  }

  test("3-cycle converges to uniform 1/3") {
    val pr = prMap(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)), 10)
    pr.values.foreach(p => assert(math.abs(p - 1.0 / 3.0) < 1e-12))
  }

  test("single edge a->b matches the hand-iterated closed form") {
    // N=2, d=0.85: pr1(a) = 0.075; pr1(b) = 0.075 + 0.85*0.5 = 0.5
    // pr2(a) = 0.075; pr2(b) = 0.075 + 0.85*0.075 = 0.13875 (dangling b not redistributed)
    val pr1 = prMap(Seq(("a", "b", 1L)), 1)
    assert(math.abs(pr1("a") - 0.075) < 1e-12)
    assert(math.abs(pr1("b") - 0.5) < 1e-12)
    val pr2 = prMap(Seq(("a", "b", 1L)), 2)
    assert(math.abs(pr2("a") - 0.075) < 1e-12)
    assert(math.abs(pr2("b") - (0.075 + 0.85 * 0.075)) < 1e-12)
  }

  test("edge weights steer mass: heavier out-edge gets proportionally more") {
    // a splits 3:1 between b and c; one iteration from uniform start (N=3)
    val pr = prMap(Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L)), 1)
    val base = 0.15 / 3
    assert(math.abs(pr("b") - (base + 0.85 * (1.0 / 3) * 0.75)) < 1e-12)
    assert(math.abs(pr("c") - (base + 0.85 * (1.0 / 3) * 0.25)) < 1e-12)
    assert(math.abs(pr("a") - (base + 0.85 * (1.0 / 3 + 1.0 / 3))) < 1e-12)
  }
}
