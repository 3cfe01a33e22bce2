package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class KeySkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("uniform distribution: max entropy, hhi = 1/k, top_share = 1/k") {
    // 4 keys x 5 rows each
    val df = (0 until 20).map(i => ("g", s"k${i % 4}")).toDF("grp", "key")
    val r = Skew.keyDistributionReport(df, "grp", "key").collect()(0)
    assert(r.getAs[Long]("n_rows") == 20L)
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(math.abs(r.getAs[Double]("entropy") - math.log(4)) < 1e-12)
    assert(math.abs(r.getAs[Double]("hhi") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("top_share") - 0.25) < 1e-12)
  }

  test("degenerate distribution: zero entropy, hhi = 1, top_share = 1") {
    val df = (0 until 7).map(_ => ("g", "hot")).toDF("grp", "key")
    val r = Skew.keyDistributionReport(df, "grp", "key").collect()(0)
    assert(r.getAs[Long]("n_keys") == 1L)
    assert(math.abs(r.getAs[Double]("entropy")) < 1e-12)
    assert(math.abs(r.getAs[Double]("hhi") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("top_share") - 1.0) < 1e-12)
  }

  test("skewed distribution matches the direct -sum(p ln p) formula") {
    // counts 8, 1, 1 over 10 rows
    val df = ((0 until 8).map(_ => ("g", "a")) ++ Seq(("g", "b"), ("g", "c")))
      .toDF("grp", "key")
    val r = Skew.keyDistributionReport(df, "grp", "key").collect()(0)
    val ps = Seq(0.8, 0.1, 0.1)
    val expEntropy = -ps.map(p => p * math.log(p)).sum
    assert(math.abs(r.getAs[Double]("entropy") - expEntropy) < 1e-12)
    assert(math.abs(r.getAs[Double]("hhi") - ps.map(p => p * p).sum) < 1e-12)
    assert(math.abs(r.getAs[Double]("top_share") - 0.8) < 1e-12)
  }

  test("groups are independent") {
    val df = ((0 until 5).map(_ => ("x", "k")) ++ (0 until 4).map(i => ("y", s"k$i")))
      .toDF("grp", "key")
    val rows = Skew.keyDistributionReport(df, "grp", "key")
      .orderBy("grp").collect()
    assert(rows(0).getAs[Double]("hhi") == 1.0)
    assert(math.abs(rows(1).getAs[Double]("hhi") - 0.25) < 1e-12)
  }
}
