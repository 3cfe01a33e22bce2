package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    ("big", 90.0), ("big", 90.0), // size 180
    ("mid", 45.0), // size 45
    ("small", 20.0) // size 20
  ).toDF("src", "n_tok")

  private def weights(alpha: Double): Map[String, Double] =
    Mixture.temperatureWeights(docs, "src", col("n_tok"), alpha)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("alpha=1 is proportional sampling") {
    val w = weights(1.0)
    val tot = 180.0 + 45.0 + 20.0
    assert(math.abs(w("big") - 180.0 / tot) < 1e-12)
    assert(math.abs(w("small") - 20.0 / tot) < 1e-12)
  }

  test("alpha=0 is uniform sampling") {
    val w = weights(0.0)
    w.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("weights always sum to 1 and intermediate temperature up-samples small sources") {
    val w = weights(0.5)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
    // sqrt scaling: small source's weight rises vs proportional, big falls
    assert(w("small") > 20.0 / 245.0)
    assert(w("big") < 180.0 / 245.0)
  }
}
