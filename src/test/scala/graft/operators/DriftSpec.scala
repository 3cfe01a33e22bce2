package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drift.psiByPeriod: the load-bearing properties are the closed form
  * (each psi equals the hand-computed Σ (p−q)·ln(p/q) with the eps floor),
  * zero on identical distributions, and the eps floor making
  * one-side-empty bins finite instead of ±∞.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eps = 1e-6

  private def handPsi(
      post: Map[Long, Long], ref: Map[Long, Long]): Double = {
    val tp = post.values.sum.toDouble
    val tr = ref.values.sum.toDouble
    (post.keySet ++ ref.keySet).toSeq.map { b =>
      val p = math.max(post.getOrElse(b, 0L) / tp, eps)
      val q = math.max(ref.getOrElse(b, 0L) / tr, eps)
      (p - q) * math.log(p / q)
    }.sum
  }

  test("psi equals the hand-computed closed form per period") {
    val cells = Seq(
      ("d1", 0L, 10L), ("d1", 1L, 30L), ("d1", 2L, 60L),
      ("d2", 0L, 50L), ("d2", 1L, 25L), ("d2", 3L, 25L))
      .toDF("day", "bin", "cnt")
    val ref = Seq((0L, 20L), (1L, 30L), (2L, 50L)).toDF("bin", "cnt")
    val got = Drift.psiByPeriod(cells, "day", ref)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w1 = handPsi(Map(0L -> 10L, 1L -> 30L, 2L -> 60L),
      Map(0L -> 20L, 1L -> 30L, 2L -> 50L))
    val w2 = handPsi(Map(0L -> 50L, 1L -> 25L, 3L -> 25L),
      Map(0L -> 20L, 1L -> 30L, 2L -> 50L))
    assert(math.abs(got("d1") - w1) < 1e-12 && math.abs(got("d2") - w2) < 1e-12)
    // d2 has a bin the reference lacks AND misses one it has — the eps
    // floor keeps both terms finite and positive-direction-correct
    assert(got("d2").isFinite && got("d2") > got("d1"))
  }

  test("identical distributions read psi = 0 exactly") {
    val cells = Seq(("d1", 0L, 40L), ("d1", 1L, 60L)).toDF("day", "bin", "cnt")
    val ref = Seq((0L, 80L), (1L, 120L)).toDF("bin", "cnt") // same proportions
    val got = Drift.psiByPeriod(cells, "day", ref).collect().head.getDouble(1)
    assert(got == 0.0)
  }

  test("parameter and schema validation fails loud") {
    val ok = Seq(("d", 0L, 1L)).toDF("day", "bin", "cnt")
    val ref = Seq((0L, 1L)).toDF("bin", "cnt")
    intercept[IllegalArgumentException] { Drift.psiByPeriod(ok, "day", ref, eps = 0.0) }
    intercept[IllegalArgumentException] {
      Drift.psiByPeriod(ok.withColumnRenamed("cnt", "n"), "day", ref)
    }
    // reserved working columns must not collide with input columns
    intercept[IllegalArgumentException] {
      Drift.psiByPeriod(ok.withColumn("_tr", lit(1)), "day", ref)
    }
    intercept[IllegalArgumentException] {
      Drift.psiByPeriod(ok.withColumnRenamed("day", "_tp"), "_tp", ref)
    }
  }

  test("an empty or all-null reference fails loud instead of scoring garbage") {
    val cells = Seq(("d1", 0L, 40L), ("d1", 1L, 60L)).toDF("day", "bin", "cnt")
    val emptyRef = Seq.empty[(Long, Long)].toDF("bin", "cnt")
    val e1 = intercept[Exception] {
      Drift.psiByPeriod(cells, "day", emptyRef).collect()
    }
    assert(e1.getMessage.contains("reference cells are empty") ||
      Option(e1.getCause).exists(_.getMessage.contains("reference cells are empty")))
    val nullRef = Seq((0L, null.asInstanceOf[java.lang.Long]))
      .toDF("bin", "cnt")
    val e2 = intercept[Exception] {
      Drift.psiByPeriod(cells, "day", nullRef).collect()
    }
    assert(e2.getMessage.contains("reference cells are empty") ||
      Option(e2.getCause).exists(_.getMessage.contains("reference cells are empty")))
  }
}
