package graft.ml

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DeterministicSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1L to 200L).map(i => (s"g${i % 3}", i)).toDF("g", "id")

  test("sample equals the row_number-over-hash reference ranking") {
    val got = Features.deterministicSample(df, "g", "id", 5)
      .orderBy("g", "rank")
      .as[(String, Int, Long)].collect().toSeq
    val h = pmod(col("id") * lit(2654435761L), lit(4294967296L))
    val exp = df
      .withColumn("rank", row_number().over(Window.partitionBy("g").orderBy(h, col("id"))))
      .filter(col("rank") <= 5)
      .orderBy("g", "rank")
      .select(col("g"), col("rank"), col("id"))
      .as[(String, Int, Long)].collect().toSeq
    assert(got == exp)
    assert(got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("selection is independent of partition layout") {
    val a = Features.deterministicSample(df.repartition(1), "g", "id", 7)
      .orderBy("g", "rank").collect().toSeq
    val b = Features.deterministicSample(df.repartition(13, col("id")), "g", "id", 7)
      .orderBy("g", "rank").collect().toSeq
    assert(a == b)
  }

  test("groups smaller than n return the whole group, ranked") {
    val tiny = Seq(("x", 1L), ("x", 2L), ("y", 3L)).toDF("g", "id")
    val got = Features.deterministicSample(tiny, "g", "id", 10)
      .orderBy("g", "rank").as[(String, Int, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("x", "x", "y"))
    assert(got.map(_._2) == Seq(1, 2, 1))
  }

  test("weightedSample picks proportionally to weight (A-ES, n=1 exact law)") {
    // 2000 groups, each with two candidates: weight 3 vs weight 1 ->
    // P(heavy wins) = 3/4 exactly under A-ES with a uniform u
    val df = (0 until 2000).flatMap { g =>
      Seq((s"g$g", g * 2L + 1, 3.0), (s"g$g", g * 2L + 2, 1.0))
    }.toDF("g", "id", "w")
    val picked = Features.weightedSample(df, "g", "id", "w", 1)
    val heavyWins = picked.filter($"id" % 2 === 1).count().toDouble
    val share = heavyWins / 2000.0
    // binomial(2000, 0.75) std ~ 0.0097; allow 4 sigma
    assert(math.abs(share - 0.75) < 0.04, s"heavy share $share, expected ~0.75")
  }

  test("weightedSample is deterministic and excludes non-positive weights") {
    val df = Seq(
      ("a", 1L, 2.0), ("a", 2L, 1.0), ("a", 3L, 0.0), ("a", 4L, -1.0)
    ).toDF("g", "id", "w")
    val a = Features.weightedSample(df, "g", "id", "w", 10)
      .orderBy("rank").as[(String, Int, Long)].collect().toSeq
    val b = Features.weightedSample(df.repartition(7), "g", "id", "w", 10)
      .orderBy("rank").as[(String, Int, Long)].collect().toSeq
    assert(a == b)
    assert(a.map(_._3).toSet == Set(1L, 2L)) // zero/negative weights excluded
  }
}
