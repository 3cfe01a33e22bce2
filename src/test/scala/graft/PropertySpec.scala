package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Reshape, WindowOps}

/** Property-based invariants (SURVEY.md §5.2-4): dedup idempotence,
  * pivot∘unpivot round-trip, window algebraic identities. Plain scalacheck
  * generators sampled with fixed seeds (scalatestplus bridge not available
  * in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c")
      seq <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (k, seq, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("keepLast is idempotent and returns one row per key") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val once = Dedup.keepLast(df, Seq("k"), Seq(col("seq"), col("v")))
      val twice = Dedup.keepLast(once, Seq("k"), Seq(col("seq"), col("v")))
      assert(once.count() == rows.map(_._1).distinct.size)
      assert(once.orderBy("k", "seq", "v").collect().toSeq ==
        twice.orderBy("k", "seq", "v").collect().toSeq)
    }
  }

  test("pivot then unpivot round-trips the aggregated values") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "seq", "v").withColumn("g", col("seq") % 3)
      val agg = df.groupBy("g", "k").agg(sum("v").as("v")) // ground truth
      val piv = Reshape.pivotAgg(df, "g", "k", Seq("a", "b", "c"), sum(col("v")))
      val unp = Reshape.unpivot(piv, "g", Seq("a", "b", "c"), "k", "v")
        .filter(col("v").isNotNull)
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("g", "k").collect()
          .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 1e6))).toSeq
      assert(canon(agg) == canon(unp))
    }
  }

  test("laggedDiff equals difference of lag features") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0)), 5).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "x")
      val w = WindowOps.spec(Seq.empty, Seq(col("t")))
      val viaDiff = WindowOps.laggedDiff(df, w, "x", 2)
      val viaLags = WindowOps.lagFeatures(df, w, Seq("x"), Seq(1, 3))
        .withColumn("expect", col("x_lag1") - col("x_lag3"))
      val joined = viaDiff.join(viaLags.select("t", "expect"), "t")
      val bad = joined.filter(
        (col("x_diff2").isNotNull || col("expect").isNotNull) &&
          (col("x_diff2").isNull || col("expect").isNull ||
            abs(col("x_diff2") - col("expect")) > 1e-12)).count()
      assert(bad == 0)
    }
  }
}
