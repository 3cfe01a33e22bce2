package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AdaptiveHist: the one-pass unknown-range dyadic histogram. The
  * load-bearing property is DETERMINISM — the drained cells must equal the
  * closed form (scale = smallest s with span ≤ maxBins over the global
  * min/max; cells = floor(x/2^scale) counts) regardless of partitioning,
  * insertion order, or merge shape — that is what makes it oracle-checkable
  * where KLL's randomized compaction is not.
  */
class AdaptiveHistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Closed-form reference: (scale, Map(bin -> cnt)). */
  private def reference(xs: Seq[Double], maxBins: Int, minScale: Int): (Int, Map[Long, Long]) = {
    var s = minScale
    def bin(x: Double, sc: Int): Long = math.floor(x * math.pow(2.0, -sc)).toLong
    while (bin(xs.max, s) - bin(xs.min, s) >= maxBins) s += 1
    (s, xs.groupBy(bin(_, s)).map { case (b, v) => b -> v.size.toLong })
  }

  private def got(df: DataFrame, maxBins: Int, minScale: Int): (Int, Map[Long, Long]) = {
    val rows = AdaptiveHist.cells(df, col("x"), maxBins, Nil, minScale).collect()
    val scales = rows.map(_.getAs[Int]("scale")).distinct
    assert(scales.length == 1, s"mixed scales in one group: ${scales.toSeq}")
    (scales.head, rows.map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cnt")).toMap)
  }

  test("cells equal the closed form, across partitionings (merge determinism)") {
    val rnd = new scala.util.Random(19)
    // wide span (forces several escalations past 64 bins) incl. negatives
    val xs = Seq.fill(5000)(rnd.nextDouble() * 4000 - 1000) ++
      Seq(-999.99, 3999.99, 0.0, 0.5)
    val want = reference(xs, 64, 0)
    Seq(1, 7, 32).foreach { parts =>
      val df = spark.createDataset(xs).repartition(parts).toDF("x")
      assert(got(df, 64, 0) == want, s"parts=$parts diverged from the closed form")
    }
  }

  test("tight data stays at minScale; fractional resolution via negative minScale") {
    // span < maxBins at s = -3 (width 1/8): no escalation
    val xs = Seq(0.1, 0.2, 0.3, 1.9, 2.0, 2.05)
    val (s, cells) = got(spark.createDataset(xs).toDF("x"), 64, -3)
    assert(s == -3)
    assert(cells == reference(xs, 64, -3)._2)
    // the finer scale actually separates values a width-1 bin would merge
    assert(cells.keySet.size >= 4)
  }

  test("per-group scales are independent") {
    val df = Seq(
      ("narrow", 1.0), ("narrow", 2.0), ("narrow", 3.0),
      ("wide", 0.0), ("wide", 100000.0)).toDF("g", "x")
    val cells = AdaptiveHist.cells(df, col("x"), 8, Seq("g"))
      .collect().map(r => (r.getString(0), r.getAs[Int]("scale"))).distinct.toMap
    assert(cells("narrow") == 0)
    // 100000 needs span/8 fit: smallest s with floor(1e5/2^s) < 8 -> 2^s > 12500 -> s = 14
    assert(cells("wide") == 14)
  }

  test("cell count never exceeds maxBins; counts sum to n") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(20000)(math.exp(rnd.nextGaussian() * 5)) // 10 orders of magnitude
    val (s, cells) = got(spark.createDataset(xs).toDF("x"), 32, 0)
    assert(cells.size <= 32, s"${cells.size} cells at scale $s")
    assert(cells.values.sum == xs.size)
    assert(cells.keySet.max - cells.keySet.min < 32)
  }

  test("property: closed form holds over 100 random shapes " +
      "(tiny maxBins forces mid-stream compaction escalation; adversarial orderings)") {
    val rnd = new scala.util.Random(1009)
    (1 to 100).foreach { trial =>
      val n = 50 + rnd.nextInt(550)
      val maxBins = 2 + rnd.nextInt(7) // cap 4..16 — compacts every few rows
      val minScale = rnd.nextInt(4) - 2
      val span = math.pow(10.0, 1 + rnd.nextInt(5)) // 10 .. 1e5
      val body = Seq.fill(n)(rnd.nextDouble() * span - span / 2)
      // outliers widen the span late (or early) so escalation happens
      // mid-stream, after many fine-scale bins are already buffered
      val outliers = Seq(span * 4, -span * 4)
      val xs = rnd.nextInt(3) match {
        case 0 => outliers ++ body            // escalate immediately
        case 1 => body ++ outliers            // escalate at the very end
        case _ => rnd.shuffle(body ++ outliers)
      }
      val ordered = rnd.nextInt(3) match {
        case 0 => xs.sorted
        case 1 => xs.sorted.reverse
        case _ => xs
      }
      val parts = 1 + rnd.nextInt(32)
      val want = reference(ordered, maxBins, minScale)
      val df = spark.createDataset(ordered).repartition(parts).toDF("x")
      val have = got(df, maxBins, minScale)
      assert(have == want,
        s"trial=$trial n=$n maxBins=$maxBins minScale=$minScale parts=$parts diverged")
    }
  }

  test("quantile read-off: within one final bin width of the exact quantile; " +
      "p50 equals the inline q251 formula") {
    val rnd = new scala.util.Random(29)
    val xs = Seq.fill(4000)(rnd.nextDouble() * 3000 - 500)
    val df = spark.createDataset(xs).repartition(8).toDF("x")
    val bufs = AdaptiveHist.bufs(df, col("x"), 64)
    val (scale, _) = got(df, 64, 0)
    val w = math.pow(2.0, scale)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = AdaptiveHist.quantiles(bufs, qs)
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    assert(est.keySet == qs.toSet)
    val sorted = xs.sorted
    qs.foreach { q =>
      val exact = sorted(math.ceil(q * xs.size).toInt - 1)
      assert(math.abs(est(q) - exact) <= w,
        s"q=$q est=${est(q)} exact=$exact w=$w")
    }
    // n rides along and equals the input count
    val n = AdaptiveHist.quantiles(bufs, Seq(0.5)).collect().head.getAs[Long]("n")
    assert(n == xs.size)
  }

  test("NaN fails loud; NULLs are skipped") {
    val okDf = Seq(Some(1.0), None, Some(2.0)).toDF("x")
    val (_, cells) = got(okDf, 16, 0)
    assert(cells.values.sum == 2L)
    val ex = intercept[Exception] {
      AdaptiveHist.cells(Seq(1.0, Double.NaN).toDF("x"), col("x"), 16).collect()
    }
    assert(ex.getMessage != null)
  }
}
