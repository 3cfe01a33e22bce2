package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Lo = 0.0
  private val Hi = 110000.0
  private val Bins = 2048
  private val W = (Hi - Lo) / Bins

  private lazy val li = spark.read
    .parquet(s"${TestSpark.Sf}/lineitem.parquet")
    .select(col("l_returnflag"), col("l_extendedprice"))
    .cache()

  test("cell table never exceeds `bins` rows per group") {
    val counts = QuantileSketch
      .cells(li, col("l_extendedprice"), Lo, Hi, Bins, Seq("l_returnflag"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("c"))
      .select(max(col("c"))).head().getLong(0)
    assert(counts <= Bins)
  }

  test("out-of-range values clamp into the edge bins") {
    val df = Seq(-5.0, -1e9, 0.0, 109999.9, 110000.0, 1e12).toDF("x")
    val bins = QuantileSketch.cells(df, col("x"), Lo, Hi, Bins)
      .select(col("bin")).as[Long].collect().toSet
    assert(bins.min == 0L && bins.max == (Bins - 1).toLong)
  }

  test("per-shard cell tables merge to exactly the whole-data cells") {
    val a = QuantileSketch.cells(li.filter(col("l_extendedprice") < 50000),
      col("l_extendedprice"), Lo, Hi, Bins, Seq("l_returnflag"))
    val b = QuantileSketch.cells(li.filter(col("l_extendedprice") >= 50000),
      col("l_extendedprice"), Lo, Hi, Bins, Seq("l_returnflag"))
    val merged = QuantileSketch.merge(a, b, Seq("l_returnflag"))
      .withColumnRenamed("cnt", "cnt_m")
    val whole = QuantileSketch
      .cells(li, col("l_extendedprice"), Lo, Hi, Bins, Seq("l_returnflag"))
      .withColumnRenamed("cnt", "cnt_w")
    assert(merged.join(whole, Seq("l_returnflag", "bin"), "full_outer")
      .filter(!(col("cnt_m") <=> col("cnt_w"))).isEmpty)
  }

  test("probeRange picks a clamp-free dyadic range (the adaptive form)") {
    // lo <= min and hi > max by construction, so the UN-clamped bin formula
    // floor((x - lo)/w) already lands in [0, bins) for every value — the
    // edge-bin clamp never fires, removing the fixed-range form's one
    // accuracy degradation; with power-of-two bins the width is the exact
    // dyadic (hi - lo) / 2^11 the oracle discipline requires
    val (lo, hi) = QuantileSketch.probeRange(li, col("l_extendedprice"))
    assert(lo == math.floor(lo) && hi == math.floor(hi), "endpoints must be integers")
    val mn = li.agg(min(col("l_extendedprice"))).head().getDouble(0)
    val mx = li.agg(max(col("l_extendedprice"))).head().getDouble(0)
    assert(lo <= mn && hi > mx, s"[$lo, $hi) must cover [$mn, $mx]")
    val w = (hi - lo) / Bins
    // every raw (un-clamped) bin id in range — the clamp-free guarantee
    val raw = li.where(col("l_extendedprice").isNotNull)
      .select(floor((col("l_extendedprice") - lit(lo)) / lit(w)).as("b"))
      .agg(min(col("b")), max(col("b"))).head()
    assert(raw.getLong(0) >= 0L && raw.getLong(1) < Bins.toLong,
      s"raw bins [${raw.getLong(0)}, ${raw.getLong(1)}] escaped [0, $Bins)")
    // the width is exactly representable: span is an integer and bins a
    // power of two, so w * bins reconstructs the span bit-for-bit
    assert(w * Bins == hi - lo)
    // and the probed range feeds the standard machinery unchanged
    val cells = QuantileSketch
      .cells(li, col("l_extendedprice"), lo, hi, Bins, Seq("l_returnflag"))
    val est = QuantileSketch
      .quantiles(cells, Seq(0.5), lo, hi, Bins, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("est")).as[(String, Double)].collect().toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (f, m) =>
      assert(math.abs(est(f) - m) <= 2 * w, s"$f: ${est(f)} vs $m")
    }
  }

  test("probeRange fails loud on all-NULL input") {
    val df = Seq[Option[Double]](None, None).toDF("x")
    val ex = intercept[IllegalArgumentException] {
      QuantileSketch.probeRange(df, col("x"))
    }
    assert(ex.getMessage.contains("probeRange"))
  }

  test("estimates land within two bin widths of the exact percentile") {
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val cells = QuantileSketch
      .cells(li, col("l_extendedprice"), Lo, Hi, Bins, Seq("l_returnflag"))
    val est = QuantileSketch
      .quantiles(cells, qs, Lo, Hi, Bins, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("q"), col("est"))
      .as[(String, Double, Double)].collect()
      .map { case (f, q, e) => (f, q) -> e }.toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), array(qs.map(lit): _*)).as("evs"))
      .select(col("l_returnflag"), posexplode(col("evs")).as(Seq("i", "ev")))
      .as[(String, Int, Double)].collect()
      .map { case (f, i, ev) => (f, qs(i)) -> ev }.toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ev) =>
      // the sketch interpolates inside the bin holding rank q·N; the exact
      // type-7 percentile interpolates between ranks (N−1)q+1 and +2 — the
      // targets differ by < 1 rank, so the exact value lives in the hit bin
      // or its neighbor: the gap is bounded by two bin widths
      assert(math.abs(est(k) - ev) <= 2 * W,
        s"$k: sketch ${est(k)} vs exact $ev exceeds two bin widths ${2 * W}")
    }
  }

  test("estimates are monotone in q and bounded by the declared range") {
    val qs = (1 to 20).map(_ / 20.0)
    val cells = QuantileSketch.cells(li, col("l_extendedprice"), Lo, Hi, Bins)
    val est = QuantileSketch.quantiles(cells, qs, Lo, Hi, Bins)
      .orderBy(col("q")).select(col("est")).as[Double].collect()
    assert(est.length == qs.length)
    assert(est.zip(est.tail).forall { case (a, b) => a <= b }, "not monotone")
    assert(est.forall(e => e >= Lo && e <= Hi))
  }

  test("NULL values are skipped and n counts only the rest") {
    val df = Seq(Some(10.0), None, Some(20.0), None).toDF("x")
    val cells = QuantileSketch.cells(df, col("x"), 0.0, 32.0, 16)
    assert(cells.agg(sum(col("cnt"))).head().getLong(0) == 2L)
    val n = QuantileSketch.quantiles(cells, Seq(0.5), 0.0, 32.0, 16)
      .select(col("n")).head().getLong(0)
    assert(n == 2L)
  }

  test("q=1 resolves to the upper edge of the last occupied bin") {
    val df = Seq(3.0, 5.0, 7.9).toDF("x") // bins of width 2 over [0, 16)
    val cells = QuantileSketch.cells(df, col("x"), 0.0, 16.0, 8)
    val est = QuantileSketch.quantiles(cells, Seq(1.0), 0.0, 16.0, 8)
      .select(col("est")).head().getDouble(0)
    assert(est == 8.0) // 7.9 lives in [6, 8); rank N interpolates to its top
  }

  test("invalid parameters fail loud") {
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException](QuantileSketch.cells(df, col("x"), 5.0, 5.0, 8))
    intercept[IllegalArgumentException](QuantileSketch.cells(df, col("x"), 0.0, 1.0, 0))
    val cells = QuantileSketch.cells(df, col("x"), 0.0, 1.0, 8)
    intercept[IllegalArgumentException](
      QuantileSketch.quantiles(cells, Seq(0.0), 0.0, 1.0, 8))
    intercept[IllegalArgumentException](
      QuantileSketch.quantiles(cells, Seq(1.5), 0.0, 1.0, 8))
  }
}
