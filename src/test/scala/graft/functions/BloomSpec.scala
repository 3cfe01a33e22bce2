package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom cell table: the load-bearing properties are ONE-SIDEDNESS (a
  * member is NEVER negative — that is what lets callers build exact
  * results on top) and MERGE = whole-data build (bitwise OR is
  * associative/commutative/idempotent), plus the bounded state the
  * streaming form relies on.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def items(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => rnd.alphanumeric.take(3 + rnd.nextInt(10)).mkString)
  }

  test("no false negatives: every member is bloom-positive, at every m/k") {
    val members = items(3, 500).distinct
    val df = members.toDF("g")
    for { m <- Seq(64, 1 << 10, 1 << 15); k <- Seq(1, 3, 7) } {
      val cells = Bloom.cells(df, col("g"), m, k)
      val pos = Bloom.positiveItems(cells, df, "g", m, k)
        .as[String].collect().toSet
      assert(pos == members.toSet, s"m=$m k=$k dropped ${members.toSet -- pos}")
    }
  }

  test("false positives exist at a tiny m and are controlled at a sized m") {
    val members = items(7, 300).distinct
    val nonMembers = items(11, 2000).distinct.filterNot(members.toSet)
    val cells64 = Bloom.cells(members.toDF("g"), col("g"), 64, 3)
    val fpTiny = Bloom.positiveItems(cells64, nonMembers.toDF("g"), "g", 64, 3).count()
    assert(fpTiny > 0, "a 64-bit filter over 300 items must saturate")
    // sized by the rule callers should use: sizeFor(n, target) — 0.5%
    // design fpr; allow generous slack over the theoretical rate
    val (m, k) = Bloom.sizeFor(members.size.toLong, 0.005)
    val cells = Bloom.cells(members.toDF("g"), col("g"), m, k)
    val fp = Bloom.positiveItems(cells, nonMembers.toDF("g"), "g", m, k).count()
    assert(fp < nonMembers.size * 0.05, s"fpr ${fp.toDouble / nonMembers.size}")
  }

  test("merge of random slices equals the whole-data build, any shape") {
    val all = items(13, 800)
    val rnd = new scala.util.Random(17)
    val m = 1 << 12
    val whole = Bloom.cells(all.toDF("g"), col("g"), m, 4)
      .as[(Int, Long)].collect().toSet
    (1 to 5).foreach { trial =>
      val cut1 = rnd.nextInt(all.size)
      val cut2 = cut1 + rnd.nextInt(all.size - cut1)
      val (a, b, c) =
        (all.take(cut1), all.slice(cut1, cut2), all.drop(cut2))
      val merged = Bloom.merge(
        Bloom.merge(
          Bloom.cells(a.toDF("g"), col("g"), m, 4),
          Bloom.cells(b.toDF("g"), col("g"), m, 4)),
        Bloom.cells(c.toDF("g"), col("g"), m, 4))
      assert(merged.as[(Int, Long)].collect().toSet == whole, s"trial $trial")
    }
  }

  test("idempotence: re-merging a slice already absorbed changes nothing") {
    val all = items(19, 400)
    val m = 1 << 11
    val whole = Bloom.cells(all.toDF("g"), col("g"), m, 3)
    val again = Bloom.merge(whole, Bloom.cells(all.take(100).toDF("g"), col("g"), m, 3))
    assert(again.as[(Int, Long)].collect().toSet
      == whole.as[(Int, Long)].collect().toSet)
  }

  test("grouped cells: membership is per-group independent") {
    val df = Seq(("en", "alpha"), ("en", "beta"), ("zh", "gamma")).toDF("lang", "g")
    val m = 1 << 10
    val cells = Bloom.cells(df, col("g"), m, 3, Seq("lang"))
    val probes = Seq(
      ("en", "alpha"), ("en", "gamma"), ("zh", "gamma"), ("zh", "alpha"))
      .toDF("lang", "g")
    val pos = Bloom.positiveItems(cells, probes, "g", m, 3, Seq("lang"))
      .as[(String, String)].collect().toSet
    assert(pos.contains(("en", "alpha")) && pos.contains(("zh", "gamma")))
    assert(!pos.contains(("en", "gamma")) && !pos.contains(("zh", "alpha")))
  }

  test("state bound: cell rows never exceed ceil(m/32) (the streaming budget)") {
    val m = 256
    val cells = Bloom.cells(items(23, 5000).toDF("g"), col("g"), m, 7)
    assert(cells.count() <= (m + 31) / 32)
    // every word index within range, every mask within the 32-bit slice
    val bad = cells.where(col("word") < 0 || col("word") >= (m + 31) / 32
      || col("bits") < 0 || col("bits") >= (1L << 32)).count()
    assert(bad == 0)
  }

  test("parameter validation fails loud") {
    val df = Seq("x").toDF("g")
    intercept[IllegalArgumentException] { Bloom.cells(df, col("g"), 16, 3) }
    intercept[IllegalArgumentException] { Bloom.cells(df, col("g"), 1024, 0) }
    intercept[IllegalArgumentException] {
      Bloom.positiveItems(Seq((1, 2L)).toDF("w", "b"), df, "g", 1024, 3)
    }
  }

  test("sizeFor pins the textbook rule's outputs") {
    // m = ceil(-n ln p / (ln 2)^2), k = round(m/n ln 2) — hand-computed
    assert(Bloom.sizeFor(1000L, 0.01) == (9586, 7))
    assert(Bloom.sizeFor(1L, 0.25) == (32, 22)) // m floors at one word
    // the sized filter actually delivers ~the target rate:
    // fpr ≈ (1 - e^(-kn/m))^k within 25% of p
    val (m, k) = Bloom.sizeFor(1000L, 0.01)
    val fpr = math.pow(1.0 - math.exp(-k.toDouble * 1000.0 / m), k)
    assert(fpr < 0.0125 && fpr > 0.008, s"fpr $fpr")
    intercept[IllegalArgumentException] { Bloom.sizeFor(0L, 0.01) }
    intercept[IllegalArgumentException] { Bloom.sizeFor(100L, 0.5) }
    // the optimal m for 10^10 items at 1e-3 overflows Int — fail loud
    intercept[IllegalArgumentException] { Bloom.sizeFor(10_000_000_000L, 0.001) }
  }

  test("saturationReport: OR-merge growth trips the monitor while membership stays exact") {
    val m = 1 << 10
    val k = 4
    val first = items(29, 40).distinct
    val sized = Bloom.cells(first.toDF("g"), col("g"), m, k)
    val r1 = Bloom.saturationReport(sized, m, k)
      .select("set_bits", "fill_ratio", "effective_fpp", "recommend_rebuild")
      .as[(Long, Double, Double, Boolean)].collect().head
    assert(!r1._4, s"a sized filter must not trip: $r1")
    // set_bits consistency: <= k * n and > 0; fpp = fill^k exactly
    assert(r1._1 > 0 && r1._1 <= k.toLong * first.size)
    assert(math.abs(r1._3 - math.pow(r1._2, k)) < 1e-15)
    // grow the SAME stored filter way past its sizing by OR-merges
    var grown = sized
    (1 to 8).foreach { s =>
      grown = Bloom.merge(grown,
        Bloom.cells(items(100 + s, 400).toDF("g"), col("g"), m, k))
    }
    val r2 = Bloom.saturationReport(grown, m, k)
      .select("effective_fpp", "recommend_rebuild")
      .as[(Double, Boolean)].collect().head
    assert(r2._2 && r2._1 > 0.02, s"a 3200-item filter in 1024 bits must trip: $r2")
    // one-sidedness survives saturation: every absorbed item still positive
    val allIn = (first ++ (1 to 8).flatMap(s => items(100 + s, 400))).distinct
    val pos = Bloom.positiveItems(grown, allIn.toDF("g"), "g", m, k).count()
    assert(pos == allIn.size.toLong)
    // an empty cell table reads zero fill and never trips
    val r0 = Bloom.saturationReport(sized.limit(0), m, k)
      .select("set_bits", "recommend_rebuild").as[(Long, Boolean)].collect().head
    assert(r0 == ((0L, false)))
    intercept[IllegalArgumentException] { Bloom.saturationReport(sized, m, k, maxFpp = 0.0) }
    intercept[IllegalArgumentException] {
      Bloom.saturationReport(sized, m, k, groupCols = Seq("fill_ratio"))
    }
  }

  test("saturationReport fails loud when the cells were built at a larger m") {
    // cells at m=2048 carry word indices up to 63; a report read at m=1024
    // (expecting words < 32) would otherwise return fill_ratio > 1 and a
    // meaningless effective_fpp — the in-plan guard throws at action time
    val big = Bloom.cells(items(31, 600).toDF("g"), col("g"), 2048, 4)
    val e = intercept[Exception] {
      Bloom.saturationReport(big, 1024, 4).collect()
    }
    assert(e.getMessage.contains("word indices") ||
      Option(e.getCause).exists(_.getMessage.contains("word indices")),
      s"unexpected failure: $e")
    // cells genuinely at m=1024 pass the guard untouched
    val ok = Bloom.cells(items(31, 600).toDF("g"), col("g"), 1024, 4)
    assert(Bloom.saturationReport(ok, 1024, 4).count() == 1)
  }
}
