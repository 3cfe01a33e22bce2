package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Misra–Gries sketch guarantees and the exact sketch→prune→recount path. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skew over a vocabulary far larger than the sketch: item k
    * appears ~N/k times. Deterministic (no RNG).
    */
  private lazy val skewed = {
    val rows = (1 to 400).flatMap(k => Seq.fill(2000 / k)(s"item_$k"))
    rows.toDF("item").repartition(13)
  }

  test("MG sketch: every phi-frequent item survives, estimates undercount <= n/(m+1)") {
    val m = 50
    val sketch = udaf(new MisraGries(m), Encoders.STRING)
    val got = skewed.agg(sketch(col("item"))).head().getMap[String, Long](0)
    val exact = skewed.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (m + 1)
    assert(got.size <= m)
    for ((item, cnt) <- exact if cnt > bound)
      assert(got.contains(item), s"$item has count $cnt > $bound but was evicted")
    for ((item, est) <- got) {
      val truth = exact(item)
      assert(est <= truth, s"$item overcounted: $est > $truth")
      assert(est >= truth - bound, s"$item undercounted past the bound: $est < $truth - $bound")
    }
  }

  test("frequentItems is exact and partitioning-invariant in the m < vocab regime") {
    val phi = 0.02 // m = 100 < 400 distinct items: the sketch must prune
    val exact = skewed.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val n = skewed.count()
    val want = exact.filter(col("cnt") >= math.ceil(phi * n).toLong)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(want.nonEmpty && want.size < 400, "fixture must have a non-trivial frequent set")
    for (parts <- Seq(3, 13)) {
      val got = HeavyHitters.frequentItems(skewed.repartition(parts), "item", phi)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"mismatch at $parts partitions")
    }
  }
}
