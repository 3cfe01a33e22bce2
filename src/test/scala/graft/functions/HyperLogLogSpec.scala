package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HyperLogLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val toks = spark.read
    .parquet(s"${TestSpark.Sf}/documents.parquet")
    .filter(trim(col("text")) =!= "")
    .select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    .cache()

  test("cell table never exceeds 2^p rows") {
    val sk = HyperLogLog.cells(toks, col("w"), p = 9)
    assert(sk.count() <= (1L << 9))
  }

  test("estimate lands within 3 sigma of the exact distinct count") {
    val p = 11 // m = 2048, sigma ~ 1.04/sqrt(m) ~ 2.3%
    val exact = toks.select(countDistinct(col("w"))).head().getLong(0).toDouble
    val est = HyperLogLog.estimate(HyperLogLog.cells(toks, col("w"), p), p)
      .head().getDouble(0)
    val bound = 3 * 1.04 / math.sqrt((1 << p).toDouble)
    assert(math.abs(est - exact) / exact <= bound,
      s"est $est vs exact $exact exceeds 3-sigma bound $bound")
  }

  test("per-shard sketches merge to exactly the whole-corpus sketch") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .filter(trim(col("text")) =!= "")
    def tk(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    val a = HyperLogLog.cells(tk(docs.filter(col("doc_id") % 2 === 0)), col("w"), 9)
    val b = HyperLogLog.cells(tk(docs.filter(col("doc_id") % 2 =!= 0)), col("w"), 9)
    val merged = HyperLogLog.merge(a, b).withColumnRenamed("r", "r_m")
    val whole = HyperLogLog.cells(tk(docs), col("w"), 9).withColumnRenamed("r", "r_w")
    assert(merged.join(whole, Seq("bucket"), "full_outer")
      .filter(!(col("r_m") <=> col("r_w"))).isEmpty)
  }

  test("small cardinalities hit the linear-counting regime and stay sharp") {
    val tiny = (1 to 1000).map(i => s"item_${i % 20}").toDF("w") // 20 distinct
    val est = HyperLogLog.estimate(HyperLogLog.cells(tiny, col("w"), 11), 11)
      .head().getDouble(0)
    assert(math.abs(est - 20.0) / 20.0 < 0.05, s"linear counting should be sharp, got $est")
  }

  test("empty input estimates 0, not null") {
    val empty = Seq.empty[String].toDF("w")
    val est = HyperLogLog.estimate(HyperLogLog.cells(empty, col("w"), 9), 9).head()
    assert(!est.isNullAt(0) && est.getDouble(0) == 0.0)
  }

  test("NULL items are skipped, matching count(distinct)") {
    val withNulls = Seq(Some("a"), None, Some("b"), None, Some("a")).toDF("w")
    val cells = HyperLogLog.cells(withNulls, col("w"), 9)
    assert(cells.agg(sum(lit(1))).head().getLong(0) == 2L) // a, b -> 2 non-empty cells
  }

  test("grouped estimate: one row per group, each near its exact count") {
    val grouped = (1 to 4000).map(i => (s"g${i % 2}", s"w${i % (if (i % 2 == 0) 300 else 700)}"))
      .toDF("g", "w")
    val est = HyperLogLog
      .estimate(HyperLogLog.cells(grouped, col("w"), 11, Seq("g")), 11, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = grouped.groupBy("g").agg(countDistinct("w").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, e) =>
      assert(math.abs(e - exact(g)) / exact(g) < 0.08, s"group $g: $e vs ${exact(g)}")
    }
  }
}
