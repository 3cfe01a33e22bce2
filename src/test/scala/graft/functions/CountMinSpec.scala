package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val toks = spark.read
    .parquet(s"${TestSpark.Sf}/documents.parquet")
    .filter(trim(col("text")) =!= "")
    .select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    .cache()

  private lazy val exact =
    toks.groupBy(col("w")).agg(count(lit(1)).as("exact")).cache()

  test("one-sided guarantee: est >= exact for EVERY token, even at tiny width") {
    val sk = CountMin.sketch(toks, col("w"), depth = 4, width = 64)
    val under = CountMin.estimate(sk, exact, "w", depth = 4, width = 64)
      .filter(col("est") < col("exact"))
    assert(under.isEmpty)
  }

  test("collision-free width recovers exact counts") {
    val sk = CountMin.sketch(toks, col("w"), depth = 4, width = 1 << 20)
    val mismatched = CountMin.estimate(sk, exact, "w", depth = 4, width = 1 << 20)
      .filter(col("est") =!= col("exact"))
    assert(mismatched.isEmpty)
  }

  test("sketch table never exceeds depth x width rows") {
    val sk = CountMin.sketch(toks, col("w"), depth = 3, width = 32)
    assert(sk.count() <= 3L * 32)
  }

  test("merge of per-shard sketches equals the whole-corpus sketch") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .filter(trim(col("text")) =!= "")
    def tk(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
    val a = CountMin.sketch(tk(docs.filter(col("doc_id") % 2 === 0)), col("w"), 4, 256)
    val b = CountMin.sketch(tk(docs.filter(col("doc_id") % 2 =!= 0)), col("w"), 4, 256)
    val merged = CountMin.merge(a, b).withColumnRenamed("cnt", "cnt_m")
    val whole = CountMin.sketch(tk(docs), col("w"), 4, 256)
      .withColumnRenamed("cnt", "cnt_w")
    assert(merged.join(whole, Seq("d", "bucket"), "full_outer")
      .filter(!(col("cnt_m") <=> col("cnt_w"))).isEmpty)
  }

  test("estimate preserves input multiplicity: duplicate probe rows each keep a row") {
    val sk = CountMin.sketch(toks, col("w"), depth = 4, width = 256)
    val dupProbes = Seq("the", "the", "the", "zz-never-seen").toDF("w")
    val out = CountMin.estimate(sk, dupProbes, "w", depth = 4, width = 256)
    assert(out.count() === 4L)
    assert(out.filter(col("w") === "the").count() === 3L)
  }

  test("unseen items estimate to 0 at collision-free width") {
    val sk = CountMin.sketch(toks, col("w"), depth = 4, width = 1 << 20)
    val ghosts = Seq("zz-never-seen-1", "zz-never-seen-2").toDF("w")
    val ests = CountMin.estimate(sk, ghosts, "w", depth = 4, width = 1 << 20)
      .select("est").as[Long].collect()
    assert(ests.forall(_ == 0L))
  }
}
