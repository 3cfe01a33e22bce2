package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] =
    SpanDedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("first occurrence wins across documents; reconstruction keeps order") {
    val out = run(Seq(
      1L -> "a b c d",
      2L -> "c d e f",
      3L -> "a b"), w = 2)
    assert(out(1L) == ((2L, 2L, "a b c d")))
    // doc2 loses span "c d" (doc1 owned it first), keeps "e f"
    assert(out(2L) == ((2L, 1L, "e f")))
    // doc3's only span was claimed by doc1 — reconstructs to ""
    assert(out(3L) == ((1L, 0L, "")))
  }

  test("within-document repeats: earlier position wins") {
    val out = run(Seq(1L -> "x y x y x y"), w = 2)
    assert(out(1L) == ((3L, 1L, "x y")))
  }

  test("tail spans shorter than w participate as their own keys") {
    val out = run(Seq(1L -> "a b c", 2L -> "c"), w = 2)
    // doc1 spans: "a b", "c"; doc2's lone span "c" is a duplicate
    assert(out(1L) == ((2L, 2L, "a b c")))
    assert(out(2L) == ((1L, 0L, "")))
  }

  test("empty and whitespace-only docs are excluded") {
    val out = run(Seq(1L -> "a b", 2L -> "   ", 3L -> ""), w = 2)
    assert(out.keySet == Set(1L))
  }

  test("duplicate-free corpus is reconstructed byte-identically") {
    val docs = (1L to 40L).map(i => i -> s"u${i}a u${i}b u${i}c u${i}d u${i}e")
    val out = run(docs, w = 2)
    docs.foreach { case (id, text) =>
      val (spans, kept, clean) = out(id)
      assert(spans == 3L && kept == 3L && clean == text)
    }
  }

  test("kept span count equals the number of distinct spans corpus-wide") {
    val docs = (1L to 60L).map(i => i -> s"w${i % 7} w${i % 5} w${i % 3} w${i % 11}")
    val df = docs.toDF("doc_id", "text")
    val nDistinct = df
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .select(col("t")) // spans of w=1 are the tokens themselves
      .distinct()
      .count()
    val out = SpanDedup.dedupSpans(df, "doc_id", "text", w = 1)
    val totalKept = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    assert(totalKept == nDistinct)
  }
}
