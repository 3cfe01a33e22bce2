package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b b"), // repeated token counts once toward doc_freq
    (2L, "b c"),
    (3L, "b")
  ).toDF("doc_id", "text")

  test("postings are sorted, distinct per doc, with document frequency") {
    val out = InvertedIndex.postings(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a") == ((1L, Seq(1L))))
    assert(out("b") == ((3L, Seq(1L, 2L, 3L))))
    assert(out("c") == ((1L, Seq(2L))))
  }

  test("maxPostings truncates the sorted list but keeps the full doc_freq") {
    val out = InvertedIndex.postings(docs, "doc_id", "text", maxPostings = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(out("b") == ((3L, Seq(1L, 2L))))
  }

  test("bounded-heap path equals the unbounded path's truncated prefix on random corpora") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(8) + 1)("t" + rnd.nextInt(12)).mkString(" "))
    }.toDF("doc_id", "text")
    val k = 5
    val bounded = InvertedIndex.postings(corpus, "doc_id", "text", maxPostings = k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    val full = InvertedIndex.postings(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2).take(k)))).toMap
    assert(bounded == full)
  }
}
