package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val log2 = (x: Double) => math.log(x) / math.log(2.0)

  test("hand-computed add-alpha bigram cross-entropy") {
    // train bigrams: (a,b)×2, (a,c)×1 ⇒ ctx(a)=3; vocab {a,b,c} ⇒ V=4
    val train = Seq("a b", "a b", "a c").toDF("text")
    val score = Seq(
      (1L, "a b"), // P(b|a) = 2.1/3.4
      (2L, "a d"), // unseen continuation: 0.1/3.4
      (3L, "z q") // unseen context: 0.1/(0.1·4) = 0.25 ⇒ CE = 2 bits exactly
    ).toDF("doc_id", "text")
    val out = LanguageModel
      .bigramCrossEntropy(train, score, "doc_id", "text", alpha = 0.1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - -log2(2.1 / 3.4)) < 1e-12)
    assert(math.abs(out(2L)._2 - -log2(0.1 / 3.4)) < 1e-12)
    assert(math.abs(out(3L)._2 - 2.0) < 1e-12)
  }

  test("docs with fewer than 2 tokens are dropped from scoring") {
    val train = Seq("a b").toDF("text")
    val score = Seq((1L, "a b"), (2L, "a"), (3L, "  "), (4L, "")).toDF("doc_id", "text")
    val ids = LanguageModel
      .bigramCrossEntropy(train, score, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("a doc matching the train distribution scores below an off-distribution doc") {
    val train = Seq.fill(20)("the cat sat on the mat").toDF("text")
    val score = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zq xv qwerty uiop zzz")).toDF("doc_id", "text")
    val ce = LanguageModel
      .bigramCrossEntropy(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ce(1L) < ce(2L))
  }

  test("ccnetBuckets: exact terciles by ascending cross-entropy") {
    val scored = Seq(
      (1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0), (6L, 6.0))
      .toDF("doc_id", "ce")
    val buckets = LanguageModel
      .ccnetBuckets(scored, "doc_id", "ce")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(buckets == Map(
      1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"))
  }

  test("smoothed conditional sums to 1 over vocab + unseen slot") {
    // P(·|a) over {a,b,c} plus one unseen slot must total 1 exactly:
    // (2+α)/(3+4α) + (1+α)/(3+4α) + α/(3+4α) + α/(3+4α) = (3+4α)/(3+4α)
    val alpha = 0.1
    val mass = (2 + alpha) + (1 + alpha) + alpha + alpha
    assert(math.abs(mass / (3 + 4 * alpha) - 1.0) < 1e-15)
  }
}
