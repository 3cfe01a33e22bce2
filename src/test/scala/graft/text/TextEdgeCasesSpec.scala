package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Null / empty / non-BMP inputs through the round-5 text operators — the
  * synthetic corpora contain none of these, so the paths would otherwise
  * ride unexercised into real data.
  */
class TextEdgeCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val messy = Seq(
    (1L, "the cat sat"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   "),
    (5L, "the 🦀 sat"), // non-BMP code point (surrogate pair)
    (6L, "solo")
  ).toDF("doc_id", "text")

  test("LanguageModel: null/empty/single-token docs drop; non-BMP doc scores") {
    val out = LanguageModel
      .bigramCrossEntropy(messy, messy, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 5L))
  }

  test("Dsir: null/empty docs drop from weights; others get finite weights") {
    val w = Dsir
      .importanceWeights(messy, messy.filter(col("doc_id") === 1L), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(1L, 5L, 6L))
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("SpanDedup: null text is excluded like empty text") {
    val out = SpanDedup.dedupSpans(messy, "doc_id", "text", w = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 5L, 6L))
  }

  test("CountMin: null items hash to null buckets and never corrupt cells") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("w")
    val sk = graft.functions.CountMin.sketch(df, col("w"), depth = 2, width = 16)
    // null items are filtered at the sketch boundary: 2 cells per non-null
    // instance, no NULL-bucket junk rows
    assert(sk.agg(sum("cnt")).head.getLong(0) == 6L)
    assert(sk.filter(col("bucket").isNull).isEmpty)
    val est = graft.functions.CountMin
      .estimate(sk, Seq("a", "b").toDF("w"), "w", depth = 2, width = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 2L && est("b") >= 1L)
  }

  test("Bpe: learnMerges on a corpus with nulls/non-BMP doesn't emit lone surrogates") {
    val merges = Bpe.learnMerges(messy, "text", k = 3)
    merges.foreach { m =>
      Seq(m.left, m.right).foreach { s =>
        assert(!s.exists(c => Character.isSurrogate(c) && s.length == 1),
          s"lone surrogate in merge symbol: $s")
      }
    }
  }
}
