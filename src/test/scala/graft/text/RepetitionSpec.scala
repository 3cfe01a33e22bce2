package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def byId(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getLong(0) -> r).toMap

  test("metrics match hand-computed values on degenerate and clean docs") {
    val docs = Seq(
      (1L, "a a a a"), // 4 tokens, 1 distinct; bigrams: "a a" x3 -> top 1.0, dup 1.0
      (2L, "a b c d"), // all distinct; 3 distinct bigrams -> top 1/3, dup 0
      (3L, "a b a b a") // 5 tok, 2 distinct; bigrams a-b x2, b-a x2 -> top 0.5, dup 1.0
    ).toDF("doc_id", "text")
    val m = byId(Repetition.metrics(docs, "doc_id", "text").collect())
    assert(m(1L).getInt(1) == 4)
    assert(m(1L).getDouble(2) == 0.25)
    assert(m(1L).getDouble(3) == 1.0)
    assert(m(1L).getDouble(4) == 1.0)
    assert(m(2L).getDouble(2) == 1.0)
    assert(math.abs(m(2L).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(m(2L).getDouble(4) == 0.0)
    assert(m(3L).getDouble(2) == 0.4)
    assert(m(3L).getDouble(3) == 0.5)
    assert(m(3L).getDouble(4) == 1.0)
  }

  test("single-token and empty docs are excluded (no bigram frame)") {
    val docs = Seq((1L, "only"), (2L, "   "), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = Repetition.metrics(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }

  test("whitespace runs tokenize like single spaces") {
    val docs = Seq((1L, "  a   b\t c  "), (2L, "a b c")).toDF("doc_id", "text")
    val m = byId(Repetition.metrics(docs, "doc_id", "text").collect())
    assert(m(1L).getInt(1) == m(2L).getInt(1))
    assert(m(1L).getDouble(3) == m(2L).getDouble(3))
  }
}
