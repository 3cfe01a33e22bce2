package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the canonical BPE teaching corpus: word freqs hug:10 pug:5 pun:12
  // bun:4 hugs:5 — pair counts (u,g)=20 (p,u)=17 (u,n)=16 (h,u)=15 ...
  private lazy val docs = {
    val words =
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
  }

  test("learnMerges reproduces the hand-computed merge sequence") {
    val merges = Bpe.learnMerges(docs, "text", 3)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("u", "g", 20L), // hug 10 + pug 5 + hugs 5
      ("u", "n", 16L), // pun 12 + bun 4
      ("h", "ug", 15L) // hug 10 + hugs 5 (after u+g fused)
    ))
  }

  test("applyMerge fuses left-to-right without overlap") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "y", "x", "y"), "x", "y") == Seq("xy", "xy"))
    assert(Bpe.applyMerge(Seq("q"), "a", "b") == Seq("q"))
  }

  test("segment applies merges in learned order") {
    val merges = Bpe.learnMerges(docs, "text", 3)
    val out = Bpe.segment(Seq((7L, "hug pun")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().head
    assert(out.getLong(0) == 7L)
    assert(out.getSeq[String](1) == Seq("hug", "p", "un"))
  }

  test("pairCounts is learnMerges' first iteration: its argmax row is the first merge") {
    val top = Bpe.pairCounts(docs, "text")
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
        org.apache.spark.sql.functions.col("lhs"), org.apache.spark.sql.functions.col("rhs"))
      .limit(1).collect().head
    val first = Bpe.learnMerges(docs, "text", 1).head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      ((first.left, first.right, first.count)))
  }

  test("non-BMP text segments on code points — no lone surrogates") {
    // 😀 (U+1F600) and 🐍 (U+1F40D) are surrogate PAIRS in UTF-16; a
    // char-level split would emit broken half-characters and diverge from
    // pairCounts' codepoint-based substr
    val emojiDocs = Seq((1L, "😀🐍 😀🐍 😀a"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(emojiDocs, "text", 1)
    assert(merges.head.left == "😀") // whole 😀, not a lone high surrogate
    assert(merges.map(m => (m.left, m.right, m.count)) ==
      Seq(("😀", "🐍", 2L)))
    // pairCounts (codepoint substr) agrees with learnMerges' split
    val top = Bpe.pairCounts(emojiDocs, "text")
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
        org.apache.spark.sql.functions.col("lhs"), org.apache.spark.sql.functions.col("rhs"))
      .limit(1).collect().head
    assert((top.getString(0), top.getString(1), top.getLong(2)) ==
      (("😀", "🐍", 2L)))
    // and segment round-trips the learned merge on code points
    val seg = Bpe.segment(emojiDocs, "doc_id", "text", merges).collect().head
    assert(seg.getSeq[String](1) ==
      Seq("😀🐍", "😀🐍", "😀", "a"))
  }

  test("word-frequency weighting: a repeated doc changes counts, not merges") {
    val doubled = docs.union(docs)
    val merges = Bpe.learnMerges(doubled, "text", 2)
    assert(merges.map(m => (m.left, m.right)) == Seq(("u", "g"), ("u", "n")))
    assert(merges.head.count == 40L)
  }
}
