package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.{TextFunctions => TF}

class TokenChunksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Int, Int, String)] =
    Seq(text).toDF("t")
      .select(explode(TF.tokenChunks(col("t"), size, stride)).as("c"))
      .select("c.start", "c.n_tok", "c.chunk")
      .as[(Int, Int, String)]
      .collect()
      .toSeq

  test("overlapping windows cover every token and stop at the last") {
    // 10 tokens, size 4, stride 2 -> starts 1,3,5,7 (max start = n-size+stride)
    val got = chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 2)
    assert(got == Seq(
      (1, 4, "t1 t2 t3 t4"),
      (3, 4, "t3 t4 t5 t6"),
      (5, 4, "t5 t6 t7 t8"),
      (7, 4, "t7 t8 t9 t10")))
  }

  test("doc shorter than one window yields a single short chunk") {
    assert(chunksOf("a b c", 128, 64) == Seq((1, 3, "a b c")))
  }

  test("empty and whitespace-only docs yield no chunks") {
    assert(chunksOf("", 4, 2).isEmpty)
    assert(chunksOf("   ", 4, 2).isEmpty)
  }

  test("non-overlapping stride == size tiles the tokens exactly") {
    val got = chunksOf("a b c d e f g", 3, 3)
    assert(got == Seq((1, 3, "a b c"), (4, 3, "d e f"), (7, 1, "g")))
  }

  test("every token index is inside at least one chunk (property)") {
    for (n <- 1 to 40; size <- Seq(4, 7); stride <- Seq(2, 4); if stride <= size) {
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val got = chunksOf(text, size, stride)
      val covered = got.flatMap { case (s, k, _) => s until (s + k) }.toSet
      assert(covered == (1 to n).toSet, s"n=$n size=$size stride=$stride")
      // chunk token counts are consistent with their content
      got.foreach { case (_, k, c) => assert(c.split(" ").length == k) }
    }
  }
}
