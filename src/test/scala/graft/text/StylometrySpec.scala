package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.expressions.MultiSubstringCountExpr

class StylometrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cnToNum parses positional Chinese numerals") {
    val cases = Map(
      "一" -> 1, "九" -> 9, "十" -> 10, "十五" -> 15, "二十" -> 20,
      "二十三" -> 23, "九十九" -> 99, "一百" -> 100, "一百零八" -> 108, "一百二十" -> 120)
    cases.foreach { case (s, n) => assert(Stylometry.cnToNum(s) == n, s"$s") }
  }

  test("splitChapters emits one row per heading with parsed numbers") {
    val book = Seq(
      "序言 blah\n第一回 甄士隐梦幻识通灵\n正文A 正文A2\n第二回 贾夫人仙逝扬州城\n正文B\n第十回 某标题\n正文C"
    ).toDF("text")
    val out = Stylometry.splitChapters(spark, book, "text").orderBy("chapter").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 10))
    assert(out.head.getString(1) == "甄士隐梦幻识通灵")
    assert(out.head.getString(2) == "正文A 正文A2")
    assert(out(1).getString(2) == "正文B")
  }

  test("multi-substring count equals per-word scanning") {
    val words = Seq("the", "cat", "at", "t")
    val text = "the cat sat at the mat"
    val df = Seq(text).toDF("t")
    val got = df.select(MultiSubstringCountExpr.multiSubstringCount(col("t"), words).as("c"))
      .as[Seq[Long]].head()
    // expected via naive overlapping count
    def naive(t: String, w: String) = t.sliding(w.length).count(_ == w).toLong
    assert(got == words.map(naive(text, _)))
    // cross-check a couple by hand
    assert(got(0) == 2L) // "the"
    assert(got(2) == 4L) // "at" in cat, sat, at, mat
  }

  test("functionWordFeatures normalizes per 1000 chars") {
    val df = Seq((1, "aaaa")).toDF("id", "text") // "aa" overlapping occurs 3x in "aaaa"
    val out = Stylometry.functionWordFeatures(df, "id", "text", Seq("aa")).head()
    assert(math.abs(out.getDouble(1) - 3.0 * 1000 / 4) < 1e-9)
  }

  test("varianceTopK ranks features by sample variance") {
    val df = (1 to 10).map(i => (i.toDouble * 10, 1.0, i.toDouble)).toDF("big", "const", "small")
    val out = Stylometry.varianceTopK(df, Seq("big", "const", "small"), 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("big", "small"))
  }

  test("groupContrast computes per-group means and |diff| ordering") {
    val df = Seq((true, 10.0, 5.0), (true, 12.0, 5.0), (false, 1.0, 5.0), (false, 3.0, 5.0))
      .toDF("g", "x", "y")
    val out = Stylometry.groupContrast(df, col("g"), Seq("x", "y")).collect()
    assert(out.head.getString(0) == "x")
    assert(out.head.getDouble(1) == 11.0 && out.head.getDouble(2) == 2.0)
    assert(out(1).getDouble(3) == 0.0)
  }

  test("groupContrast survives an empty split side (NaN, not NPE)") {
    val df = Seq((true, 10.0), (true, 12.0)).toDF("g", "x")
    val out = Stylometry.groupContrast(df, col("g"), Seq("x")).head()
    assert(out.getDouble(1) == 11.0)
    assert(out.getDouble(2).isNaN && out.getDouble(3).isNaN)
  }
}
