package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.MultiSubstringCountExpr.multiSubstringCount

/** Text-stylometry pipeline (SURVEY.md §2 Phase 4 — the HLM authorship
  * analysis re-expressed Spark-first): chapter splitting, Chinese-numeral
  * parsing, function-word frequency features, and group-contrast statistics.
  */
object Stylometry {

  /** F2 — Chinese numeral → Int (十/百 positional semantics), the pure
    * function behind the chapter-heading parser (红楼梦作者分析.py:59-82).
    * Handles 一..九, 十, 百, and 零 up to 999.
    */
  def cnToNum(s: String): Int = {
    val digits = Map('零' -> 0, '一' -> 1, '二' -> 2, '三' -> 3, '四' -> 4,
      '五' -> 5, '六' -> 6, '七' -> 7, '八' -> 8, '九' -> 9)
    var total = 0
    var current = 0
    s.foreach {
      case '百' => total += (if (current == 0) 1 else current) * 100; current = 0
      case '十' => total += (if (current == 0) 1 else current) * 10; current = 0
      case c if digits.contains(c) => current = digits(c)
      case _ => ()
    }
    total + current
  }

  /** Registered UDF form of cnToNum (escape hatch for SQL call-sites). */
  def cnToNumUdf = udf(cnToNum _)

  /** F1 — chapter splitter: one whole-book string → (chapter, title, text)
    * rows. The reference splits on `第<cn-numeral>回 <title>` headings
    * (红楼梦作者分析.py:48-49). Implemented as a Dataset flatMap (the
    * UDTF/Generator shape of §2.11): regex over the single document, emitting
    * one row per chapter with its parsed number.
    */
  def splitChapters(spark: SparkSession, book: DataFrame, textCol: String): DataFrame = {
    import spark.implicits._
    val heading = "第([一二三四五六七八九十百零]+)回\\s*([^\n]*)".r
    book
      .select(col(textCol))
      .as[String]
      .flatMap { text =>
        val ms = heading.findAllMatchIn(text).toVector
        ms.zipWithIndex.map { case (m, i) =>
          val end = if (i + 1 < ms.length) ms(i + 1).start else text.length
          (cnToNum(m.group(1)), m.group(2).trim, text.substring(m.end, end).trim)
        }
      }
      .toDF("chapter", "title", "text")
  }

  /** A15 — function-word frequency features: one Aho-Corasick pass per
    * document, normalized per 1000 chars (红楼梦作者分析.py:117-128). Output:
    * keyCol + one `w_<i>` column per word, order-aligned with `words`.
    */
  def functionWordFeatures(df: DataFrame, keyCol: String, textCol: String, words: Seq[String]): DataFrame = {
    val counts = multiSubstringCount(col(textCol), words)
    val len = length(col(textCol)).cast("double")
    val base = df.select(col(keyCol), counts.as("_c"), len.as("_len"))
    val cols = words.indices.map(i =>
      (element_at(col("_c"), i + 1).cast("double") * 1000.0 / col("_len")).as(s"w_$i"))
    base.select(col(keyCol) +: cols: _*)
  }

  /** A6 — per-column variance, returned as (column, variance) rows sorted
    * desc — the reference's "top-k most discriminating words"
    * (红楼梦作者分析.py:309-310). Column-wise: one aggregate pass, tiny result.
    */
  def varianceTopK(df: DataFrame, featureCols: Seq[String], k: Int): DataFrame = {
    val row = df.agg(
      var_samp(col(featureCols.head)).as(featureCols.head),
      featureCols.tail.map(c => var_samp(col(c)).as(c)): _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    featureCols.zipWithIndex
      .map { case (c, i) => (c, if (row.isNullAt(i)) Double.NaN else row.getDouble(i)) }
      .sortBy(-_._2)
      .take(k)
      .toDF("feature", "variance")
  }

  /** A5 — group-contrast means: per-feature mean for rows in/out of a
    * boolean split plus absolute difference, sorted by |diff| desc — the
    * first-80-vs-last-40 chapter contrast (红楼梦作者分析.py:314-316, 356-357).
    */
  def groupContrast(df: DataFrame, groupCol: Column, featureCols: Seq[String]): DataFrame = {
    val aggs = featureCols.flatMap { c =>
      Seq(
        avg(when(groupCol, col(c))).as(s"${c}_a"),
        avg(when(!groupCol, col(c))).as(s"${c}_b"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    // an empty side of the split makes avg() null — surface NaN (like
    // varianceTopK) instead of NPEing on getDouble
    def at(i: Int): Double = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
    featureCols.zipWithIndex
      .map { case (c, i) =>
        val a = at(2 * i)
        val b = at(2 * i + 1)
        (c, a, b, math.abs(a - b))
      }
      .sortBy(-_._4)
      .toDF("feature", "mean_a", "mean_b", "abs_diff")
  }
}
