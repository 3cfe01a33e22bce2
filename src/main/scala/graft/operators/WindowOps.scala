package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window / time-series operators (SURVEY.md §2.5 W1–W7), generalizing the
  * COVID feature pipeline (新冠疫情分析.py:52-76) and the VEG adjacent-date trend
  * encoding (蔬菜价格相关性分析.py:83-99).
  *
  * Scale note (SURVEY.md §7.5-7): a global `Window.orderBy` collapses to one
  * partition. Every builder here therefore takes partition keys; the
  * single-series case passes `Seq.empty` explicitly (fine at reference scale,
  * and the API makes the choice visible instead of implicit).
  */
object WindowOps {

  def spec(partitionBy: Seq[String], orderBy: Seq[Column]): WindowSpec = {
    val base =
      if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(col).toIndexedSeq: _*)
    base.orderBy(orderBy.toIndexedSeq: _*)
  }

  /** W1 — lag-k features: pandas `col.shift(k)`. */
  def lagFeatures(df: DataFrame, w: WindowSpec, cols: Seq[String], ks: Seq[Int]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      ks.foldLeft(d)((d2, k) => d2.withColumn(s"${c}_lag$k", lag(col(c), k).over(w)))
    }

  /** W2 — trailing moving average of the previous `n` rows EXCLUDING the
    * current row: pandas `rolling(n, min_periods=1).mean().shift(1)`. Spark's
    * frame-average over `rowsBetween(-n, -1)` matches `min_periods=1`
    * because avg ignores the short frame at the start (SURVEY §7.5-4).
    */
  def trailingMean(df: DataFrame, w: WindowSpec, c: String, n: Int): DataFrame =
    df.withColumn(s"${c}_ma$n", avg(col(c)).over(w.rowsBetween(-n, -1)))

  /** W3 — lagged percent change: pandas `pct_change().shift(1)` =
    * (x[t-1] − x[t-2]) / x[t-2]. Division by zero → null (non-ANSI), matching
    * the reference's inf→0 cleanup when composed with Cleaning.replaceInf.
    */
  def laggedPctChange(df: DataFrame, w: WindowSpec, c: String): DataFrame =
    df.withColumn(
      s"${c}_pct_change",
      (lag(col(c), 1).over(w) - lag(col(c), 2).over(w)) / lag(col(c), 2).over(w))

  /** W4 — lagged difference of order k: pandas `diff(k).shift(1)` =
    * x[t-1] − x[t-1-k].
    */
  def laggedDiff(df: DataFrame, w: WindowSpec, c: String, k: Int): DataFrame =
    df.withColumn(s"${c}_diff$k", lag(col(c), 1).over(w) - lag(col(c), k + 1).over(w))

  /** P13/W7 — materialize an explicit row ordinal (pandas implicit index). */
  def ordinal(df: DataFrame, w: WindowSpec, name: String = "seq"): DataFrame =
    df.withColumn(name, row_number().over(w))

  /** Exponentially-weighted moving average, pandas `ewm(alpha,
    * adjust=True).mean()` semantics: ewma_t = Σ_{i≤t} (1−α)^{t−i}·x_i /
    * Σ_{i≤t} (1−α)^{t−i}, row-based (gaps in the order column do not decay
    * extra). Computed with the closed form ewma_t = Σ(x_i·r^{−i}) / Σ(r^{−i})
    * (r = 1−α; the r^t factor cancels in the ratio) — two running window
    * sums, no recursion, so it stays a plain codegen'd window aggregate and
    * an exact SQL oracle can reproduce it bit-for-bit. r^{−i} grows ~e.g.
    * 1e23 at i=150 for α=0.3 — far inside double range, and numerator/
    * denominator share the scale so the ratio is well-conditioned.
    */
  def ewma(df: DataFrame, w: WindowSpec, c: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    val r = 1.0 - alpha
    val i = row_number().over(w).cast("double")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_wi", pow(lit(r), -i))
      .withColumn(
        s"${c}_ewma",
        sum(col(c) * col("_wi")).over(run) / sum(col("_wi")).over(run))
      .drop("_wi")
  }

  /** W5 + P14 — adjacent-row trend discretization (蔬菜价格相关性分析.py:94-99):
    * compare the NEXT row's value against the current one and emit
    * "up" (> 1+band), "down" (< 1−band), or "flat". Rows with no successor
    * produce null trend (the reference's loop simply stops before them).
    */
  def trendLabel(df: DataFrame, w: WindowSpec, valueCol: String, band: Double = 0.05): DataFrame = {
    val next = lead(col(valueCol), 1).over(w)
    df.withColumn(
      "trend",
      when(next.isNull, lit(null).cast("string"))
        .when(next > col(valueCol) * (1 + band), "up")
        .when(next < col(valueCol) * (1 - band), "down")
        .otherwise("flat"))
  }
}
