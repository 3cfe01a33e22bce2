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
    * extra). Computed with the numerically stable online recursion
    * s_t = x_t + r·s_{t−1}, w_t = 1 + r·w_{t−1}, ewma_t = s_t/w_t (r = 1−α)
    * via a per-group sequential scan — the closed-form
    * Σ(x_i·r^{−i})/Σ(r^{−i}) ratio of running window sums overflows r^{−i}
    * to ±Inf on long partitions (α=0.3 dies near row 2000, α=0.99 near row
    * 155) and poisons every later row with NaN; the recursion is exact at
    * any length. Each group buffers and sorts in memory — the same cost
    * shape as WindowExec's partition buffer; the typed scan trades codegen
    * for unconditional numerical correctness. Null values emit null ewma
    * and leave the state unchanged (pandas ignore_na=True).
    */
  def ewma(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      c: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(orderBy.nonEmpty, "ewma needs an ordering column")
    val r = 1.0 - alpha
    val schema = df.schema
    val outSchema = schema.add(s"${c}_ewma", org.apache.spark.sql.types.DoubleType)
    val keyIdx = partitionBy.map(schema.fieldIndex)
    val ordIdx = orderBy.map(schema.fieldIndex)
    val valIdx = schema.fieldIndex(c)
    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)
    // Group on the key VALUES (a Row through its own encoder), not a
    // delimiter-joined string: the string form collided a null key with the
    // literal "null" and merged distinct multi-column keys whose rendered
    // parts happened to concatenate equal - silently mixing EWMA state.
    val keySchema = org.apache.spark.sql.types.StructType(keyIdx.map(schema(_)))
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    df.groupByKey { row: org.apache.spark.sql.Row =>
      org.apache.spark.sql.Row.fromSeq(keyIdx.map(row.get))
    }(keyEnc)
      .flatMapGroups { (_: org.apache.spark.sql.Row, it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(
          rows,
          (a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) =>
            ordIdx.iterator
              .map { i =>
                // nulls-first ordering (Spark's ASC default) instead of the
                // NPE the bare Comparable call threw on null order values
                (a.get(i), b.get(i)) match {
                  case (null, null) => 0
                  case (null, _) => -1
                  case (_, null) => 1
                  case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
                }
              }
              .find(_ != 0)
              .getOrElse(0))
        var s = 0.0
        var w = 0.0
        rows.iterator.map { row =>
          val v = row.get(valIdx)
          val e: Any =
            if (v == null) null
            else {
              s = v.asInstanceOf[Number].doubleValue() + r * s
              w = 1.0 + r * w
              s / w
            }
          org.apache.spark.sql.Row.fromSeq(row.toSeq :+ e)
        }
      }(rowEnc)
  }

  /** Holt double-exponential smoothing (the EWMA's trend-aware sibling):
    * per group, the online recursion over rows in `orderBy` order
    *
    *   l₁ = y₁, b₁ = 0
    *   lₜ = α·yₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
    *
    * returning ONE row per group: (partition cols..., n, level, trend) —
    * the final state a forecaster extrapolates from (ŷₜ₊ₕ = l + h·b).
    * Same typed per-group scan as `ewma` (and the same trade: the group
    * buffers in memory like a WindowExec partition; codegen is given up
    * for an exact, overflow-free recursion). Null values leave the state
    * unchanged. The (1−α)/(1−β) complements are computed BY SUBTRACTION so
    * an oracle writing `(1 - 0.3)` reproduces bit-identical arithmetic.
    */
  def holt(
      df: DataFrame,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      c: String,
      alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha out of (0,1): $alpha")
    require(beta > 0 && beta < 1, s"beta out of (0,1): $beta")
    require(orderBy.nonEmpty, "holt needs an ordering column")
    val ra = 1.0 - alpha
    val rb = 1.0 - beta
    val schema = df.schema
    val keyIdx = partitionBy.map(schema.fieldIndex)
    val ordIdx = orderBy.map(schema.fieldIndex)
    val valIdx = schema.fieldIndex(c)
    val keySchema = org.apache.spark.sql.types.StructType(keyIdx.map(schema(_)))
    val outSchema = keySchema
      .add("n", org.apache.spark.sql.types.LongType)
      .add("level", org.apache.spark.sql.types.DoubleType)
      .add("trend", org.apache.spark.sql.types.DoubleType)
    val keyEnc = org.apache.spark.sql.Encoders.row(keySchema)
    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)
    df.groupByKey { row: org.apache.spark.sql.Row =>
      org.apache.spark.sql.Row.fromSeq(keyIdx.map(row.get))
    }(keyEnc)
      .mapGroups { (key: org.apache.spark.sql.Row, it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(
          rows,
          (a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) =>
            ordIdx.iterator
              .map { i =>
                (a.get(i), b.get(i)) match {
                  case (null, null) => 0
                  case (null, _) => -1
                  case (_, null) => 1
                  case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
                }
              }
              .find(_ != 0)
              .getOrElse(0))
        var n = 0L
        var l = 0.0
        var b = 0.0
        rows.foreach { row =>
          val v = row.get(valIdx)
          if (v != null) {
            val y = v.asInstanceOf[Number].doubleValue()
            if (n == 0L) { l = y; b = 0.0 }
            else {
              val nl = alpha * y + ra * (l + b)
              b = beta * (nl - l) + rb * b
              l = nl
            }
            n += 1L
          }
        }
        org.apache.spark.sql.Row.fromSeq(
          key.toSeq ++ Seq(n, if (n == 0) null else l, if (n == 0) null else b))
      }(outEnc)
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
