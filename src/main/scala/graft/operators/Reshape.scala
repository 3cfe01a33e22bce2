package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / reshape operators (SURVEY.md §2.4 A2).
  *
  * pandas `pivot_table(index=k, columns=c, values=v, aggfunc=f)`
  * (蔬菜价格相关性分析.py:40-41) maps 1:1 to `groupBy(k).pivot(c).agg(f(v))`.
  * Scale note (SURVEY §7.5-6): pivot without an explicit value list runs a
  * distinct job over `c` and is capped by `spark.sql.pivotMaxValues`; all
  * entry points accept an explicit list, which also makes the output schema
  * static — required for oracle comparison and for stable downstream plans.
  */
object Reshape {

  /** Pivot with explicit values; output columns are `<prefix><value>`. */
  def pivotAgg(
      df: DataFrame,
      key: String,
      pivotCol: String,
      values: Seq[String],
      agg: Column,
      prefix: String = ""): DataFrame = {
    val p = df.groupBy(col(key)).pivot(pivotCol, values).agg(agg)
    // pivot names columns by raw value; apply the caller's prefix for stable,
    // oracle-matchable names.
    values.foldLeft(p)((d, v) => d.withColumnRenamed(v, s"$prefix$v"))
  }

  /** Dynamic-schema variant (pandas-exact: column set = distinct data values).
    * Only for small cardinality; prefer the explicit-list form at scale.
    */
  def pivotAggDynamic(df: DataFrame, key: String, pivotCol: String, agg: Column): DataFrame =
    df.groupBy(col(key)).pivot(pivotCol).agg(agg)

  /** Inverse reshape (melt/unpivot) via `stack`, for round-trip tests. */
  def unpivot(df: DataFrame, key: String, valueCols: Seq[String], varName: String, valueName: String): DataFrame = {
    val stackExpr = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(key, s"stack(${valueCols.size}, $stackExpr) as (`$varName`, `$valueName`)")
  }
}
