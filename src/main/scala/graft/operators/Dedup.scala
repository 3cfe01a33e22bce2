package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.4 A1 + north-star dedup suite).
  *
  * Order-sensitivity note (SURVEY.md §7.5-1): pandas `drop_duplicates(keep=
  * 'last')` (蔬菜价格相关性分析.py:25-26) relies on implicit row order. Spark has no
  * implicit order, so keep-last/keep-first take an explicit ordering — the
  * caller names the tiebreak columns. This is the 100-TB-safe form: the
  * window shuffles once on the key and each partition resolves its own
  * groups; no global sort.
  */
object Dedup {

  /** A1 — keep the LAST row per key group under `order` (ascending). Plans as
    * one shuffle on `keys` + per-group sort; Catalyst/Tungsten handle spill.
    */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.map(_.desc).toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Keep the FIRST row per key group under `order` (ascending). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact content dedup: group identical values of `contentCols`, keep the
    * row with the smallest `idCol`, and report the duplicate count. At 100 TB
    * the groupBy key should be a digest, not the raw content — see
    * `exactDedupByHash`.
    */
  def exactDedup(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentCols.map(col).toIndexedSeq: _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Scale path for exact dedup: shuffle on a 256-bit content digest instead
    * of the raw payload (shuffles ~32 bytes/row instead of the document).
    * Semantically identical to `exactDedup` absent sha2 collisions.
    */
  def exactDedupByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(sha2(col(contentCol), 256).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
}
