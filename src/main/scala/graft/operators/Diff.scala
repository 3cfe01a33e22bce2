package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset regression check run between two versions of
  * a corpus/table (did the pipeline change add, drop, or mutate rows?).
  *
  * Full outer equi-join on the key columns — ONE shuffle per side on the
  * key, no row payloads compared until the join has aligned them — then a
  * null-safe column-wise comparison classifies each key as added / removed /
  * changed / unchanged. Returns the key columns + change_type; callers
  * aggregate or sample from there. At 100 TB both sides shuffle once (the
  * same cost as any key-aligned reconciliation); if one side is a small
  * delta, Spark's planner broadcasts it instead.
  */
object Diff {

  def snapshotDiff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs key columns")
    val compareCols = old.columns.filterNot(keys.contains).toSeq
    require(compareCols.toSet == neu.columns.filterNot(keys.contains).toSet,
      "snapshots must share non-key columns")
    // key-only diffs (no payload) still need a non-empty side marker struct
    // for the added/removed classification — struct() with zero fields is
    // not constructible
    def payload(of: Seq[Column]): Column =
      if (of.isEmpty) struct(lit(0).as("_present")) else struct(of: _*)
    val l = old.select(
      struct(keys.map(col): _*).as("_k"),
      payload(compareCols.map(col)).as("_lv"))
    val r = neu.select(
      struct(keys.map(col): _*).as("_k"),
      payload(compareCols.map(col)).as("_rv"))
    val joined = l.join(r, Seq("_k"), "full_outer")
    // key-only diff (no payload columns) degrades cleanly: present-in-both
    // is 'unchanged', so only added/removed can occur
    val allEqual = compareCols
      .map(c => col(s"_lv.`$c`") <=> col(s"_rv.`$c`"))
      .foldLeft(lit(true))(_ && _)
    joined
      .withColumn(
        "change_type",
        when(col("_lv").isNull, "added")
          .when(col("_rv").isNull, "removed")
          .when(allEqual, "unchanged")
          .otherwise("changed"))
      .select(keys.map(k => col(s"_k.`$k`").as(k)) :+ col("change_type"): _*)
  }
}
