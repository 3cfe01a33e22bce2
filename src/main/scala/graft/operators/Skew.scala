package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY.md "partitioning & shuffle" stance).
  *
  * AQE's skew-join splitting covers most cases at runtime; these explicit
  * forms are for the cases AQE can't fix: a skewed AGGREGATION key (AQE only
  * splits join partitions) and a skewed join against a non-broadcastable
  * side.
  */
object Skew {

  /** Two-phase salted aggregation: distribute one hot group over `buckets`
    * sub-groups (random salt), aggregate partially per (key, salt), then
    * merge the partials. Correct for decomposable aggregates (sum/count/
    * min/max); the caller supplies both phases explicitly.
    *
    * Example: salted count+sum of a value per key:
    * {{{
    * saltedAgg(df, Seq("k"), 16,
    *   partial = Seq(count(lit(1)).as("c"), sum($"v").as("s")),
    *   merge   = Seq(sum($"c").as("c"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      buckets: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", (rand(42) * buckets).cast("int"))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col).toIndexedSeq: _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-but-not-
    * broadcastable right side: left rows get a random salt in [0, buckets),
    * the right side is replicated `buckets` times (explode), and the join
    * key becomes (key, salt) — the hot key's rows spread over `buckets`
    * reducers instead of one.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("_salt", (rand(42) * buckets).cast("int"))
    val expandedRight = right.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(expandedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-distribution skew report — the diagnostic that decides WHETHER the
    * mitigations above are needed: for each group, the sub-key distribution's
    * concentration stats. Emits per group: n rows, distinct sub-keys, Shannon
    * entropy (nats) of the sub-key frequencies, Herfindahl concentration
    * index Σp² (1 = all rows on one key), and the hottest key's share.
    *
    * Two chained aggregations — count per (group, subKey), then the
    * distribution stats per group — both with map-side partials; no row-level
    * data survives the first shuffle, so the report costs two exchanges of
    * key-count pairs regardless of input size.
    */
  def keyDistributionReport(df: DataFrame, groupCol: String, subKeyCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol), col(subKeyCol))
      .agg(count(lit(1)).as("_c"))
    counts
      .groupBy(col(groupCol))
      .agg(
        sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("_c")).as("_max"),
        // double, not int64: a hot key past ~3e9 rows would silently wrap
        // _c*_c in non-ANSI mode — in exactly the regime this report exists
        // to diagnose
        sum(col("_c").cast("double") * col("_c")).as("_sq"),
        sum(col("_c") * log(col("_c"))).as("_clogc"))
      .withColumn("entropy", log(col("n_rows")) - col("_clogc") / col("n_rows"))
      .withColumn("hhi", col("_sq") / (col("n_rows").cast("double") * col("n_rows")))
      .withColumn("top_share", col("_max").cast("double") / col("n_rows"))
      .drop("_max", "_sq", "_clogc")
  }
}
