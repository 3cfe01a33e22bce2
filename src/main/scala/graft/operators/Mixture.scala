package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data mixture weighting: the sampling-weight computation a
  * multi-source pretraining run performs before drawing its data order
  * (temperature-scaled mixing, the `p_i ∝ n_i^α` rule used for multilingual
  * and multi-corpus balancing — α=1 is proportional sampling, α=0 uniform,
  * α≈0.3–0.7 the usual compromise that up-samples small sources without
  * flattening large ones).
  *
  * Scale shape: one aggregation over the corpus keyed by source (source
  * cardinality is config-sized, not data-sized), then a broadcast of the
  * 1-row total back onto the per-source frame — no window, no second
  * shuffle, no driver-side collect.
  */
object Mixture {

  /** Per-source temperature weights.
    *
    * `sizeExpr` is the per-row contribution to a source's size (e.g. a
    * token count column or `lit(1)` for doc counts). Returns per source:
    * (n_docs, size, weight) with `weight = size^α / Σ size^α`, raw doubles —
    * callers round for presentation.
    */
  def temperatureWeights(
      docs: DataFrame,
      sourceCol: String,
      sizeExpr: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0, s"alpha must be non-negative: $alpha")
    val per = docs
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(sizeExpr).as("size"))
      .withColumn("_raw", pow(col("size").cast("double"), lit(alpha)))
    val total = per.agg(sum(col("_raw")).as("_tot"))
    per
      .crossJoin(broadcast(total))
      .withColumn("weight", col("_raw") / col("_tot"))
      .drop("_raw", "_tot")
  }
}
