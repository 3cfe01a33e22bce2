package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document with the
  * log-likelihood ratio of a bag-of-features model of the TARGET
  * distribution vs the RAW distribution, then resample documents with
  * probability ∝ exp(weight). The importance weight of doc d is
  *
  *   log w(d) = Σ_f n_f(d) · (log p̂_target(f) − log p̂_raw(f))
  *
  * with add-α-smoothed feature probabilities over the union feature space.
  *
  * Scale shape: two feature-count aggregations (target and raw) merged by
  * one full-outer join into a single count table keyed by feature; scoring
  * joins the raw corpus's exploded token instances to that table — a
  * shuffle hash join on the feature key, broadcastable when the (optionally
  * hashed) feature space is bounded. Totals and the feature-space size ride
  * as a 1-row broadcast bind. No window, no driver-side data.
  *
  * The paper hashes n-grams into a fixed bucket space so the count table is
  * bounded regardless of corpus vocabulary — `buckets > 0` enables that
  * (crc32 mod buckets); `buckets = 0` keeps exact unigram features, which
  * is the oracle-reproducible form the driver gate checks.
  */
object Dsir {

  /** Importance weights for every doc in `raw` against the `target` slice.
    * Returns (idCol, n_feat, log_weight) — one row per raw doc with at
    * least one token; `log_weight > 0` ⇔ the doc looks more target-like
    * than raw-like under the bag-of-features model.
    */
  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.01,
      buckets: Int = 0): DataFrame = {
    require(alpha > 0, s"smoothing alpha must be positive: $alpha")
    require(buckets >= 0, s"buckets must be >= 0 (0 = exact features): $buckets")

    val word = TextFunctions.tokens(lower(col(textCol)))
    // feature key: the token itself, or its hashed bucket (bounded space)
    def feat(w: Column): Column =
      if (buckets == 0) w else pmod(crc32(w), lit(buckets.toLong)).cast("string")

    def featInstances(df: DataFrame, cols: Column*): DataFrame =
      df.filter(trim(col(textCol)) =!= "")
        .select((cols :+ explode(word).as("_w")): _*)
        .withColumn("f", feat(col("_w")))
        .drop("_w")

    val rawCounts = featInstances(raw)
      .groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val targetCounts = featInstances(target)
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))

    // one table over the UNION feature space; its row count is the
    // smoothing vocabulary V, its column sums the two corpus totals
    val counts = rawCounts
      .join(targetCounts, Seq("f"), "full_outer")
      .select(
        col("f"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))

    val totals = counts.agg(
      count(lit(1)).cast("double").as("v_"),
      sum(col("cr")).cast("double").as("nr_"),
      sum(col("ct")).cast("double").as("nt_"))

    val logRatio =
      log((col("ct").cast("double") + lit(alpha)) / (col("nt_") + lit(alpha) * col("v_"))) -
        log((col("cr").cast("double") + lit(alpha)) / (col("nr_") + lit(alpha) * col("v_")))

    featInstances(raw, col(idCol))
      .join(counts, Seq("f"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_feat"),
        sum(logRatio).as("log_weight"))
  }

  /** The resampling decision DSIR pairs with the weights: a deterministic
    * Gumbel-top-k-style keep rule — keep doc d iff
    * log w(d) + g(d) clears `cut`, where g(d) is a seedless uniform draw
    * derived from the id (graft.ml.Features.softSample's Knuth hash,
    * mapped through the Gumbel quantile −log(−log u)). Shuffle-free: a
    * pure projection + filter over the weights frame.
    */
  def resample(
      weights: DataFrame,
      idCol: String,
      logWeightCol: String,
      cut: Double): DataFrame = {
    // u in (0, 1): Knuth multiplicative hash of the id over 2^32, offset by
    // half a step so u is never 0 or 1 (the Gumbel quantile is finite)
    val u =
      (graft.ml.Features.knuthHashU32(col(idCol)).cast("double") + lit(0.5)) /
        lit(4294967296.0)
    val gumbel = -log(-log(u))
    weights.withColumn("keep", (col(logWeightCol) + gumbel) > lit(cut))
  }
}
