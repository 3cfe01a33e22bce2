package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based multilingual data mixing — the mT5/XLM-R/CC-100
  * sampling-rate scheme (Xue et al. 2021 §3.1; Conneau et al. 2020 §3):
  * a corpus whose language sizes span orders of magnitude is re-balanced
  * by sampling language l with probability r_l ∝ T_l^α (T_l = the
  * language's token count, α ∈ [0, 1] the temperature — α = 1 keeps the
  * natural distribution, α → 0 approaches uniform), so low-resource
  * languages are up-sampled and the head language stops dominating the
  * training mix.
  *
  * Both steps are deterministic closed forms over aggregates, which is
  * what makes the operator value-checkable cross-engine (q240):
  *
  *  - [[temperaturePlan]] — the per-language plan: one aggregation for
  *    T_l, one 1-row broadcast bind for the normalizer Σ T_l^α and the
  *    grand total; epochs e_l = budget·r_l / T_l says how many times the
  *    language's data is consumed (> 1 = up-sample by repetition, < 1 =
  *    down-sample), rounded to 6 dp so cross-engine pow() noise (~ulp)
  *    can't flip a downstream sampling decision.
  *  - [[temperatureSample]] — the per-document realization: each doc
  *    carries n_copies = ⌊e_l⌋ + [u < frac(e_l)] with u the seedless
  *    Knuth-hash uniform of its id (`Features.knuthHashU32` — the shared
  *    deterministic-sampling primitive; its SQL oracles mirror the hash
  *    literally). E[n_copies·toks summed over l] = budget·r_l exactly;
  *    callers explode n_copies at write time (carrying the count keeps
  *    the operator a narrow scan-join, no row multiplication here).
  *
  * Scale shape: the plan is |languages| rows built from one aggregation;
  * the sample is a broadcast join of that plan onto the corpus plus four
  * integer ops per row — no shuffle of the documents at all.
  */
object Mixing {

  private def checkAlpha(alpha: Double): Unit =
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1]: $alpha")

  /** Per-language sampling plan: (langCol, tokens, rate, epochs) where
    * rate = T^α / Σ T^α and epochs = round(budget·rate / T, 6). Languages
    * with zero tokens are excluded (they contribute nothing to sample and
    * would divide by zero). `budgetTokens` is the target size of the mixed
    * corpus in tokens.
    */
  def temperaturePlan(
      df: DataFrame,
      langCol: String,
      tokens: Column,
      alpha: Double,
      budgetTokens: Double): DataFrame = {
    checkAlpha(alpha)
    require(budgetTokens > 0.0, s"budgetTokens must be positive: $budgetTokens")
    val tot = df.groupBy(col(langCol))
      .agg(sum(tokens).cast("long").as("tokens"))
      .filter(col("tokens") > 0)
    val z = tot.agg(sum(pow(col("tokens"), lit(alpha))).as("_z"))
    val rate = pow(col("tokens"), lit(alpha)) / col("_z")
    // the 1-row normalizer bind — the q203/q223 broadcast-scalar pattern
    tot.crossJoin(broadcast(z))
      .select(
        col(langCol),
        col("tokens"),
        rate.as("rate"),
        round(lit(budgetTokens) * rate / col("tokens") + lit(1e-9), 6).as("epochs"))
  }

  /** Realize a [[temperaturePlan]]: every input row gains `n_copies` =
    * ⌊e⌋ + [u < frac(e)] for its language's epochs e (0 for languages
    * absent from the plan — zero-token languages drop out here). The id
    * must be castable to long and unique; u = knuthHash(id)/2^32 makes
    * membership a pure function of the id, reproducible by any engine.
    */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      langCol: String,
      plan: DataFrame): DataFrame = {
    val u = graft.ml.Features.knuthHashU32(col(idCol)).cast("double") / lit(4294967296.0)
    val e = col("epochs")
    val n = (floor(e).cast("long") +
      when(u < e - floor(e), lit(1L)).otherwise(lit(0L))).as("n_copies")
    df.join(broadcast(plan.select(col(langCol), col("epochs"))), Seq(langCol))
      .withColumn("n_copies", n)
      .filter(col("n_copies") > 0)
      .drop("epochs")
  }
}
