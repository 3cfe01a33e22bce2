package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regression recipes (SURVEY.md §2.9 M5, M6, M17, M18): the COVID model
  * bake-off re-expressed on spark.ml.
  *
  * Ridge / Lasso / ElasticNet unify into one `LinearRegression` via
  * (regParam, elasticNetParam); RBF-kernel SVR has no spark.ml analog and is
  * substituted by `GBTRegressor` as the strong nonlinear baseline (documented
  * capability gap, 新冠疫情分析.py:155-162).
  */
object Regression {

  /** M17 — the linear family. elasticNetParam: 0 = ridge, 1 = lasso. */
  def linear(regParam: Double, elasticNetParam: Double, maxIter: Int = 100): LinearRegression =
    new LinearRegression()
      .setRegParam(regParam)
      .setElasticNetParam(elasticNetParam)
      .setMaxIter(maxIter)

  /** M18 — nonlinear baseline standing in for RBF SVR. */
  def gbt(seed: Long, maxDepth: Int = 5, maxIter: Int = 50): GBTRegressor =
    new GBTRegressor().setSeed(seed).setMaxDepth(maxDepth).setMaxIter(maxIter)

  /** M6 — regression metric row: rmse / mae / r2 / mape over a predictions
    * frame. MAPE is one aggregate expression (no evaluator needed);
    * zero-label rows are excluded from MAPE exactly as the reference's
    * divide-then-clean does.
    */
  def metrics(preds: DataFrame, labelCol: String, predCol: String, model: String): DataFrame = {
    val ev = new RegressionEvaluator().setLabelCol(labelCol).setPredictionCol(predCol)
    val rmse = ev.setMetricName("rmse").evaluate(preds)
    val mae = ev.setMetricName("mae").evaluate(preds)
    val r2 = ev.setMetricName("r2").evaluate(preds)
    val mape = preds
      .filter(col(labelCol) =!= 0)
      .agg(avg(abs((col(labelCol) - col(predCol)) / col(labelCol))) * 100)
      .head().getDouble(0)
    val spark = preds.sparkSession
    import spark.implicits._
    Seq((model, rmse, mae, r2, mape)).toDF("model", "rmse", "mae", "r2", "mape")
  }

  /** M6, relational form — per-group rmse / mae / r2 / mape as pure
    * aggregate expressions (one map-side-combinable shuffle on the group
    * keys, no driver loop, no evaluator), so a SQL oracle reproduces every
    * value. r2 uses the textbook 1 − SS_res/SS_tot with the
    * variance-expansion form Σ(l²) − (Σl)²/n for SS_tot, which both engines
    * compute identically; MAPE excludes zero labels like `metrics`.
    */
  def metricsRelational(
      preds: DataFrame,
      labelCol: String,
      predCol: String,
      groupCols: Seq[String]): DataFrame = {
    val l = col(labelCol)
    val p = col(predCol)
    val err = l - p
    preds
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sqrt(avg(err * err)).as("rmse"),
        avg(abs(err)).as("mae"),
        (lit(1.0) - sum(err * err) /
          (sum(l * l) - sum(l) * sum(l) / count(lit(1)))).as("r2"),
        (sum(when(l =!= 0, abs(err / l))) / count(when(l =!= 0, lit(1))) * 100)
          .as("mape"))
  }

  /** M5 — rolling-origin (expanding-window) cross-validation, the spark.ml
    * analog of sklearn's `TimeSeriesSplit`: k folds over an ordered column;
    * fold i trains on order ≤ cutᵢ and validates on (cutᵢ, cutᵢ₊₁]. Returns
    * the per-fold validation frame (fold, cut, rmse).
    *
    * Driver-side loop by design (SURVEY.md §4.2) — each fit is itself a
    * distributed job; the loop only steers. The k folds are independent, so
    * they're submitted CONCURRENTLY (Spark's scheduler interleaves the jobs
    * across the executor cores) — a single fold's fit never saturates the
    * cluster, so serializing them wastes ~k× wall-clock. The input is
    * persisted for the duration so k folds scan it once, not 2k times.
    */
  def rollingOriginCv(
      df: DataFrame,
      orderCol: String,
      featuresCol: String,
      labelCol: String,
      k: Int,
      fit: DataFrame => org.apache.spark.ml.Model[_] with org.apache.spark.ml.Transformer)
      : DataFrame = {
    require(k > 0, s"rollingOriginCv needs at least one fold, got k=$k")
    val spark = df.sparkSession
    import spark.implicits._
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds =
        cached.select(min(col(orderCol)).cast("double"), max(col(orderCol)).cast("double")).head()
      val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
      val cuts = (1 to k).map(i => lo + (hi - lo) * i / (k + 1).toDouble)
      val ev = new RegressionEvaluator()
        .setLabelCol(labelCol).setPredictionCol("prediction").setMetricName("rmse")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(k, 8))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val rows =
        try {
          val futures = cuts.zipWithIndex.map { case (cut, i) =>
            scala.concurrent.Future {
              val next = if (i + 1 < cuts.length) cuts(i + 1) else hi + 1
              val train = cached.filter(col(orderCol).cast("double") <= cut)
              val valid = cached.filter(
                col(orderCol).cast("double") > cut && col(orderCol).cast("double") <= next)
              val model = fit(train)
              (i + 1, cut, ev.evaluate(model.transform(valid)))
            }
          }
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(futures),
            scala.concurrent.duration.Duration.Inf)
        } finally pool.shutdown()
      rows.toDF("fold", "cut", "rmse")
    } finally cached.unpersist()
  }
}
