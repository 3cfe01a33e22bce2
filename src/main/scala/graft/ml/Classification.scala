package graft.ml

import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification recipes (SURVEY.md §2.9 M7–M16, A12): the CANCER 8-model
  * bake-off re-expressed on spark.ml.
  *
  * Capability notes: RBF-kernel SVC has no spark.ml analog — `LinearSVC` is
  * the linear stand-in and `GBTClassifier` the strong nonlinear baseline
  * (乳腺癌预测.py:111). KNN is a k-nearest-neighbor JOIN (`knnClassify`), not
  * a fitted model.
  */
object Classification {

  /** The bake-off roster (name → estimator), mirroring 乳腺癌预测.py:105-114. */
  def roster(seed: Long, numFeatures: Int): Seq[(String, org.apache.spark.ml.Estimator[_ <: org.apache.spark.ml.Transformer])] =
    Seq(
      "logistic_regression" -> new LogisticRegression().setMaxIter(200),
      "decision_tree" -> new DecisionTreeClassifier().setMaxDepth(5).setSeed(seed),
      "gaussian_nb" -> new NaiveBayes().setModelType("gaussian"),
      "linear_svc" -> new LinearSVC().setMaxIter(100),
      "random_forest" -> new RandomForestClassifier().setNumTrees(100).setSeed(seed),
      "gbt" -> new GBTClassifier().setSeed(seed),
      "mlp_30_30" -> new MultilayerPerceptronClassifier()
        .setLayers(Array(numFeatures, 30, 30, 2)).setSeed(seed).setMaxIter(100))

  /** M7 — per-model metric row: accuracy / weighted P / R / F1 (+ AUC when a
    * probability/raw-prediction column exists).
    */
  def metrics(preds: DataFrame, labelCol: String, model: String): DataFrame = {
    val mc = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
    val acc = mc.setMetricName("accuracy").evaluate(preds)
    val p = mc.setMetricName("weightedPrecision").evaluate(preds)
    val r = mc.setMetricName("weightedRecall").evaluate(preds)
    val f1 = mc.setMetricName("f1").evaluate(preds)
    val auc =
      if (preds.columns.contains("rawPrediction"))
        new BinaryClassificationEvaluator()
          .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
          .setMetricName("areaUnderROC").evaluate(preds)
      else Double.NaN
    val spark = preds.sparkSession
    import spark.implicits._
    Seq((model, acc, p, r, f1, auc)).toDF("model", "accuracy", "precision", "recall", "f1", "auc")
  }

  /** A12 — confusion counts as a (label, prediction, n) frame. */
  def confusion(preds: DataFrame, labelCol: String): DataFrame =
    preds.groupBy(col(labelCol).as("label"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")

  /** Cohen's kappa — chance-corrected agreement between a label and a
    * prediction column (the inter-rater / classifier-agreement statistic
    * that accompanies a confusion matrix). One row:
    * (n, po, pe, kappa) where po = observed agreement, pe = expected
    * agreement from the row/column marginals, kappa = (po−pe)/(1−pe).
    *
    * Scale shape: two grouped counts (marginals) + one total — everything
    * after the input scan is label-cardinality-sized; the final combine is
    * a broadcast of two tiny aggregate frames. Degenerate pe = 1 (both
    * sides constant and equal) yields null kappa.
    */
  def cohensKappa(preds: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val pairs = preds.select(col(labelCol).as("_l"), col(predCol).as("_p"))
    val tot = pairs.agg(
      count(lit(1)).as("n"),
      sum(when(col("_l") === col("_p"), 1L).otherwise(0L)).as("_agree"))
    val rowMarg = pairs.groupBy(col("_l").as("_k")).agg(count(lit(1)).as("_nr"))
    val colMarg = pairs.groupBy(col("_p").as("_k")).agg(count(lit(1)).as("_nc"))
    val cross = rowMarg.join(colMarg, "_k").agg(sum(col("_nr") * col("_nc")).as("_s"))
    val po = col("_agree") / col("n")
    val pe = col("_s") / col("n") / col("n")
    tot
      .crossJoin(broadcast(cross))
      .select(
        col("n"),
        po.as("po"),
        pe.as("pe"),
        when(pe < 1.0, (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** GOLDEN-shaped scored output (乳腺癌预测.py:203-219 / 神经网络预测结果.csv):
    * per-sample id, truth, prediction, per-class probability, correctness.
    */
  def scoredOutput(preds: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    preds.select(
      col(idCol).as("sample_id"),
      col(labelCol).as("label"),
      col("prediction").cast("int").as("predicted"),
      round(p1, 6).as("p_positive"),
      round(lit(1.0) - p1, 6).as("p_negative"),
      (col(labelCol) === col("prediction").cast("int")).as("correct"))
  }

  /** M10/M7 in ORACLE-EXACT form: nearest-centroid (Rocchio / LDA with
    * identity covariance) binary scorer — class centroids are closed-form
    * per-dim means over the train split, the test margin is
    * (d²(x, c₀) − d²(x, c₁)) / 2 and the posterior its sigmoid (the exact
    * Gaussian-equal-covariance posterior). Fully deterministic, so the
    * scored table value-checks against an independent SQL oracle; the
    * fitted-model bake-off (iterative solvers, library-specific floats)
    * stays [[roster]]/[[scoredOutput]].
    *
    * Output matches scoredOutput's GOLDEN shape (sample_id, label,
    * predicted, p_positive, p_negative, correct); probabilities unrounded —
    * callers round to their oracle's precision.
    *
    * Scale shape: centroids are one aggregation (posexplode + per-dim avg,
    * 2·dim cells), broadcast as a single wide row into a narrow scoring
    * map — no shuffle of the test side. `vecCol` is an array column;
    * `labelCol` must be 0/1.
    */
  def centroidScored(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val cent = train
      .select(col(labelCol).as("_b"), posexplode(vd).as(Seq("_i", "_x")))
      .groupBy(col("_b"), col("_i"))
      .agg(avg(col("_x")).as("_c"))
      .groupBy(col("_b"))
      .agg(transform(
        array_sort(collect_list(struct(col("_i"), col("_c")))),
        s => s.getField("_c")).as("_arr"))
    // one wide row (c0, c1) — array max is a no-op selector here, each class
    // contributes exactly one non-null array. A train split missing a class
    // leaves its centroid NULL, which would silently null every margin /
    // probability / prediction downstream — fail loud instead (the
    // lloydDeterministic empty-cluster contract).
    val wide = cent
      .agg(
        max(when(col("_b") === 0, col("_arr"))).as("_c0"),
        max(when(col("_b") === 1, col("_arr"))).as("_c1"))
      .select(
        coalesce(col("_c0"), raise_error(lit(
          "centroidScored: train split contains no label=0 rows"))).as("_c0"),
        coalesce(col("_c1"), raise_error(lit(
          "centroidScored: train split contains no label=1 rows"))).as("_c1"))
    // margin via the dot-product EXPANSION (x·x − 2x·c + c·c per class),
    // not a direct Σ(x−c)² fold: the value oracle (SparkEntry q19) computes
    // this exact form with list_dot_product, and matching the algebraic
    // shape keeps the cross-engine FP divergence at ulp level instead of
    // summation-form level (round-6 ADVICE — a 6-dp rounding-boundary flake)
    def dot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, y) => acc + y)
    def d2(c: Column) = dot(vd, vd) - lit(2.0) * dot(vd, c) + dot(c, c)
    val margin = (d2(col("_c0")) - d2(col("_c1"))) / 2
    val p1 = lit(1.0) / (lit(1.0) + exp(-margin))
    test
      .crossJoin(broadcast(wide))
      .select(
        col(idCol).as("sample_id"),
        col(labelCol).as("label"),
        (margin > 0).cast("int").as("predicted"),
        p1.as("p_positive"),
        (lit(1.0) - p1).as("p_negative"),
        ((margin > 0).cast("int") === col(labelCol)).as("correct"))
  }

  /** M4/M5 — k-fold cross-validated grid search (the sklearn
    * GridSearchCV(cv=5) analog): returns (bestModel, avg metric per grid
    * point as a DataFrame). Per-fold std (the reference's cv_std) comes from
    * `collectSubModels` when requested.
    */
  def gridSearch[M <: org.apache.spark.ml.Model[M]](
      train: DataFrame,
      estimator: org.apache.spark.ml.Estimator[M],
      grid: Array[org.apache.spark.ml.param.ParamMap],
      evaluator: org.apache.spark.ml.evaluation.Evaluator,
      numFolds: Int = 5,
      seed: Long = 42L): (org.apache.spark.ml.tuning.CrossValidatorModel, DataFrame) = {
    val cv = new org.apache.spark.ml.tuning.CrossValidator()
      .setEstimator(estimator)
      .setEstimatorParamMaps(grid)
      .setEvaluator(evaluator)
      .setNumFolds(numFolds)
      .setSeed(seed)
    val model = cv.fit(train)
    val spark = train.sparkSession
    import spark.implicits._
    val rows = grid.zip(model.avgMetrics).map { case (pm, m) => (pm.toString, m) }
    (model, rows.toSeq.toDF("params", "avg_metric"))
  }

  /** M4 — explicit k-fold CV over a param grid with PER-FOLD metrics: the
    * sklearn `GridSearchCV.cv_results_` analog the reference reports as
    * cv_mean ± cv_std (乳腺癌预测.py:132,179), which Spark's CrossValidator
    * collapses into avgMetrics. Fold assignment hashes `idCol` (content-
    * keyed — deterministic under any partitioning, unlike rand()).
    *
    * Returns (perFold, summary): perFold = (params, fold, metric) with
    * numFolds rows per grid point; summary = (params, cv_mean, cv_std)
    * with cv_std the sample std over folds.
    */
  def gridSearchPerFold[M <: org.apache.spark.ml.Model[M]](
      train: DataFrame,
      idCol: String,
      estimator: org.apache.spark.ml.Estimator[M],
      grid: Array[org.apache.spark.ml.param.ParamMap],
      evaluator: org.apache.spark.ml.evaluation.Evaluator,
      numFolds: Int = 5,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    require(numFolds >= 2, s"numFolds must be >= 2, got $numFolds")
    val withFold = train
      .withColumn("_fold", pmod(xxhash64(col(idCol), lit(seed)), lit(numFolds)))
      .cache()
    // the grid×fold fits are independent — submit them as concurrent Spark
    // jobs (spark.ml's own CrossValidator.parallelism pattern; fit(ds, pm)
    // copies the estimator per call, so sharing it across threads is safe);
    // results return in (param, fold) order, identical to the loop's
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val combos = for { pm <- grid.toSeq; f <- 0 until numFolds } yield (pm, f)
    val rows =
      try {
        val futures = combos.map { case (pm, f) =>
          scala.concurrent.Future {
            val tr = withFold.filter(col("_fold") =!= f).drop("_fold")
            val te = withFold.filter(col("_fold") === f).drop("_fold")
            val model = estimator.fit(tr, pm)
            (pm.toString, f, evaluator.evaluate(model.transform(te)))
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
      } finally {
        // shutdownNow, not shutdown: on a failed fit, Future.sequence fails
        // fast but graceful shutdown would let the queued/running fits keep
        // burning the cluster (against a just-unpersisted input) as zombies;
        // on the happy path all tasks are already done and this is a no-op
        pool.shutdownNow()
        withFold.unpersist()
      }
    val spark = train.sparkSession
    import spark.implicits._
    val perFold = rows.toDF("params", "fold", "metric")
    val summary = perFold
      .groupBy("params")
      .agg(avg("metric").as("cv_mean"), stddev_samp("metric").as("cv_std"))
      // best-first respects the metric's direction (rmse asc, auc desc)
      .orderBy(if (evaluator.isLargerBetter) col("cv_mean").desc else col("cv_mean").asc)
    (perFold, summary)
  }

  /** M8 — ROC curve points (fpr, tpr) for binary predictions with a
    * probability column, via the RDD-based BinaryClassificationMetrics
    * (the only API Spark exposes for curve points).
    */
  def rocCurve(preds: DataFrame, labelCol: String): DataFrame = {
    val scoreAndLabel = preds
      .select(element_at(vector_to_array(col("probability")), 2), col(labelCol).cast("double"))
      .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    val metrics = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(scoreAndLabel)
    val spark = preds.sparkSession
    import spark.implicits._
    metrics.roc().toDF("fpr", "tpr")
  }

  /** M8, relational form — ROC points and cumulative trapezoid AUC from any
    * deterministic score column, derived purely from cumulative counts so a
    * SQL oracle reproduces every value: one threshold row per distinct
    * score, tpr/fpr = cumulative positive/negative fraction at score ≥ thr,
    * `auc_cum` the running trapezoid area (its last row is the AUC).
    *
    * Scale shape: the per-score tally is one map-side-combinable shuffle
    * over the full frame; the windows then run on the PRE-AGGREGATED
    * per-threshold frame, whose cardinality is the caller's score
    * quantization (the curve itself is the output) — quantize the score
    * (e.g. round to 2-3 dp) to bound it.
    */
  def rocPoints(preds: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = preds
      .groupBy(col(scoreCol).as("thr"))
      .agg(
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("neg"))
    val desc = Window.orderBy(col("thr").desc)
    val whole = Window.partitionBy()
    byScore
      .withColumn("tpr", sum("pos").over(desc) / sum("pos").over(whole))
      .withColumn("fpr", sum("neg").over(desc) / sum("neg").over(whole))
      .withColumn("auc_cum",
        sum((col("fpr") - lag("fpr", 1, 0.0).over(desc)) *
            (col("tpr") + lag("tpr", 1, 0.0).over(desc)) / 2).over(desc))
      .select("thr", "pos", "neg", "tpr", "fpr", "auc_cum")
  }

  /** M11 — kNN classification as a k-nearest-neighbor join: majority label of
    * the k cosine-nearest train rows. `queries`/`train` carry (id, vector,
    * [label]); the train side must be the big side — it streams; queries
    * broadcast. Fully deterministic tiebreaks: neighbor rank by (sim desc,
    * train id asc), vote by (count desc, label asc).
    *
    * Scale shape: the per-query ranking is the bounded partial top-k
    * aggregator (graft.functions.TopK) — each map task reduces its scored
    * pairs to ≤ 2k entries per query before the exchange; no full-pair
    * window shuffle. Requires an integral train id (`tId`); labels may be
    * any orderable type (they ride the aggregation as dense codes from a
    * broadcast dictionary).
    */
  def knnClassify(
      queries: DataFrame,
      train: DataFrame,
      qId: String,
      qVec: String,
      tId: String,
      tVec: String,
      labelCol: String,
      k: Int): DataFrame = {
    import graft.functions.{TopK, VectorFunctions}
    // integral-id contract enforced, not just documented: a non-numeric id
    // would cast to null and be silently dropped by the top-k null guard
    val tIdType = train.schema(tId).dataType
    require(
      Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(tIdType),
      s"knnClassify train id column '$tId' must be integral, got ${tIdType.catalogString}")
    // null labels cannot vote (they would encode to the -1 sentinel, which
    // outranks every real label in the count-tie ordering)
    val votable = train.filter(col(labelCol).isNotNull)
    // The aggregator's payload slot is a Long; a raw cast would truncate
    // fractional labels (1.5 and 1.0 merge) or null out strings. Instead
    // labels ride through dense codes assigned in label-ascending order
    // (code asc == label asc, so the vote tiebreak survives). The distinct
    // label set is contract-small (it is a classification target), so the
    // dictionary is a driver-side when-chain — no join, no window.
    val labels = votable.select(col(labelCol).as("_lab")).distinct()
      .orderBy(col("_lab")).collect().map(_.get(0))
    require(labels.nonEmpty, "knnClassify: train has no non-null labels")
    val encode = labels.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (l, i)) =>
      when(col(labelCol) === lit(l), lit((i + 1).toLong)).otherwise(acc)
    }
    val labelType = train.schema(labelCol).dataType
    val decode = labels.zipWithIndex.foldLeft(lit(null).cast(labelType)) { case (acc, (l, i)) =>
      when(col("_w.l") === lit((i + 1).toLong), lit(l)).otherwise(acc)
    }
    val scored = votable
      .withColumn("_code", encode)
      .crossJoin(broadcast(queries))
      .withColumn("_sim", VectorFunctions.cosine(col(qVec), col(tVec)))
    val votes = TopK
      .topKPerKey(scored, qId, col("_sim"), col(tId).cast("long"), col("_code"), k)
      .groupBy(col(qId), col("tag").as("_vcode"))
      .agg(count(lit(1)).as("_c"))
    // argmax by (count desc, code asc = label asc) without a window: min of
    // (-count, code) under lexicographic struct ordering.
    votes
      .groupBy(col(qId))
      .agg(min(struct((-col("_c")).as("nc"), col("_vcode").as("l"))).as("_w"))
      .select(col(qId), decode.as("predicted"))
  }
}
