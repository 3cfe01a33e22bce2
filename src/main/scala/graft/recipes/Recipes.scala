package graft.recipes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.{TextFunctions => TF}
import graft.mining.Association
import graft.ml.{Classification, Clustering, Features, Regression}
import graft.operators.{Dedup, Reshape, WindowOps}
import graft.text.Stylometry

/** End-to-end reproductions of the five reference workloads over TESTDATA
  * analogs (SURVEY.md §3): each recipe is the full pipeline a user of the
  * reference runs today, re-expressed on the engine's operators. Every
  * recipe returns its result tables as DataFrames (the reference's printed
  * tables / saved CSVs).
  */
object Recipes {

  /** VEG (蔬菜价格相关性分析.py `main`, SURVEY §3.1): dedup → pivot → adjacent-day
    * trend encoding → transactions → frequent itemsets + association rules.
    */
  def vegetableTrends(
      spark: SparkSession,
      dir: String,
      band: Double = 0.05,
      minSupport: Double = 0.15,
      minConfidence: Double = 0.6): Map[String, DataFrame] = {
    val ev = Engine.table(spark, dir, "events")
    // keep-last dedup per (day, type) analog of drop_duplicates(keep='last')
    val deduped = Dedup.keepLast(
      ev.withColumn("d", to_date(col("ts"))),
      Seq("d", "event_type"), Seq(col("ts"), col("event_id")))
    // pivot: daily price table (VEG pivot_table aggfunc='first' analog uses
    // the deduped single row per key, so first == the value)
    val pivoted = Reshape.pivotAgg(
      deduped, "d", "event_type",
      Seq("click", "error", "purchase", "signup", "view"), first(col("value")))
    // trend encode per type over days (lead compare + discretize)
    val daily = ev.groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(avg(col("value")).as("v"))
    val w = WindowOps.spec(Seq("event_type"), Seq(col("d")))
    val trends = WindowOps.trendLabel(daily, w, "v", band)
      .filter(col("trend").isNotNull)
      .withColumn("item", concat_ws("_", col("event_type"), col("trend")))
    val tx = trends.groupBy(col("d")).agg(array_sort(collect_set(col("item"))).as("items"))
    val model = Association.fpgrowth(tx, "items", minSupport, minConfidence)
    val rules = Association.rules(model)
    val ruleStats = rules.agg(
      count(lit(1)).as("n_rules"),
      min("confidence").as("min_conf"), max("confidence").as("max_conf"),
      avg("confidence").as("avg_conf"), min("lift").as("min_lift"),
      max("lift").as("max_lift"), avg("lift").as("avg_lift"))
    Map(
      "pivoted" -> pivoted,
      "transactions" -> tx,
      "itemsets" -> model.freqItemsets,
      "rules" -> rules,
      "rule_stats" -> ruleStats)
  }

  /** COVID (新冠疫情分析.py, SURVEY §3.2): daily series → 16 window features →
    * chronological split → standardize → linear family + GBT → metric table
    * → best model by test RMSE.
    */
  def timeSeriesRegression(spark: SparkSession, dir: String, testDays: Int = 7): Map[String, DataFrame] = {
    import org.apache.spark.ml.feature.VectorAssembler
    val daily = Engine.table(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n_events"), avg(col("value")).as("avg_value"))
      .withColumn("day_num", datediff(col("d"), lit("2024-01-01")).cast("double"))
    val w = WindowOps.spec(Seq.empty, Seq(col("day_num")))
    var feat = WindowOps.lagFeatures(daily, w, Seq("n_events", "avg_value"), Seq(1, 3, 7))
    feat = WindowOps.trailingMean(WindowOps.trailingMean(feat, w, "n_events", 3), w, "n_events", 7)
    feat = WindowOps.laggedPctChange(feat, w, "n_events")
    feat = WindowOps.laggedDiff(WindowOps.laggedDiff(feat, w, "n_events", 1), w, "n_events", 7)
    val clean = feat.na.fill(0.0)
    val featureCols = clean.columns.filterNot(Seq("d", "n_events").contains).toSeq
    val maxDay = clean.agg(max("day_num")).head().getDouble(0)
    val (train, test) = Features.chronologicalSplit(clean, "day_num", maxDay - testDays)
    val (_, scale) = Features.standardize(train, featureCols)
    val (trainS, testS) = (scale(train).withColumnRenamed("n_events", "label"),
      scale(test).withColumnRenamed("n_events", "label"))
    val models = Seq(
      "ridge" -> Regression.linear(1.0, 0.0),
      "lasso" -> Regression.linear(0.1, 1.0),
      "elastic_net" -> Regression.linear(0.1, 0.5))
    val fitted = models.map { case (name, est) => name -> est.fit(trainS) } :+
      ("gbt" -> null) // GBT fit separately (different estimator type)
    val gbtModel = Regression.gbt(seed = 42L, maxDepth = 3, maxIter = 20).fit(trainS)
    val metricRows = fitted.collect { case (name, m) if m != null =>
      Regression.metrics(m.transform(testS), "label", "prediction", name)
    } :+ Regression.metrics(gbtModel.transform(testS), "label", "prediction", "gbt")
    val metrics = metricRows.reduce(_ union _)
    val best = metrics.orderBy(col("rmse")).limit(1)
    Map("features" -> clean, "metrics" -> metrics, "best_model" -> best)
  }

  /** CANCER (乳腺癌预测.py, SURVEY §3.3): binary labels → stratified split →
    * standardize → multi-classifier bake-off → metric table + best model +
    * GOLDEN-shaped scored output.
    */
  def classifierBakeOff(
      spark: SparkSession,
      dir: String,
      modelNames: Seq[String] = Seq("logistic_regression", "decision_tree", "random_forest")): Map[String, DataFrame] = {
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Engine.table(spark, dir, "embeddings")
      .withColumn("label", (col("label") >= 5).cast("int"))
      .withColumn("f_raw", array_to_vector(col("embedding").cast("array<double>")))
    val (train, test) = Features.stratifiedSplit(emb, "label", 0.7, seed = 42L, idCol = "vec_id")
    val dim = 64
    val roster = Classification.roster(seed = 42L, numFeatures = dim)
      .filter { case (n, _) => modelNames.contains(n) }
    val results = roster.map { case (name, est) =>
      val estimator = est.asInstanceOf[org.apache.spark.ml.Estimator[_]]
      // all roster members read featuresCol "features"
      val prepTrain = train.withColumnRenamed("f_raw", "features")
      val prepTest = test.withColumnRenamed("f_raw", "features")
      val model = estimator.fit(prepTrain).asInstanceOf[org.apache.spark.ml.Transformer]
      name -> model.transform(prepTest)
    }
    val metrics = results.map { case (n, preds) => Classification.metrics(preds, "label", n) }
      .reduce(_ union _)
    val best = metrics.orderBy(col("accuracy").desc).limit(1)
    val bestName = best.head().getString(0)
    val scored = Classification.scoredOutput(
      results.toMap.apply(bestName), "vec_id", "label")
    val confusion = Classification.confusion(results.toMap.apply(bestName), "label")
    Map("metrics" -> metrics, "best_model" -> best, "scored" -> scored, "confusion" -> confusion)
  }

  /** HLM (红楼梦作者分析.py, SURVEY §0/Phase 4): function-word features →
    * standardize → PCA → KMeans + BisectingKMeans → silhouette/consistency
    * + discriminating-word rankings.
    */
  def stylometryClustering(
      spark: SparkSession,
      dir: String,
      words: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")): Map[String, DataFrame] = {
    val docs = Engine.table(spark, dir, "documents")
    val feats = Stylometry.functionWordFeatures(docs, "doc_id", "text", words)
    val featureCols = words.indices.map(i => s"w_$i")
    val (_, scale) = Features.standardize(feats, featureCols)
    val scaled = scale(feats).cache()
    val (projected, ev) = Clustering.pca(scaled, k = 2)
    // n_init=10 best-of-seeds, the reference's KMeans(n_init=10)
    // (红楼梦作者分析.py:176-178)
    val clustered = Clustering.kmeansBestOf(scaled, k = 2, nInit = 10, baseSeed = 42L).cache()
    val sil = Clustering.silhouette(clustered)
    val cons = Clustering.consistency(
      clustered.withColumn("g", col("doc_id") % 2 === 0), "g")
    import spark.implicits._
    val summary = Seq((sil, cons, ev.headOption.getOrElse(Double.NaN)))
      .toDF("silhouette", "consistency_vs_even_split", "pc1_explained_variance")
    val topVar = Stylometry.varianceTopK(feats, featureCols, k = 5)
    val contrast = Stylometry.groupContrast(feats, col("doc_id") % 2 === 0, featureCols)
    // Ward dendrogram skeleton (红楼梦作者分析.py:297-299): distributed
    // BisectingKMeans to k=8 centroids, scipy-shaped Ward linkage on the
    // collected centroids driver-side.
    val (_, centroids) = Clustering.bisectingKmeansWithCentroids(scaled, k = 8, seed = 42L)
    val linkage = Clustering.wardLinkage(centroids)
      .toDF("step", "left", "right", "height", "size")
    Map(
      "features" -> feats,
      "pca_projection" -> projected.select("doc_id", "pca_features"),
      "clusters" -> clustered.select("doc_id", "prediction"),
      "summary" -> summary,
      "top_variance_words" -> topVar,
      "group_contrast" -> contrast,
      "ward_linkage" -> linkage)
  }

  /** HLM DBSCAN parameter sweep (红楼梦作者分析.py:189-220): eps × minPts grid
    * over 2-D points, one selection table row per combo — cluster count,
    * noise count, silhouette (squared-Euclidean over non-noise points,
    * NaN unless ≥ 2 clusters survive) — with `selected` marking the
    * reference's pick: best silhouette when any combo produced one, else
    * the combo clustering the most points (fewest noise).
    */
  def dbscanGrid(
      points: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      epsGrid: Seq[Double],
      minPtsGrid: Seq[Int]): DataFrame = {
    import graft.ml.Dbscan
    import org.apache.spark.ml.evaluation.ClusteringEvaluator
    import org.apache.spark.ml.feature.VectorAssembler
    val spark = points.sparkSession
    val pts = points.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).cache()
    val rows = for (eps <- epsGrid; mp <- minPtsGrid) yield {
      val labels = Dbscan.fit(pts, "id", "x", "y", eps, mp).cache()
      val nClusters = labels.filter(col("cluster") =!= -1).select("cluster").distinct().count()
      val nNoise = labels.filter(col("cluster") === -1).count()
      val sil =
        if (nClusters >= 2) {
          val assembled = new VectorAssembler()
            .setInputCols(Array("x", "y")).setOutputCol("features")
            .transform(pts.join(labels.filter(col("cluster") =!= -1), Seq("id")))
            .withColumn("cluster", col("cluster").cast("int"))
          new ClusteringEvaluator()
            .setFeaturesCol("features").setPredictionCol("cluster")
            .evaluate(assembled)
        } else Double.NaN
      labels.unpersist()
      (eps, mp, nClusters, nNoise, sil)
    }
    pts.unpersist()
    val withSil = rows.filter(r => !r._5.isNaN)
    val pick =
      if (withSil.nonEmpty) { val b = withSil.maxBy(_._5); (b._1, b._2) }
      else { val b = rows.minBy(_._4); (b._1, b._2) }
    import spark.implicits._
    rows
      .map { case (eps, mp, nc, nn, sil) =>
        (eps, mp, nc, nn, sil, (eps, mp) == pick)
      }
      .toDF("eps", "min_pts", "n_clusters", "n_noise", "silhouette", "selected")
  }

  /** CATDOG (猫狗大战分类.py, SURVEY §3 data plane): binary scan → label from
    * filename → balanced subsample → decode → batched inference → sorted
    * submission table.
    */
  def imagePipeline(spark: SparkSession, mediaDir: String, sampleFraction: Double = 1.0): Map[String, DataFrame] = {
    import graft.multimodal.Multimodal
    import graft.sources.Sources
    val files = Sources.binaryDir(spark, mediaDir, "*.jpg")
      .withColumn("label", when(col("filename").startsWith("cat"), 0).otherwise(1))
      .withColumn("id", regexp_extract(col("filename"), "\\.(\\d+)\\.", 1).cast("long"))
    val sampled =
      if (sampleFraction >= 1.0) files
      else Features.balancedSample(files, "label", sampleFraction, seed = 42L)
    val media = Multimodal.decode(spark, sampled, featureDim = 16)
    val scored = Multimodal.scorePartitions(spark, media).toDF()
    val submission = scored
      .join(files.select("path", "id"), "path")
      .select(col("id"), when(col("label") === "dog", 1).otherwise(0).as("prediction"),
        round(col("score"), 6).as("score"))
      .orderBy("id")
    val dist = scored.groupBy("label").count()
    Map("submission" -> submission, "prediction_distribution" -> dist)
  }
}
