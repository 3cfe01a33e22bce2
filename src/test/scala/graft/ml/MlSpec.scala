package graft.ml

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // separable 2-class blob data: class 0 near (0,0), class 1 near (4,4)
  lazy val blobs = {
    val rng = new scala.util.Random(42)
    (0 until 200).map { i =>
      val label = i % 2
      val c = label * 4.0
      (i.toLong, label, c + rng.nextGaussian(), c + rng.nextGaussian())
    }.toDF("id", "label", "x1", "x2")
  }

  test("standardize: train columns end up mean~0 / std~1") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val stats = transform(blobs)
      .select(vector_to_array(col("features")).getItem(0).as("z"))
      .agg(avg("z"), stddev_samp("z")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9)
  }

  test("stratifiedSplit: disjoint, complete, roughly proportional") {
    val (train, test) = Features.stratifiedSplit(blobs, "label", 0.7, 42L, "id")
    assert(train.join(test, "id").count() == 0)
    assert(train.count() + test.count() == 200)
    val frac = train.filter($"label" === 1).count().toDouble / train.count()
    assert(frac > 0.35 && frac < 0.65)
  }

  test("stratifiedSplitExact takes exactly ceil(n_c * frac) per class, deterministically") {
    // unbalanced classes: 120 of class 0, 80 of class 1
    val df = (0 until 200).map(i => (i.toLong, if (i < 120) 0 else 1)).toDF("id", "label")
    val (train, test) = Features.stratifiedSplitExact(df, "label", 0.7, 42L, "id")
    assert(train.join(test, "id").count() == 0)
    assert(train.count() + test.count() == 200)
    val counts = train.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 84L, s"class 0: ${counts(0)}")  // ceil(120*0.7)
    assert(counts(1) == 56L, s"class 1: ${counts(1)}")  // ceil(80*0.7)
    // deterministic: same seed -> same membership
    val (train2, _) = Features.stratifiedSplitExact(df, "label", 0.7, 42L, "id")
    assert(train.select("id").except(train2.select("id")).count() == 0)
  }

  test("rbfFeatures approximates the RBF kernel and linearizes circular data") {
    val rng = new scala.util.Random(7)
    // class 1 = inner disc (r < 1), class 0 = ring (2 < r < 3) — not
    // linearly separable in the raw 2-D space
    val rows = (0 until 400).map { i =>
      val inner = i % 2 == 1
      val r = if (inner) rng.nextDouble() else 2.0 + rng.nextDouble()
      val th = rng.nextDouble() * 2 * math.Pi
      (i.toLong, if (inner) 1.0 else 0.0, r * math.cos(th), r * math.sin(th))
    }
    val df = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(rows.toDF("id", "label", "x1", "x2"))

    // kernel approximation: z(x)·z(y) ≈ exp(-γ‖x−y‖²) on sampled pairs
    val gamma = 1.0
    val zed = Features.rbfFeatures(df, "features", "z", inputDim = 2,
      nComponents = 500, gamma = gamma, seed = 42L)
    val sample = zed.select("features", "z").limit(8).collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0), r.getAs[org.apache.spark.ml.linalg.Vector](1)))
    for { (xi, zi) <- sample; (xj, zj) <- sample } {
      val d2 = xi.toArray.zip(xj.toArray).map { case (a, b) => (a - b) * (a - b) }.sum
      val exact = math.exp(-gamma * d2)
      val approx = zi.toArray.zip(zj.toArray).map { case (a, b) => a * b }.sum
      assert(math.abs(exact - approx) < 0.15, s"kernel approx off: $exact vs $approx")
    }

    // raw LinearSVC fails on circles; LinearSVC on RFF features ≈ RBF-SVC
    def acc(frame: org.apache.spark.sql.DataFrame, feat: String): Double = {
      val m = new org.apache.spark.ml.classification.LinearSVC()
        .setFeaturesCol(feat).setMaxIter(50).fit(frame)
      val p = m.transform(frame)
      p.filter(col("prediction") === col("label")).count().toDouble / p.count()
    }
    val rawAcc = acc(df, "features")
    val rffAcc = acc(zed, "z")
    assert(rawAcc < 0.7, s"circles should defeat a linear model, acc=$rawAcc")
    assert(rffAcc > 0.9, s"RFF + linear should solve circles, acc=$rffAcc")
  }

  test("rbfFeatures + ridge fits a nonlinear regression a line cannot") {
    val pts = (0 until 300).map { i =>
      val x = i / 300.0 * 3.0
      (x, math.sin(2.0 * x))
    }
    val df = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features")
      .transform(pts.toDF("x", "label"))
    val zed = Features.rbfFeatures(df, "features", "z", inputDim = 1,
      nComponents = 200, gamma = 2.0, seed = 42L)
    def rmse(frame: org.apache.spark.sql.DataFrame, feat: String): Double = {
      val m = new org.apache.spark.ml.regression.LinearRegression()
        .setFeaturesCol(feat).setRegParam(1e-4).setMaxIter(100).fit(frame)
      m.summary.rootMeanSquaredError
    }
    assert(rmse(df, "features") > 0.4, "a line should not fit sin(2x)")
    assert(rmse(zed, "z") < 0.1, "kernel ridge via RFF should fit sin(2x)")
  }

  test("chronologicalSplit honors the cut") {
    val (tr, te) = Features.chronologicalSplit(blobs, "id", 149L)
    assert(tr.count() == 150 && te.count() == 50)
    assert(te.agg(min("id")).head().getLong(0) == 150L)
  }

  test("linear family recovers y = 2x + 3") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3.0)).toDF("x", "y")
      .select(col("y").as("label"), col("x"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features").transform(df)
    val model = Regression.linear(regParam = 0.0, elasticNetParam = 0.0).fit(assembled)
    assert(math.abs(model.coefficients(0) - 2.0) < 1e-6)
    assert(math.abs(model.intercept - 3.0) < 1e-4)
    val m = Regression.metrics(model.transform(assembled), "label", "prediction", "ols").head()
    assert(m.getDouble(1) < 1e-4)            // rmse
    assert(m.getDouble(3) > 0.999999)        // r2
  }

  test("rollingOriginCv produces k finite folds") {
    val df = (1 to 60).map(i => (i.toDouble, 3.0 * i + 1.0)).toDF("t", "label")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("t")).setOutputCol("features").transform(df)
    val out = Regression.rollingOriginCv(
      assembled, "t", "features", "label", k = 4,
      train => Regression.linear(0.0, 0.0).fit(train))
    val rows = out.collect()
    assert(rows.length == 4)
    assert(rows.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) < 1e-3))
  }

  test("classifier bake-off: logistic regression separates blobs (AUC > 0.95)") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val prepared = transform(blobs)
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(100).fit(prepared)
    val preds = model.transform(prepared)
    val m = Classification.metrics(preds, "label", "lr").head()
    assert(m.getDouble(1) > 0.95) // accuracy
    assert(m.getDouble(5) > 0.95) // auc
    val conf = Classification.confusion(preds, "label").collect()
    assert(conf.map(_.getLong(2)).sum == 200L)
  }

  test("scoredOutput has GOLDEN shape and consistent correctness flag") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val prepared = transform(blobs)
    val preds = new org.apache.spark.ml.classification.LogisticRegression()
      .fit(prepared).transform(prepared)
    val scored = Classification.scoredOutput(preds, "id", "label")
    assert(scored.columns.toSeq ==
      Seq("sample_id", "label", "predicted", "p_positive", "p_negative", "correct"))
    val bad = scored.filter(col("correct") =!= (col("label") === col("predicted"))).count()
    assert(bad == 0)
    val probSum = scored.select(abs(col("p_positive") + col("p_negative") - 1.0).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(probSum < 1e-5)
  }

  test("knnClassify predicts by neighborhood majority") {
    val train = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0), (3L, Seq(1f, 0.2f), 0),
      (4L, Seq(0f, 1f), 1), (5L, Seq(0.1f, 0.9f), 1), (6L, Seq(0.2f, 1f), 1))
      .toDF("id", "vec", "label")
    val queries = Seq((100L, Seq(1f, 0.05f)), (101L, Seq(0.05f, 1f)))
      .toDF("q_id", "q_vec")
    val out = Classification.knnClassify(queries, train, "q_id", "q_vec", "id", "vec", "label", 3)
      .orderBy("q_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((100L, 0), (101L, 1)))
  }

  test("kmeans on two blobs: silhouette > 0.5 and consistency ~ 1") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val clustered = Clustering.kmeans(transform(blobs), k = 2, seed = 42L)
    assert(Clustering.silhouette(clustered) > 0.5)
    val cons = Clustering.consistency(clustered.withColumn("g", col("label") === 1), "g")
    assert(cons > 0.95)
  }

  test("lloydDeterministic separates the blobs and is run-to-run identical") {
    val arr = blobs.withColumn("vec", array(col("x1"), col("x2")))
    def run() = Clustering.lloydDeterministic(arr, "id", "vec", Seq(0L, 1L), iters = 3)
    val (assigned, cents) = run()
    // seeds 0/1 sit one per blob (label = id % 2) — 3 Lloyd iterations must
    // recover the blob split on clearly separable data
    val cons = Clustering.consistency(assigned.withColumn("g", col("label") === 1), "g")
    assert(cons > 0.95)
    assert(cents.length == 2 && cents.forall(_.length == 2))
    // deterministic: the full assignment (not just the summary) repeats
    val a1 = assigned.select("id", "prediction").orderBy("id").collect().toSeq
    val a2 = run()._1.select("id", "prediction").orderBy("id").collect().toSeq
    assert(a1 == a2)
    // dist2 really is the squared distance to each FINAL centroid
    val r = assigned.filter(col("id") === 7L)
      .select(col("x1"), col("x2"), col("dist2")).head()
    val d2 = r.getSeq[Double](2)
    val exp = cents.map(c =>
      math.pow(r.getDouble(0) - c(0), 2) + math.pow(r.getDouble(1) - c(1), 2))
    assert(d2.zip(exp).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("lloydDeterministic fails loud on a missing seed id") {
    val arr = blobs.withColumn("vec", array(col("x1"), col("x2")))
    val e = intercept[RuntimeException] {
      Clustering.lloydDeterministic(arr, "id", "vec", Seq(0L, 999999L), iters = 1)
    }
    assert(e.getMessage.contains("seed id"))
  }

  test("centroidScored: closed-form posterior separates the blobs, GOLDEN shape") {
    val arr = blobs.withColumn("vec", array(col("x1"), col("x2")))
    val (test_, train) = Features.chronologicalSplit(arr, "id", 149L)
    val scored = Classification.centroidScored(train, test_, "id", "vec", "label")
    assert(scored.columns.toSeq ==
      Seq("sample_id", "label", "predicted", "p_positive", "p_negative", "correct"))
    val rows = scored.collect()
    assert(rows.length == 150)
    // well-separated blobs: the centroid scorer is near-perfect
    assert(rows.count(_.getAs[Boolean]("correct")).toDouble / rows.length > 0.95)
    // probabilities are complementary and the flags are internally consistent
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("p_positive") + r.getAs[Double]("p_negative") - 1.0) < 1e-9)
      val predicted = if (r.getAs[Double]("p_positive") > 0.5) 1 else 0
      assert(r.getAs[Int]("predicted") == predicted)
      assert(r.getAs[Boolean]("correct") == (r.getAs[Int]("label") == predicted))
    }
  }

  test("bisecting kmeans (Ward substitute) also separates the blobs") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val clustered = Clustering.bisectingKmeans(transform(blobs), k = 2, seed = 42L)
    val cons = Clustering.consistency(clustered.withColumn("g", col("label") === 1), "g")
    assert(cons > 0.95)
  }

  test("pca: explained variance ratios are sane and ordered") {
    val df = (1 to 100).map { i =>
      val x = i.toDouble
      (x, 2 * x + 0.01 * (i % 7), 0.1 * (i % 3))
    }.toDF("a", "b", "c")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("a", "b", "c")).setOutputCol("features").transform(df)
    val (_, ev) = Clustering.pca(assembled, 2)
    assert(ev.length == 2)
    assert(ev(0) > 0.9, s"first component should dominate, got ${ev.toSeq}")
    assert(ev(0) >= ev(1) && ev.sum <= 1.0 + 1e-9)
  }

  test("balancedSample keeps classes balanced") {
    val s = Features.balancedSample(blobs, "label", 0.4, 7L)
    val counts = s.groupBy("label").count().collect().map(_.getLong(1))
    assert(counts.length == 2 && math.abs(counts(0) - counts(1)) < 25)
  }
}

class MlTuningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val blobs = {
    val rng = new scala.util.Random(7)
    (0 until 120).map { i =>
      val label = i % 2
      val c = label * 4.0
      (i.toLong, label, c + rng.nextGaussian(), c + rng.nextGaussian())
    }.toDF("id", "label", "x1", "x2")
  }

  test("gridSearch picks a regParam and reports per-point avg metrics") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val prepared = transform(blobs)
    val lr = new org.apache.spark.ml.classification.LogisticRegression().setMaxIter(50)
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.1, 1.0)).build()
    val ev = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
    val (model, metrics) = Classification.gridSearch(prepared, lr, grid, ev, numFolds = 3)
    assert(metrics.count() == 3)
    assert(metrics.agg(org.apache.spark.sql.functions.max("avg_metric"))
      .head().getDouble(0) > 0.9)
    assert(model.bestModel.isInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel])
  }

  test("gridSearchPerFold returns k rows per grid point and a mean/std summary") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val prepared = transform(blobs)
    val lr = new org.apache.spark.ml.classification.LogisticRegression().setMaxIter(50)
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 1.0)).build()
    val ev = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
    val (perFold, summary) =
      Classification.gridSearchPerFold(prepared, "id", lr, grid, ev, numFolds = 3)
    val counts = perFold.groupBy("params").count().collect()
    assert(counts.length == 2 && counts.forall(_.getLong(1) == 3L))
    assert(perFold.select("fold").distinct().count() == 3)
    val s = summary.collect()
    assert(s.length == 2)
    // cv_mean/cv_std finite; the separable blobs give a high best mean
    assert(s.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
    assert(s.map(_.getDouble(1)).max > 0.9)
    // summary mean equals the per-fold average (exactly: same doubles)
    val pf = perFold.collect().groupBy(_.getString(0)).view.mapValues(
      rs => rs.map(_.getDouble(2)).sum / rs.length).toMap
    s.foreach(r => assert(math.abs(r.getDouble(1) - pf(r.getString(0))) < 1e-12))
  }

  test("wardLinkage merges nearest pairs first with monotone heights") {
    // two tight pairs far apart: (0,1) and (2,3) merge before the top join
    val pts = Array(
      Array(0.0, 0.0), Array(0.1, 0.0),
      Array(10.0, 0.0), Array(10.1, 0.0))
    val linkage = Clustering.wardLinkage(pts)
    assert(linkage.length == 3)
    val heights = linkage.map(_._4)
    assert(heights == heights.sorted, s"non-monotone ward heights: $heights")
    // first two merges are the tight pairs, sizes accumulate to n
    assert(Set(linkage(0), linkage(1)).map(l => Set(l._2, l._3)) == Set(Set(0, 1), Set(2, 3)))
    assert(linkage.last._5 == 4)
  }

  test("rocCurve starts near (0,0) and ends at (1,1)") {
    val (_, transform) = Features.standardize(blobs, Seq("x1", "x2"))
    val prepared = transform(blobs)
    val preds = new org.apache.spark.ml.classification.LogisticRegression()
      .fit(prepared).transform(prepared)
    val roc = Classification.rocCurve(preds, "label").collect()
    assert(roc.length > 2)
    assert(roc.head.getDouble(0) == 0.0)
    assert(roc.last.getDouble(0) == 1.0 && roc.last.getDouble(1) == 1.0)
  }

  test("metricsRelational equals the evaluator-based metrics per group") {
    val df = (1 to 80).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, i.toDouble, i.toDouble + (i % 5) - 2.0)
    }.toDF("g", "label", "pred")
    val rel = Regression.metricsRelational(df, "label", "pred", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    for (g <- Seq("a", "b")) {
      val sub = df.filter(col("g") === g)
      val m = Regression.metrics(sub, "label", "pred", g).head()
      val (rmse, mae, r2, mape) = rel(g)
      assert(math.abs(rmse - m.getDouble(1)) < 1e-9, s"rmse $g")
      assert(math.abs(mae - m.getDouble(2)) < 1e-9, s"mae $g")
      assert(math.abs(r2 - m.getDouble(3)) < 1e-9, s"r2 $g")
      assert(math.abs(mape - m.getDouble(4)) < 1e-9, s"mape $g")
    }
  }

  test("rocPoints: tpr/fpr cumulative, final auc_cum equals mllib AUC") {
    // deterministic integer scores with ties across both classes
    val rows = Seq(
      (0.9, 1), (0.9, 1), (0.8, 0), (0.7, 1), (0.7, 0),
      (0.5, 1), (0.5, 0), (0.3, 0), (0.3, 0), (0.1, 0))
    val df = rows.toDF("score", "label")
    val pts = Classification.rocPoints(df, "score", "label")
      .orderBy(col("thr").desc).collect()
    assert(pts.map(_.getDouble(0)).toSeq == Seq(0.9, 0.8, 0.7, 0.5, 0.3, 0.1))
    // last point is (fpr=1, tpr=1); auc_cum there is the full AUC
    assert(pts.last.getDouble(3) == 1.0 && pts.last.getDouble(4) == 1.0)
    val mllibAuc = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
      df.rdd.map(r => (r.getDouble(0), r.getInt(1).toDouble))).areaUnderROC()
    assert(math.abs(pts.last.getDouble(5) - mllibAuc) < 1e-12)
    // monotone non-decreasing curve
    val tprs = pts.map(_.getDouble(3)).toSeq
    val fprs = pts.map(_.getDouble(4)).toSeq
    assert(tprs == tprs.sorted && fprs == fprs.sorted)
  }

  test("cohensKappa matches the hand-computed 2x2 agreement table") {
    // raters: 20 yes/yes, 5 yes/no, 10 no/yes, 15 no/no (classic example)
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Classification.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    val n = 50.0
    val po = 35.0 / n
    val pe = (25.0 * 30.0 + 25.0 * 20.0) / (n * n)
    assert(r.getLong(0) == 50L)
    assert(math.abs(r.getDouble(1) - po) < 1e-12)
    assert(math.abs(r.getDouble(2) - pe) < 1e-12)
    assert(math.abs(r.getDouble(3) - (po - pe) / (1 - pe)) < 1e-12)
  }

  test("cohensKappa: perfect agreement 1.0, constant-equal raters null") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("l", "p")
    val k1 = Classification.cohensKappa(perfect, "l", "p").head()
    assert(math.abs(k1.getDouble(3) - 1.0) < 1e-12)
    val degen = Seq(("a", "a"), ("a", "a")).toDF("l", "p")
    assert(Classification.cohensKappa(degen, "l", "p").head().isNullAt(3))
  }
}
