package graft.ml

import org.apache.spark.ml.clustering.{BisectingKMeans, KMeans}
import org.apache.spark.ml.evaluation.ClusteringEvaluator
import org.apache.spark.ml.feature.PCA
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering / decomposition recipes (SURVEY.md §2.9 M19–M23, A11): the HLM
  * stylometry tail re-expressed on spark.ml. Ward hierarchical clustering has
  * no spark.ml analog — `BisectingKMeans` (divisive hierarchical) is the
  * documented substitute (红楼梦作者分析.py:163-165).
  */
object Clustering {

  /** Per-group mean vector (class centroids / per-lang embedding means) via
    * `Summarizer.mean` — a single aggregation pass whatever the dimension
    * (partial per-partition sums, one shuffle on the group key), where the
    * posexplode-then-avg alternative shuffles n·d rows. Returns
    * (groupCol, n, centroid: vector).
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.ml.stat.Summarizer
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), Summarizer.mean(col(vecCol)).as("centroid"))
  }

  def kmeans(df: DataFrame, k: Int, seed: Long, featuresCol: String = "features"): DataFrame =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol(featuresCol)
      .fit(df).transform(df)

  /** M19 in ORACLE-EXACT form: Lloyd's k-means with caller-pinned seed rows
    * and a FIXED iteration count — every step is closed-form (assign = argmin
    * squared Euclidean distance with first-index tiebreak, update = per-dim
    * mean), so any engine unrolling the same `iters` from the same seeds
    * reproduces the assignment bit-for-bit. This is what lets a k-means
    * query be value-checked against an independent SQL oracle; the
    * production path (k-means|| init, convergence-based stop) stays
    * [[kmeans]].
    *
    * Scale shape: per iteration, one narrow map (distances against k·dim
    * broadcast literals — no join) + one aggregation whose partial state is
    * k·dim per partition (`Summarizer.mean`); only the k×dim centroid table
    * ever reaches the driver. `vecCol` is an array column; ids must be
    * long-castable.
    *
    * Returns the input frame + `prediction` (int cluster, assigned against
    * the FINAL centroids) + `dist2` (squared distance to every centroid,
    * k-array), and the final centroids.
    */
  def lloydDeterministic(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      seedIds: Seq[Long],
      iters: Int,
      pin: graft.operators.Pin = graft.operators.Pin.LocalCheckpoint): (DataFrame, Array[Array[Double]]) = {
    require(seedIds.nonEmpty && iters >= 1, "need >= 1 seed and >= 1 iteration")
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    val vd = transform(col(vecCol), x => x.cast("double"))
    // pin: the loop drives iters + 2 driver actions over this frame (seed
    // collect, one aggregate per iteration, the final assignment) — without
    // it every action re-scans the source and recomputes the cast
    val base = pin(df.withColumn("_vd", vd))

    val seedRows = base
      .filter(col(idCol).cast("long").isin(seedIds: _*))
      .select(col(idCol).cast("long").as("_id"), col("_vd"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    var cents: Array[Array[Double]] = seedIds.toArray.map { id =>
      seedRows.getOrElse(id, sys.error(s"lloydDeterministic: seed id $id not found"))
    }
    val k = cents.length

    def dist2Arr(cs: Array[Array[Double]]) = array(cs.toIndexedSeq.map { c =>
      aggregate(
        zip_with(col("_vd"), typedLit(c.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, y) => acc + y)
    }: _*)
    // argmin with FIRST-index tiebreak (exact-equality ties go to the lower
    // cluster id — the same (d2, k) ordering an oracle's row_number uses)
    def assignExpr(cs: Array[Array[Double]]) = {
      val d = dist2Arr(cs)
      (array_position(d, array_min(d)) - 1).cast("int")
    }

    for (_ <- 1 to iters) {
      val cells = base
        .groupBy(assignExpr(cents).as("_k"))
        .agg(Summarizer.mean(array_to_vector(col("_vd"))).as("_c"))
        .select(col("_k"), vector_to_array(col("_c")).as("_c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // an empty cluster has no closed-form update — fail loud rather than
      // silently diverge from an oracle that can't see the degeneracy
      cents = Array.tabulate(k)(j =>
        cells.getOrElse(j, sys.error(s"lloydDeterministic: cluster $j went empty")))
    }

    val out = base
      .withColumn("dist2", dist2Arr(cents))
      .withColumn("prediction",
        (array_position(col("dist2"), array_min(col("dist2"))) - 1).cast("int"))
      .drop("_vd")
    (out, cents)
  }

  /** M19 with the reference's n_init semantics (红楼梦作者分析.py:176-178,
    * sklearn KMeans(n_init=10)): fit `nInit` seeded inits and keep the one
    * with the lowest within-cluster SSE (trainingCost). The inits are
    * independent, so they submit as CONCURRENT Spark jobs (a single fit
    * never saturates the executors — same reasoning as rollingOriginCv);
    * results come back in seed order, so the min-cost selection (first
    * winner on ties) is identical to the sequential loop's.
    */
  def kmeansBestOf(
      df: DataFrame,
      k: Int,
      nInit: Int,
      baseSeed: Long = 42L,
      featuresCol: String = "features"): DataFrame = {
    require(nInit > 0, s"kmeansBestOf needs at least one init, got $nInit")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(nInit, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val best =
      try {
        val fits = (0 until nInit).map { i =>
          scala.concurrent.Future {
            new KMeans().setK(k).setSeed(baseSeed + i).setFeaturesCol(featuresCol).fit(df)
          }
        }
        scala.concurrent.Await
          .result(
            scala.concurrent.Future.sequence(fits),
            scala.concurrent.duration.Duration.Inf)
          .minBy(_.summary.trainingCost)
      } finally pool.shutdown()
    best.transform(df)
  }

  /** BisectingKMeans splits a node by perturbing the parent center
    * proportionally to its NORM — on mean-centered (standardized) input the
    * root center is the origin, the perturbation is zero, and the tree never
    * splits (observed: k=1 on trivially separable blobs). K-means clustering
    * is translation-invariant, so shift every coordinate by a constant
    * before fitting; predictions attach to the original rows.
    */
  def bisectingKmeans(df: DataFrame, k: Int, seed: Long, featuresCol: String = "features"): DataFrame =
    bisectingKmeansWithCentroids(df, k, seed, featuresCol)._1

  /** As `bisectingKmeans`, but also returns the fitted cluster centers
    * (shifted back into the caller's coordinate space) for driver-side
    * hierarchy analysis — see `wardLinkage`.
    */
  def bisectingKmeansWithCentroids(
      df: DataFrame,
      k: Int,
      seed: Long,
      featuresCol: String = "features"): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val shifted = df.withColumn(
      "_bkm_features",
      array_to_vector(transform(vector_to_array(col(featuresCol)), x => x + lit(1.2345))))
    val model = new BisectingKMeans().setK(k).setSeed(seed).setFeaturesCol("_bkm_features")
      .fit(shifted)
    val centers = model.clusterCenters.map(_.toArray.map(_ - 1.2345))
    (model.transform(shifted).drop("_bkm_features"), centers)
  }

  /** M20 — Ward agglomerative linkage computed driver-side over a small
    * point set (the collected BisectingKMeans centroids — the scalable
    * substitute for the reference's scipy `linkage(X, 'ward')` over all
    * rows, 红楼梦作者分析.py:297-299: cluster distributed first, dendrogram on
    * the k centroids). Lance-Williams recurrence on squared Euclidean
    * distances; merge heights are √d² (monotone non-decreasing for Ward).
    *
    * Returns scipy-linkage-shaped rows (step, left, right, height, size):
    * original points are ids 0..n-1, the cluster born at step s gets id
    * n+s, `size` is the merged cluster's member count.
    */
  def wardLinkage(points: Array[Array[Double]]): Seq[(Int, Int, Int, Double, Int)] = {
    val n = points.length
    require(n >= 2, s"ward linkage needs >= 2 points, got $n")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // active cluster state: id -> (lance-williams distance map handled via
    // a mutable matrix over original slots)
    val ids = Array.range(0, n) // current cluster id occupying slot i (-1 = dead)
    val size = Array.fill(n)(1)
    val dist = Array.tabulate(n, n)((i, j) => d2(points(i), points(j)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double, Int)]
    var nextId = n
    for (step <- 0 until n - 1) {
      // find the closest active pair (deterministic tiebreak by slot order)
      var bi = -1; var bj = -1; var bd = Double.MaxValue
      for (i <- 0 until n if ids(i) >= 0; j <- i + 1 until n if ids(j) >= 0)
        if (dist(i)(j) < bd) { bd = dist(i)(j); bi = i; bj = j }
      val (idI, idJ) = (math.min(ids(bi), ids(bj)), math.max(ids(bi), ids(bj)))
      val merged = size(bi) + size(bj)
      out += ((step, idI, idJ, math.sqrt(bd), merged))
      // Lance-Williams Ward update against every other active cluster
      for (m <- 0 until n if m != bi && m != bj && ids(m) >= 0) {
        val nm = size(m).toDouble
        val upd = ((size(bi) + nm) * dist(math.min(m, bi))(math.max(m, bi)) +
          (size(bj) + nm) * dist(math.min(m, bj))(math.max(m, bj)) -
          nm * bd) / (merged + nm)
        dist(math.min(m, bi))(math.max(m, bi)) = upd
      }
      ids(bi) = nextId; nextId += 1
      size(bi) = merged
      ids(bj) = -1
    }
    out.toSeq
  }

  /** M22 — silhouette (squared-Euclidean) over a clustered frame. */
  def silhouette(clustered: DataFrame, featuresCol: String = "features"): Double =
    new ClusteringEvaluator().setFeaturesCol(featuresCol)
      .setPredictionCol("prediction").evaluate(clustered)

  /** M23 — PCA projection + explained variance. Returns (projected frame,
    * per-component explained-variance ratios).
    */
  def pca(df: DataFrame, k: Int, featuresCol: String = "features"): (DataFrame, Array[Double]) = {
    val model = new PCA().setK(k).setInputCol(featuresCol).setOutputCol("pca_features").fit(df)
    (model.transform(df), model.explainedVariance.toArray)
  }

  /** A11 — cluster-vs-known-split consistency (红楼梦作者分析.py:335-349): for a
    * 2-way clustering and a boolean reference split, the fraction of rows
    * explained by the best of the two cluster↔group orientations.
    */
  def consistency(clustered: DataFrame, groupCol: String): Double = {
    val cells = clustered
      .groupBy(col("prediction"), col(groupCol).cast("boolean").as("g"))
      .count()
      .collect()
      .map(r => ((r.getInt(0), r.getBoolean(1)), r.getLong(2)))
      .toMap
      .withDefaultValue(0L)
    val n = cells.values.sum.toDouble
    val orient1 = cells((0, true)) + cells((1, false))
    val orient2 = cells((0, false)) + cells((1, true))
    math.max(orient1, orient2) / n
  }
}
