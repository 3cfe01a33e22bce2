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

  def kmeans(df: DataFrame, k: Int, seed: Long, featuresCol: String = "features"): DataFrame =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol(featuresCol)
      .fit(df).transform(df)

  /** BisectingKMeans splits a node by perturbing the parent center
    * proportionally to its NORM — on mean-centered (standardized) input the
    * root center is the origin, the perturbation is zero, and the tree never
    * splits (observed: k=1 on trivially separable blobs). K-means clustering
    * is translation-invariant, so shift every coordinate by a constant
    * before fitting; predictions attach to the original rows.
    */
  def bisectingKmeans(df: DataFrame, k: Int, seed: Long, featuresCol: String = "features"): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val shifted = df.withColumn(
      "_bkm_features",
      array_to_vector(transform(vector_to_array(col(featuresCol)), x => x + lit(1.2345))))
    new BisectingKMeans().setK(k).setSeed(seed).setFeaturesCol("_bkm_features")
      .fit(shifted).transform(shifted).drop("_bkm_features")
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
