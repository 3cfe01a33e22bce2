package graft.ml

import org.apache.spark.ml.feature.{StandardScaler, StandardScalerModel, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering recipes (SURVEY.md §2.9 M1–M3, M26).
  *
  * The reference's sklearn preprocessing (StandardScaler fit on train /
  * transform both, 乳腺癌预测.py:93-95; stratified and chronological splits)
  * re-expressed on spark.ml. All splits are seeded and deterministic.
  */
object Features {

  /** M1 — assemble `cols` into a vector column and standardize (mean 0/std 1)
    * fitting ONLY on `fit` (train) and transforming any frame via the
    * returned model — the fit-on-train discipline the reference follows.
    */
  def standardize(
      fit: DataFrame,
      cols: Seq[String],
      outputCol: String = "features"): (StandardScalerModel, DataFrame => DataFrame) = {
    val assembler = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("_raw")
    val scaler = new StandardScaler()
      .setInputCol("_raw")
      .setOutputCol(outputCol)
      .setWithMean(true)
      .setWithStd(true)
    val model = scaler.fit(assembler.transform(fit))
    (model, df => model.transform(assembler.transform(df)).drop("_raw"))
  }

  /** M2 — stratified train/test split: per-label sampling at `trainFraction`
    * (seeded) + anti-join for the complement. Matches sklearn
    * `train_test_split(stratify=y)` semantics up to sampling granularity.
    */
  def stratifiedSplit(
      df: DataFrame,
      labelCol: String,
      trainFraction: Double,
      seed: Long,
      idCol: String): (DataFrame, DataFrame) = {
    val labels = df.select(labelCol).distinct().collect().map(_.get(0))
    val fractions = labels.map(_ -> trainFraction).toMap
    val train = df.stat.sampleBy(labelCol, fractions, seed)
    val test = df.join(train.select(idCol), Seq(idCol), "left_anti")
    (train, test)
  }

  /** M3 — chronological split on an order column (the COVID 191/9 split,
    * 新冠疫情分析.py:93-97): train = order ≤ cut, test = order > cut.
    */
  def chronologicalSplit(df: DataFrame, orderCol: String, cut: Any): (DataFrame, DataFrame) =
    (df.filter(col(orderCol) <= lit(cut)), df.filter(col(orderCol) > lit(cut)))

  /** M26 — balanced per-class subsample (猫狗大战分类.py:172-177). */
  def balancedSample(df: DataFrame, labelCol: String, fraction: Double, seed: Long): DataFrame = {
    val labels = df.select(labelCol).distinct().collect().map(_.get(0))
    df.stat.sampleBy(labelCol, labels.map(_ -> fraction).toMap, seed)
  }
}
