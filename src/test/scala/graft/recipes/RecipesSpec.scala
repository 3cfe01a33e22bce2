package graft.recipes

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Each reference workload runs end-to-end on TESTDATA and produces the
  * result tables the reference prints/saves (SURVEY.md §3).
  */
class RecipesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.Sf

  test("VEG recipe: transactions, itemsets, and rules materialize") {
    val out = Recipes.vegetableTrends(spark, sf)
    assert(out("pivoted").count() > 0)
    val tx = out("transactions")
    assert(tx.count() > 0)
    assert(out("itemsets").count() > 0)
    val rules = out("rules")
    // every rule respects the confidence floor
    assert(rules.filter(col("confidence") < 0.6).count() == 0)
    assert(out("rule_stats").head().getLong(0) == rules.count())
  }

  test("COVID recipe: metric table has all four models; best has min rmse") {
    val out = Recipes.timeSeriesRegression(spark, sf)
    val metrics = out("metrics").collect()
    assert(metrics.map(_.getString(0)).toSet ==
      Set("ridge", "lasso", "elastic_net", "gbt"))
    assert(metrics.forall(r => !r.getDouble(1).isNaN))
    val best = out("best_model").head()
    assert(best.getDouble(1) == metrics.map(_.getDouble(1)).min)
  }

  test("CANCER recipe: bake-off metrics, scored output, confusion counts") {
    val out = Recipes.classifierBakeOff(spark, sf)
    val metrics = out("metrics").collect()
    assert(metrics.length == 3)
    assert(metrics.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val scored = out("scored")
    assert(scored.columns.toSeq ==
      Seq("sample_id", "label", "predicted", "p_positive", "p_negative", "correct"))
    assert(scored.filter(col("correct") =!= (col("label") === col("predicted"))).count() == 0)
    assert(out("confusion").agg(sum("n")).head().getLong(0) == scored.count())
  }

  test("HLM recipe: features, clusters, and summary materialize") {
    val out = Recipes.stylometryClustering(spark, sf)
    assert(out("features").count() == 500)
    assert(out("clusters").select("prediction").distinct().count() == 2)
    val s = out("summary").head()
    assert(!s.getDouble(0).isNaN) // silhouette
    assert(s.getDouble(1) >= 0.5) // consistency is at least the max-orientation bound
    assert(out("top_variance_words").count() == 5)
  }

  test("CATDOG recipe: submission sorted by id with binary predictions") {
    val dir = Files.createTempDirectory("catdog").toString
    (1 to 8).foreach { i =>
      val label = if (i % 2 == 0) "dog" else "cat"
      Files.write(Paths.get(dir, s"$label.$i.jpg"), Array.fill[Byte](16 + i)(i.toByte))
    }
    val out = Recipes.imagePipeline(spark, dir)
    val sub = out("submission").collect()
    assert(sub.length == 8)
    assert(sub.map(_.getLong(0)).toSeq == sub.map(_.getLong(0)).toSeq.sorted)
    assert(sub.forall(r => r.getInt(1) == 0 || r.getInt(1) == 1))
  }
}
