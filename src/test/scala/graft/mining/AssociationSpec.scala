package graft.mining

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** SURVEY.md §5.2-3: FPGrowth's k≤2 itemsets must equal hand-computed
  * Apriori counts (the reference's SimpleApriori is capped at pairs).
  */
class AssociationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val baskets = Seq(
    (1L, Seq("a", "b", "c")),
    (2L, Seq("a", "b")),
    (3L, Seq("a", "c")),
    (4L, Seq("b", "c")),
    (5L, Seq("a", "b", "c"))).toDF("bid", "items")

  test("itemSupport counts 1-itemsets") {
    val out = Association.itemSupport(baskets, "items", 1L)
      .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 4L), ("b", 4L), ("c", 4L)))
  }

  test("pairSupport counts canonical pairs") {
    val out = Association.pairSupport(baskets, "bid", "items", 1L)
      .orderBy("item1", "item2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", "b", 3L), ("a", "c", 3L), ("b", "c", 3L)))
  }

  test("rulesRelational matches FPGrowth associationRules on 1->1 rules") {
    val rel = Association.rulesRelational(baskets, "bid", "items",
        minSupport = 0.2, minConfidence = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val model = Association.fpgrowth(baskets, "items", minSupport = 0.2, minConfidence = 0.5)
    val fp = model.associationRules
      .filter(size(col("antecedent")) === 1 && size(col("consequent")) === 1)
      .collect()
      .map(r => (r.getSeq[String](0).head, r.getSeq[String](1).head) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rel.keySet == fp.keySet)
    for ((k, (conf, lift, supp)) <- rel) {
      val (fConf, fLift, fSupp) = fp(k)
      assert(math.abs(conf - fConf) < 1e-12, s"confidence $k")
      assert(math.abs(lift - fLift) < 1e-12, s"lift $k")
      assert(math.abs(supp - fSupp) < 1e-12, s"support $k")
    }
    // hand check one rule: a->b conf = supp(ab)/supp(a) = 3/4, lift = conf/(4/5)
    assert(rel(("a", "b")) == (0.75, 0.75 / 0.8, 0.6))
  }

  test("FPGrowth 2-itemset frequencies equal relational pairSupport") {
    val model = Association.fpgrowth(baskets, "items", minSupport = 0.2, minConfidence = 0.5)
    val fpPairs = model.freqItemsets
      .filter(size(col("items")) === 2)
      .select(sort_array(col("items")).as("p"), col("freq"))
      .collect()
      .map(r => (r.getSeq[String](0).mkString(","), r.getLong(1)))
      .toMap
    val relational = Association.pairSupport(baskets, "bid", "items", 1L)
      .collect()
      .map(r => (s"${r.getString(0)},${r.getString(1)}", r.getLong(2)))
      .toMap
    assert(fpPairs == relational)
  }

  test("association rules carry confidence = supp(pair)/supp(antecedent)") {
    val model = Association.fpgrowth(baskets, "items", minSupport = 0.2, minConfidence = 0.0)
    val rules = Association.rules(model)
      .filter(col("antecedent_str") === "a" && col("consequent_str") === "b")
      .select("confidence").as[Double].head()
    assert(math.abs(rules - 3.0 / 4.0) < 1e-12) // supp(a,b)=3, supp(a)=4
  }
}
