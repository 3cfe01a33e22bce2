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
