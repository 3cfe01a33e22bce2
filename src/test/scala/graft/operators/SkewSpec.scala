package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")

  test("saltedAgg equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), buckets = 8,
      partial = Seq(count(lit(1)).as("c"), sum(col("v")).as("s")),
      merge = Seq(sum(col("c")).as("c"), sum(col("s")).as("s")))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "name")
    val direct = skewed.join(dim, Seq("k")).groupBy("k", "name").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", buckets = 8).groupBy("k", "name").count()
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(salted == direct)
  }
}
