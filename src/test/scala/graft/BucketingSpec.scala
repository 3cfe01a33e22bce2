package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-partitioned tables joined on the bucket key must NOT
  * shuffle (the co-located join story for repeated fact-fact joins at
  * scale, SURVEY.md "partitioning & shuffle").
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans without a shuffle") {
    val li = Engine.table(spark, TestSpark.Sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Engine.table(spark, TestSpark.Sf, "orders")
      .select("o_orderkey", "o_totalprice")

    // the in-memory catalog is per-session but the warehouse dir persists —
    // clear both so reruns don't hit LOCATION_ALREADY_EXISTS
    Seq("li_bucketed", "o_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"), first("o_totalprice").as("p"))

    joined.collect() // finalize adaptive plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"expected a join in:\n$plan")

    // same result as the unbucketed join
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"), first("o_totalprice").as("p"))
      .count()
    assert(joined.count() == expect)
  }
}
