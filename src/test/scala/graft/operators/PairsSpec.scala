package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PairsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "en", "aa"), (2L, "en", "ab"), (3L, "en", "ac"), (4L, "en", "ad"),
    (5L, "fr", "ba"), (6L, "fr", "bb"), (7L, "fr", "bc"),
    (8L, "zh", "ca"),
    (9L, "de", "da"), (10L, "de", "db"))

  private def expected(blockBy: Boolean): Set[(Long, Long)] = {
    val pairs = for {
      x <- rows; y <- rows
      if x._1 < y._1 && (!blockBy || x._2 == y._2)
    } yield (x._1, y._1)
    pairs.toSet
  }

  test("allPairs enumerates each within-block pair exactly once, any bucket count") {
    val df = rows.toDF("id", "lang", "payload")
    for (b <- Seq(1, 2, 8, 64)) {
      val got = Pairs.allPairs(df, "id", Seq("lang"), buckets = b)
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at buckets=$b")
      assert(got.toSet == expected(blockBy = true), s"pair set mismatch at buckets=$b")
    }
  }

  test("allPairs with no block columns covers every unordered pair") {
    val df = rows.toDF("id", "lang", "payload")
    val got = Pairs.allPairs(df, "id", Seq.empty, buckets = 4)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == expected(blockBy = false))
  }

  test("allPairs canonicalizes a.id < b.id and carries full payloads") {
    val df = rows.toDF("id", "lang", "payload")
    val got = Pairs.allPairs(df, "id", Seq("lang"), buckets = 3)
      .select(col("a.id"), col("b.id"), col("a.payload"), col("b.payload"))
      .as[(Long, Long, String, String)].collect()
    val byId = rows.map(r => r._1 -> r._3).toMap
    got.foreach { case (ia, ib, pa, pb) =>
      assert(ia < ib)
      assert(pa == byId(ia) && pb == byId(ib))
    }
  }

  test("allPairs plans as an equi-join: no cartesian product") {
    val df = rows.toDF("id", "lang", "payload")
    val plan = Pairs.allPairs(df, "id", Seq("lang"), buckets = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
