package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val df = Seq(
    ("k1", 1L, "first"), ("k1", 2L, "middle"), ("k1", 3L, "last"),
    ("k2", 5L, "only")).toDF("k", "seq", "v")

  test("keepLast keeps the row with the highest order value per key") {
    val out = Dedup.keepLast(df, Seq("k"), Seq(col("seq"))).orderBy("k")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("last", "only"))
  }

  test("keepFirst keeps the lowest order value per key") {
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("seq"))).orderBy("k")
      .select("v").as[String].collect().toSeq
    assert(out == Seq("first", "only"))
  }

  test("keepLast is idempotent") {
    val once = Dedup.keepLast(df, Seq("k"), Seq(col("seq")))
    val twice = Dedup.keepLast(once, Seq("k"), Seq(col("seq")))
    assert(once.orderBy("k", "seq").collect().toSeq == twice.orderBy("k", "seq").collect().toSeq)
  }

  test("exactDedupByHash agrees with exactDedup on content groups") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val byVal = Dedup.exactDedup(docs, Seq("text"), "id")
      .select("id", "n_copies").orderBy("id").collect().toSeq
    val byHash = Dedup.exactDedupByHash(docs, "text", "id")
      .select("id", "n_copies").orderBy("id").collect().toSeq
    assert(byVal == byHash)
    assert(byVal.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L), (3L, 1L)))
  }
}
