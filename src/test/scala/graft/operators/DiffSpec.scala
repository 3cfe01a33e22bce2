package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val old = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, null.asInstanceOf[String], 40)
  ).toDF("id", "s", "v")

  test("classifies added, removed, changed, unchanged") {
    val neu = Seq(
      (1L, "a", 10),   // unchanged
      (2L, "B", 20),   // changed (s)
      (4L, null.asInstanceOf[String], 40), // unchanged with null payload
      (5L, "e", 50)    // added; id=3 removed
    ).toDF("id", "s", "v")
    val got = Diff.snapshotDiff(old, neu, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"),
      (4L, "unchanged"), (5L, "added")))
  }

  test("null vs non-null payload is a change, not a match") {
    val neu = Seq((4L, "now-set", 40)).toDF("id", "s", "v")
    val got = Diff.snapshotDiff(old.filter($"id" === 4L), neu, Seq("id"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((4L, "changed")))
  }

  test("identical snapshots are all unchanged") {
    val got = Diff.snapshotDiff(old, old, Seq("id"))
      .select("change_type").distinct().as[String].collect().toSeq
    assert(got == Seq("unchanged"))
  }
}
