package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expectations._

  private def report(constraints: Seq[Constraint]) = {
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0), "click", "{\"k\": 1}"),
      (Some(2L), Some("b"), Some(-1.0), "view", "{\"k\": 22}"),
      (Some(2L), None, Some(50.0), "error", "{\"k\": x}"),
      (None, None, None, "click", "{\"k\": 3}")
    ).toDF("id", "name", "v", "kind", "props")
    Expectations.check(df, constraints).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq
  }

  test("all five constraint kinds count violations exactly") {
    val got = report(Seq(
      NotNull("id"),
      Unique("id"),
      InRange("v", 0.0, 100.0),
      InSet("kind", Seq("click", "view")),
      Matches("props", "\\{\"k\": [0-9]+\\}")))
    assert(got == Seq(
      ("not_null", "id", 1L, 4L, false),
      // ids: 1, 2, 2, null -> one non-null duplicate, single null is free
      ("unique", "id", 1L, 4L, false),
      ("in_range", "v", 1L, 4L, false), // -1.0; null v does not violate range
      ("in_set", "kind", 1L, 4L, false), // "error"
      ("matches", "props", 1L, 4L, false))) // {"k": x}
  }

  test("unique counts duplicate nulls beyond the first as violations") {
    val got = report(Seq(Unique("name")))
    // names: a, b, null, null -> the second null violates
    assert(got == Seq(("unique", "name", 1L, 4L, false)))
  }

  test("a satisfied constraint reports passed with zero violations") {
    val got = report(Seq(InRange("v", -10.0, 100.0), NotNull("kind")))
    assert(got == Seq(
      ("in_range", "v", 0L, 4L, true),
      ("not_null", "kind", 0L, 4L, true)))
  }

  test("report preserves declaration order") {
    val got = report(Seq(Matches("props", ".*"), NotNull("id"), Unique("id")))
    assert(got.map(_._1) == Seq("matches", "not_null", "unique"))
  }
}
