package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property-based invariants for the reconciliation/contract operators:
  * Expectations' one-pass counters must equal brute-force per-constraint
  * recounts, and Diff's classification must equal the naive keyed
  * comparison, on randomized frames with nulls and duplicates.
  */
class ReconPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import Expectations._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private val rowGen: Gen[List[(Option[Long], Option[String], Option[Double])]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.option(Gen.chooseNum(0L, 20L)) // duplicates + nulls likely
      s <- Gen.option(Gen.oneOf("x", "y", "z", "w"))
      v <- Gen.option(Gen.chooseNum(-50.0, 150.0))
    } yield (id, s, v))

  test("Expectations counters equal brute-force recounts on random frames") {
    samples(rowGen, 6).foreach { rows =>
      val df = rows.toDF("id", "s", "v")
      val got = Expectations
        .check(df, Seq(
          NotNull("id"),
          Unique("id"),
          InRange("v", 0.0, 100.0),
          InSet("s", Seq("x", "y"))))
        .collect()
        .map(r => r.getString(1) -> r.getLong(3))
        .toMap
      val ids = rows.map(_._1)
      val nonNull = ids.flatten
      val expUnique = (nonNull.size - nonNull.distinct.size) +
        math.max(ids.count(_.isEmpty) - 1, 0)
      assert(got("not_null") == ids.count(_.isEmpty).toLong)
      assert(got("unique") == expUnique.toLong, s"rows=$rows")
      assert(got("in_range") == rows.map(_._3).count(o => o.exists(x => x < 0.0 || x > 100.0)).toLong)
      assert(got("in_set") == rows.map(_._2).count(o => o.exists(x => x != "x" && x != "y")).toLong)
    }
  }

  private val snapGen: Gen[(List[(Long, Option[String])], List[(Long, Option[String])])] =
    for {
      a <- Gen.listOf(for {
        id <- Gen.chooseNum(0L, 15L); s <- Gen.option(Gen.oneOf("p", "q"))
      } yield (id, s))
      b <- Gen.listOf(for {
        id <- Gen.chooseNum(0L, 15L); s <- Gen.option(Gen.oneOf("p", "q"))
      } yield (id, s))
    } yield (a.distinctBy(_._1), b.distinctBy(_._1))

  test("Diff classification equals the naive keyed comparison on random snapshots") {
    // no non-empty guard: all-added (empty old) and all-removed (empty new)
    // are exactly the edge cases worth covering
    samples(snapGen, 6).foreach { case (a, b) =>
      val old = a.toDF("id", "s")
      val neu = b.toDF("id", "s")
      val got = Diff.snapshotDiff(old, neu, Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val am = a.toMap
      val bm = b.toMap
      val exp = (am.keySet ++ bm.keySet).map { k =>
        k -> ((am.get(k), bm.get(k)) match {
          case (None, Some(_))              => "added"
          case (Some(_), None)              => "removed"
          case (Some(x), Some(y)) if x == y => "unchanged"
          case _                            => "changed"
        })
      }.toMap
      assert(got == exp, s"a=$a b=$b")
    }
  }
}
