package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOf, Dedup, Graph, Reshape, Stats, WindowOps}

/** Property-based invariants (SURVEY.md §5.2-4): dedup idempotence,
  * pivot∘unpivot round-trip, window algebraic identities. Plain scalacheck
  * generators sampled with fixed seeds (scalatestplus bridge not available
  * in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Long, Double)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c")
      seq <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(-100.0, 100.0)
    } yield (k, seq, v))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  test("keepLast is idempotent and returns one row per key") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "seq", "v")
      val once = Dedup.keepLast(df, Seq("k"), Seq(col("seq"), col("v")))
      val twice = Dedup.keepLast(once, Seq("k"), Seq(col("seq"), col("v")))
      assert(once.count() == rows.map(_._1).distinct.size)
      assert(once.orderBy("k", "seq", "v").collect().toSeq ==
        twice.orderBy("k", "seq", "v").collect().toSeq)
    }
  }

  test("pivot then unpivot round-trips the aggregated values") {
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("k", "seq", "v").withColumn("g", col("seq") % 3)
      val agg = df.groupBy("g", "k").agg(sum("v").as("v")) // ground truth
      val piv = Reshape.pivotAgg(df, "g", "k", Seq("a", "b", "c"), sum(col("v")))
      val unp = Reshape.unpivot(piv, "g", Seq("a", "b", "c"), "k", "v")
        .filter(col("v").isNotNull)
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("g", "k").collect()
          .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 1e6))).toSeq
      assert(canon(agg) == canon(unp))
    }
  }

  test("laggedDiff equals difference of lag features") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0)), 5).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "x")
      val w = WindowOps.spec(Seq.empty, Seq(col("t")))
      val viaDiff = WindowOps.laggedDiff(df, w, "x", 2)
      val viaLags = WindowOps.lagFeatures(df, w, Seq("x"), Seq(1, 3))
        .withColumn("expect", col("x_lag1") - col("x_lag3"))
      val joined = viaDiff.join(viaLags.select("t", "expect"), "t")
      val bad = joined.filter(
        (col("x_diff2").isNotNull || col("expect").isNotNull) &&
          (col("x_diff2").isNull || col("expect").isNull ||
            abs(col("x_diff2") - col("expect")) > 1e-12)).count()
      assert(bad == 0)
    }
  }

  private val pairRowsGen: Gen[List[(Long, String)]] =
    Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 40L)
      block <- Gen.oneOf("x", "y", "z")
    } yield (id, block)).map(_.distinctBy(_._1))

  test("allPairs equals the naive within-block pair set for random inputs") {
    samples(pairRowsGen, 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "blk")
      val buckets = 1 + (i % 5) * 3 // 1, 4, 7, 10, 13 — exercise many widths
      val got = graft.operators.Pairs.allPairs(df, "id", Seq("blk"), buckets)
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect()
      val want = (for {
        x <- rows; y <- rows
        if x._1 < y._1 && x._2 == y._2
      } yield (x._1, y._1)).toSet
      assert(got.length == got.toSet.size, s"dup pairs (sample $i, buckets=$buckets)")
      assert(got.toSet == want, s"pair mismatch (sample $i, buckets=$buckets)")
    }
  }

  private val intervalsGen: Gen[(List[Long], List[(Long, Long, Long)])] = for {
    pts <- Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))
    ivs <- Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(-60L, 60L)
      len <- Gen.chooseNum(-5L, 30L) // negative/empty spans included
    } yield (s, s + len))
  } yield (pts, ivs.zipWithIndex.map { case ((s, e), k) => (k.toLong, s, e) })

  test("range join equals the naive range filter for random inputs") {
    samples(intervalsGen, 6).zipWithIndex.foreach { case ((pts, ivs), i) =>
      val points = pts.zipWithIndex.map { case (p, j) => (j.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.toDF("iid", "s", "e")
      val binWidth = 1L + (i % 4) * 6 // 1, 7, 13, 19
      val got = graft.operators.RangeJoin
        .pointInInterval(points, "p", intervals, "s", "e", binWidth)
        .select("pid", "iid").as[(Long, Long)].collect()
      val want = (for {
        (p, j) <- pts.zipWithIndex
        (k, s, e) <- ivs
        if p >= s && p < e
      } yield (j.toLong, k)).toSet
      assert(got.length == got.toSet.size, s"dup matches (sample $i, binWidth=$binWidth)")
      assert(got.toSet == want, s"match mismatch (sample $i, binWidth=$binWidth)")
    }
  }

  test("connectedComponents matches a driver-side union-find on random graphs") {
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 25L)
      b <- Gen.chooseNum(0L, 25L)
      if a != b
    } yield (a, b))
    samples(edgesGen, 5).foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // driver union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      // canonical component id = min node id in the component
      val want = nodes.groupBy(find).flatMap { case (_, ns) =>
        val m = ns.min; ns.map(_ -> m)
      }.toMap
      assert(got == want)
    }
  }

  test("olsFit recovers planted slope/intercept exactly on noise-free lines") {
    val lineGen = for {
      slope <- Gen.chooseNum(-5.0, 5.0)
      icept <- Gen.chooseNum(-10.0, 10.0)
      n <- Gen.chooseNum(3, 20)
    } yield (slope, icept, n)
    samples(lineGen, 5).foreach { case (m, c, n) =>
      val df = (1 to n).map(i => ("g", i.toDouble, m * i + c)).toDF("g", "x", "y")
      val r = Stats.olsFit(df, Seq("g"), "x", "y").head()
      assert(math.abs(r.getDouble(2) - m) < 1e-8, s"slope m=$m n=$n")
      assert(math.abs(r.getDouble(3) - c) < 1e-7, s"intercept c=$c n=$n")
    }
  }

  test("pageRank mass: total pr equals 1 minus the leaked dangling mass bound") {
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 8L)
      b <- Gen.chooseNum(0L, 8L)
      if a != b
      w <- Gen.chooseNum(1L, 5L)
    } yield (a, b, w))
    samples(edgesGen, 4).foreach { edges =>
      val pr = Graph.pageRank(edges.toDF("s", "d", "w"), "s", "d", "w", iters = 4)
        .collect().map(_.getDouble(1))
      // every pr is at least the teleport floor and the total never exceeds 1
      val n = pr.length
      assert(pr.forall(p => p >= 0.15 / n - 1e-12))
      assert(pr.sum <= 1.0 + 1e-9)
      // with no dangling nodes mass is conserved exactly
      val srcs = edges.map(_._1).toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
      if (nodes.subsetOf(srcs)) assert(math.abs(pr.sum - 1.0) < 1e-9)
    }
  }

  test("asofNearest gap is never beaten by any other right row of the key") {
    val dataGen = for {
      lefts <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L))
      rights <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L))
    } yield (lefts.distinct, rights.distinct)
    samples(dataGen, 5).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case (t, i) => ("k", new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("k", "lt", "id")
      val r = rights.map(t => ("k", new java.sql.Timestamp(t * 1000), t))
        .toDF("k", "rt", "rv")
      val got = AsOf.asofNearest(l, r, Seq("k"), "lt", "rt")
        .select("id", "asof_gap_s").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      lefts.zipWithIndex.foreach { case (t, i) =>
        val bestAbs = rights.map(rt => math.abs(t - rt)).min
        assert(math.abs(got(i.toLong)) == bestAbs.toDouble, s"left=$t rights=$rights")
        // tie contract: when a past and a future row are equidistant, gap >= 0
        val past = rights.filter(_ <= t); val fut = rights.filter(_ > t)
        if (past.nonEmpty && fut.nonEmpty &&
          (t - past.max) == (fut.min - t)) assert(got(i.toLong) >= 0)
      }
    }
  }
}
