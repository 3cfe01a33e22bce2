package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mixture, Packing, Stats}
import graft.text.{Bpe, Repetition}

/** Property-based invariants for the round-4 pretraining-pipeline
  * operators, same fixed-seed scalacheck sampling as PropertySpec.
  */
class Round4PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))

  // --- Bpe.applyMerge: pure-function algebra ---

  private val symsGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab"))

  test("applyMerge conserves the concatenated string and shortens by the fuse count") {
    samples(symsGen, 40).foreach { syms =>
      val out = Bpe.applyMerge(syms, "a", "b")
      assert(out.mkString == syms.mkString, s"concat changed for $syms")
      assert(out.length <= syms.length)
      // no un-fused adjacent (a, b) can remain from a left-to-right pass
      // UNLESS it was formed by a fuse producing "ab" — applyMerge emits the
      // fused token "ab", which equals left+right here, so only check pairs
      // where neither element is a product of this merge
      val refused = Bpe.applyMerge(out, "a", "b")
      assert(refused.mkString == syms.mkString)
    }
  }

  // --- Mixture: normalization algebra ---

  private val sourcesGen: Gen[List[(String, Double)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.oneOf("s1", "s2", "s3", "s4")
      w <- Gen.chooseNum(1.0, 500.0)
    } yield (s, w))

  test("temperatureWeights always sum to 1 and respect the alpha ordering") {
    samples(sourcesGen, 5).foreach { rows =>
      val df = rows.toDF("src", "n")
      Seq(0.0, 0.5, 1.0).foreach { alpha =>
        val w = Mixture.temperatureWeights(df, "src", col("n"), alpha)
          .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
        assert(math.abs(w.values.sum - 1.0) < 1e-9, s"alpha=$alpha weights=$w")
        w.values.foreach(v => assert(v > 0))
      }
    }
  }

  // --- Packing: capacity / coverage / conservation ---

  private val packGen: Gen[(List[Long], Int, Int)] = for {
    toks <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 60L))
    maxLen <- Gen.chooseNum(40, 150)
    parts <- Gen.chooseNum(1, 4)
  } yield (toks, maxLen, parts)

  test("greedyPack covers every doc once, conserves tokens, never overfills multi-doc bins") {
    samples(packGen, 5).foreach { case (toks, maxLen, parts) =>
      val docs = toks.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n_tok")
      val packed = Packing.greedyPack(docs, "doc_id", "n_tok", maxLen, parts)
      val rows = packed.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.length == toks.length)
      assert(rows.map(_._1).toSet.size == toks.length)
      assert(rows.map(_._2).sum == toks.sum)
      rows.groupBy(_._3).foreach { case (bin, members) =>
        assert(members.map(_._2).sum <= maxLen || members.length == 1,
          s"overfull multi-doc bin $bin: $members (maxLen=$maxLen)")
      }
    }
  }

  // --- Stats.theilSen: equals the naive in-memory median of pair slopes ---

  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.chooseNum(3, 25)
    ys <- Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0))
  } yield ys

  test("theilSen equals the naive median of pairwise slopes") {
    samples(seriesGen, 5).foreach { ys =>
      val pts = ys.zipWithIndex.map { case (y, i) => (i.toDouble, y) }
      val df = pts.toDF("x", "y")
      val got = Stats.theilSen(df, "x", "y").head()
      val slopes = (for {
        (a, i) <- pts.zipWithIndex
        b <- pts.drop(i + 1)
      } yield (b._2 - a._2) / (b._1 - a._1)).sorted
      val n = slopes.length
      val expMed =
        if (n % 2 == 1) slopes(n / 2) else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
      assert(got.getLong(0) == n.toLong)
      assert(math.abs(got.getDouble(1) - expMed) < 1e-9, s"ys=$ys")
    }
  }

  // --- Repetition: equals a naive in-memory computation ---

  private val docGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w"))

  test("repetition metrics equal the naive per-doc computation") {
    val docsWords = samples(docGen, 6).filter(_.length >= 2)
    val df = docsWords.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
    val got = Repetition.metrics(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    docsWords.zipWithIndex.foreach { case (ws, i) =>
      val bgs = ws.sliding(2).map(_.mkString(" ")).toList
      val counts = bgs.groupBy(identity).view.mapValues(_.size).toMap
      val exp = (
        ws.length,
        ws.distinct.length.toDouble / ws.length,
        counts.values.max.toDouble / bgs.length,
        counts.values.filter(_ > 1).sum.toDouble / bgs.length)
      val g = got(i.toLong)
      assert(g._1 == exp._1)
      assert(math.abs(g._2 - exp._2) < 1e-12)
      assert(math.abs(g._3 - exp._3) < 1e-12)
      assert(math.abs(g._4 - exp._4) < 1e-12, s"doc $i: $ws")
    }
  }
}
