package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed importance weights (exact features)") {
    // raw: d1 = "x x", d2 = "y y"; target = d1.
    // counts: x (cr=2, ct=2), y (cr=2, ct=0); V=2, Nr=4, Nt=2, α=0.01
    val raw = Seq((1L, "x x"), (2L, "y y")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L)
    val out = Dsir
      .importanceWeights(raw, target, "doc_id", "text", alpha = 0.01)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected1 = 2.0 * (math.log(2.01 / 2.02) - math.log(2.01 / 4.02))
    val expected2 = 2.0 * (math.log(0.01 / 2.02) - math.log(2.01 / 4.02))
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - expected1) < 1e-12)
    assert(math.abs(out(2L)._2 - expected2) < 1e-12)
    assert(out(1L)._2 > 0 && out(2L)._2 < 0)
  }

  test("hashed features agree with exact features when buckets don't collide") {
    val raw = Seq(
      (1L, "alpha beta alpha"), (2L, "gamma delta"), (3L, "alpha gamma"),
      (4L, "epsilon epsilon zeta")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 2L)
    val exact = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val hashed = Dsir.importanceWeights(raw, target, "doc_id", "text", buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // 6 distinct words in 2^20 buckets: collision-free (deterministic crc32)
    exact.foreach { case (id, w) => assert(math.abs(hashed(id) - w) < 1e-12) }
  }

  test("target-slice docs lean positive, off-target docs negative (sf corpus)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val weights = Dsir
      .importanceWeights(docs, docs.filter(col("lang") === "en"), "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang").agg(avg("log_weight").as("mean_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(weights("en") > 0.0)
    weights.filter(_._1 != "en").foreach { case (_, w) => assert(w < 0.0) }
  }

  test("resample: deterministic, and a higher cut never keeps more docs") {
    val weights = Seq.tabulate(200)(i => (i.toLong, (i % 7) - 3.0))
      .toDF("doc_id", "log_weight")
    def kept(cut: Double): Set[Long] = Dsir
      .resample(weights, "doc_id", "log_weight", cut)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val lo = kept(0.0)
    assert(kept(0.0) == lo) // rerun identical — seedless hash, no RNG state
    assert(kept(2.0).subsetOf(lo))
    assert(lo.subsetOf(kept(-2.0)))
  }
}
