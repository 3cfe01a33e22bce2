package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // synthetic corpus with a dominant head language and a long tail
  private lazy val corpus = {
    def docs(lang: String, n: Int, toks: Int, base: Long) =
      (0 until n).map(i => (base + i, lang, toks.toLong))
    (docs("en", 400, 100, 0) ++ docs("de", 60, 100, 1000) ++
      docs("sw", 12, 100, 2000) ++ docs("yo", 3, 100, 3000))
      .toDF("doc_id", "lang", "toks")
  }

  private def plan(alpha: Double, budget: Double) =
    Mixing.temperaturePlan(corpus, "lang", col("toks"), alpha, budget)

  test("rates sum to 1 and follow T^alpha") {
    val p = plan(0.3, 10000).select("lang", "tokens", "rate")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(math.abs(p.values.map(_._2).sum - 1.0) < 1e-12)
    val z = p.values.map(v => math.pow(v._1.toDouble, 0.3)).sum
    p.foreach { case (_, (t, r)) =>
      assert(math.abs(r - math.pow(t.toDouble, 0.3) / z) < 1e-12)
    }
  }

  test("alpha = 1 keeps the natural distribution: equal epochs everywhere") {
    val es = plan(1.0, 20000).select("epochs").as[Double].collect()
    assert(es.distinct.length == 1, s"natural sampling must not rebalance: ${es.toSeq}")
  }

  test("alpha < 1 up-weights the tail: epochs strictly increase as T shrinks") {
    val p = plan(0.3, 20000).select("tokens", "epochs")
      .as[(Long, Double)].collect().sortBy(-_._1)
    assert(p.zip(p.tail).forall { case ((tb, eb), (ts, es)) => tb > ts && eb < es },
      s"epochs must grow toward the tail: ${p.toSeq}")
  }

  test("zero-token languages are excluded from plan and sample") {
    val withEmpty = corpus.unionByName(Seq((9000L, "xx", 0L)).toDF("doc_id", "lang", "toks"))
    val p = Mixing.temperaturePlan(withEmpty, "lang", col("toks"), 0.3, 1000)
    assert(!p.select("lang").as[String].collect().contains("xx"))
    val s = Mixing.temperatureSample(withEmpty, "doc_id", "lang", p)
    assert(s.filter(col("lang") === "xx").isEmpty)
  }

  test("realized token mass tracks the budget and splits per the rates") {
    val budget = 23750.0 // half the 47,500-token corpus
    val p = plan(0.3, budget)
    val s = Mixing.temperatureSample(corpus, "doc_id", "lang", p)
    val realized = s.agg(sum(col("n_copies") * col("toks"))).head().getLong(0).toDouble
    assert(math.abs(realized - budget) / budget < 0.15,
      s"realized $realized vs budget $budget")
    // per-language: realized/target ratio within Bernoulli noise for the
    // bigger languages (en: 400 docs)
    val en = s.filter(col("lang") === "en")
      .agg(sum(col("n_copies") * col("toks"))).head().getLong(0).toDouble
    val enTarget = p.filter(col("lang") === "en")
      .select(col("rate") * budget).head().getDouble(0)
    assert(math.abs(en - enTarget) / enTarget < 0.2, s"en $en vs target $enTarget")
  }

  test("epochs > 1 up-samples by repetition: every tail doc kept, some twice") {
    val budget = 47500.0 // a full-corpus budget pushes the tail past 1 epoch
    val p = plan(0.3, budget)
    val yoEpochs = p.filter(col("lang") === "yo").select("epochs").head().getDouble(0)
    assert(yoEpochs > 1.0, s"expected up-sampling for yo, got $yoEpochs")
    val yo = Mixing.temperatureSample(corpus, "doc_id", "lang", p)
      .filter(col("lang") === "yo").select("n_copies").as[Long].collect()
    assert(yo.length == 3 && yo.forall(_ >= 1), s"all yo docs must survive: ${yo.toSeq}")
  }

  test("deterministic: two runs produce identical copies") {
    val p = plan(0.3, 20000)
    val a = Mixing.temperatureSample(corpus, "doc_id", "lang", p)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    val b = Mixing.temperatureSample(corpus, "doc_id", "lang", p)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("invalid parameters fail loud") {
    intercept[IllegalArgumentException](plan(0.0, 1000))
    intercept[IllegalArgumentException](plan(1.5, 1000))
    intercept[IllegalArgumentException](plan(0.3, 0.0))
  }
}
