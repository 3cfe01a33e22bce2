package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Prefix(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private def localKey(id: Long, w: Long): Double =
    math.log((md5Prefix(id.toString).toDouble + 0.5) / 4503599627370496.0) / w.toDouble

  // two groups, deterministic weights 1..60
  private lazy val rows: Seq[(String, Long, Long)] =
    (1L to 120L).map(i => (if (i % 2 == 0) "g_even" else "g_odd", i, (i % 60) + 1))
  private lazy val df = rows.toDF("g", "id", "w")

  test("sample reproduces the local Efraimidis–Spirakis ranking exactly") {
    val k = 10
    val got = WeightedSample.sample(df, "g", "id", col("w"), k)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("weight"), r.getAs[Double]("es_key")))
      .sortBy(t => (t._1, t._2))
    val want = rows
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rs) =>
        rs.map { case (_, id, w) => (id, w, localKey(id, w)) }
          .sortBy { case (id, _, key) => (-key, id) }
          .take(k)
          .zipWithIndex
          .map { case ((id, w, key), i) => (g, i + 1, id, w, key) }
      }
      .sortBy(t => (t._1, t._2))
    assert(got.length == want.length)
    got.zip(want).foreach { case ((gg, gr, gid, gw, gk), (wg, wr, wid, ww, wk)) =>
      assert(gg == wg && gr == wr && gid == wid && gw == ww)
      assert(math.abs(gk - wk) < 1e-12, s"key mismatch for id $gid: $gk vs $wk")
    }
  }

  test("output is invariant under repartitioning (mergeable bounded heaps)") {
    val k = 8
    def run(parts: Int): Seq[(String, Int, Long)] =
      WeightedSample.sample(df.repartition(parts), "g", "id", col("w"), k)
        .select("g", "rank", "id").as[(String, Int, Long)].collect().toSeq.sorted
    assert(run(1) == run(13))
  }

  test("null and non-positive weights are never sampled") {
    val d = Seq(("g", 1L, Some(5L)), ("g", 2L, Some(0L)), ("g", 3L, Some(-4L)),
      ("g", 4L, None: Option[Long])).toDF("g", "id", "w")
    val ids = WeightedSample.sample(d, "g", "id", col("w"), 10)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("fractional weights fail loud instead of silently truncating") {
    val d = Seq(("g", 1L, 2.5), ("g", 2L, 3.0)).toDF("g", "id", "w")
    val ex = intercept[Exception] {
      WeightedSample.sample(d, "g", "id", col("w"), 10).collect()
    }
    assert(ex.getMessage.contains("non-integral weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-integral weight")))
    // integral-valued doubles pass and echo the exact weight
    val ok = Seq(("g", 1L, 3.0)).toDF("g", "id", "w")
    val w = WeightedSample.sample(ok, "g", "id", col("w"), 10)
      .select("weight").as[Long].head()
    assert(w == 3L)
  }

  test("heavier weight wins between items with the same uniform draw") {
    // same id string would be degenerate; instead verify the key is
    // monotone in w for a fixed id's uniform: ln(u) < 0 so dividing by a
    // larger w moves the key toward 0 (better rank)
    val u = localKey(42L, 1L)
    assert(localKey(42L, 10L) > u && localKey(42L, 10L) < 0.0)
  }
}
