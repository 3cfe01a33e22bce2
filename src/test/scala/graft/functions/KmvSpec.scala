package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Prefix(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  private lazy val items = (1 to 1000).map(i => s"item_$i")
  private lazy val df = items.flatMap(s => Seq.fill(3)(s)).toDF("x") // 3 copies each

  test("cells are exactly the k smallest distinct hashes, rank-ordered") {
    val k = 32
    val got = Kmv.cells(df, col("x"), k)
      .select("rk", "h", "item").as[(Int, Long, String)].collect().sortBy(_._1)
    val want = items.map(s => (md5Prefix(s), s)).sorted.take(k)
    assert(got.length == k)
    assert(got.map(g => (g._2, g._3)).toSeq == want)
    assert(got.map(_._1).toSeq == (1 to k))
  }

  test("duplicate floods cannot crowd the sketch") {
    // one hot item repeated 10k times + 100 singletons: the sketch must
    // still hold k distinct items, not k copies of the hot one
    val hot = Seq.fill(10000)("hot")
    val rest = (1 to 100).map(i => s"cold_$i")
    val d = (hot ++ rest).toDF("x")
    val got = Kmv.cells(d, col("x"), 50).select("item").as[String].collect()
    assert(got.length == 50 && got.toSet.size == 50)
  }

  test("per-shard sketches merge to exactly the whole-data sketch") {
    val k = 32
    val (a, b) = items.splitAt(400)
    val ca = Kmv.cells(a.toDF("x"), col("x"), k)
    val cb = Kmv.cells(b.toDF("x"), col("x"), k)
    val merged = Kmv.merge(ca, cb, k)
      .select("rk", "h", "item").as[(Int, Long, String)].collect().sortBy(_._1)
    val whole = Kmv.cells(df, col("x"), k)
      .select("rk", "h", "item").as[(Int, Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq == whole.toSeq)
  }

  test("estimate lands within 3 sigma of the exact distinct count") {
    val k = 64 // sigma ~ D/sqrt(k-2) ~ 12.7%
    val est = Kmv.estimate(Kmv.cells(df, col("x"), k), k).head().getDouble(0)
    val bound = 3.0 / math.sqrt((k - 2).toDouble)
    assert(math.abs(est - 1000.0) / 1000.0 <= bound,
      s"est $est vs exact 1000 exceeds 3-sigma bound $bound")
  }

  test("below k distinct items the sketch is the set and the count exact") {
    val d = Seq("a", "b", "c", "a", "b").toDF("x")
    val cells = Kmv.cells(d, col("x"), 16)
    assert(cells.count() == 3)
    assert(Kmv.estimate(cells, 16).head().getDouble(0) == 3.0)
  }

  test("NULL items are skipped; grouped sketches stay per-group") {
    val d = Seq(("g1", Some("a")), ("g1", None), ("g2", Some("a")), ("g2", Some("b")))
      .toDF("g", "x")
    val cells = Kmv.cells(d, col("x"), 8, Seq("g"))
    assert(cells.filter(col("g") === "g1").count() == 1)
    assert(cells.filter(col("g") === "g2").count() == 2)
  }

  test("invalid k fails loud") {
    intercept[IllegalArgumentException](new BottomKByHash(0))
    intercept[IllegalArgumentException](new BottomKByHash(65537))
  }

  test("setAlgebra is exact below k: union, intersection, jaccard") {
    // |A| = 30, |B| = 25, |A∩B| = 10 — with k = 256 every sketch holds its
    // whole set, so the "estimates" must equal the exact set computation
    val a = (1 to 30).map(i => ("A", s"s_$i"))
    val b = (21 to 45).map(i => ("B", s"s_$i"))
    val d = (a ++ b).toDF("seg", "x")
    val cells = Kmv.cells(d, col("x"), 256, Seq("seg"))
    val row = Kmv.setAlgebra(cells, 256, "seg").head()
    assert(row.getAs[String]("seg_a") == "A" && row.getAs[String]("seg_b") == "B")
    assert(row.getAs[Long]("n_union_cells") == 45L)
    assert(row.getAs[Double]("est_union") == 45.0)
    assert(math.abs(row.getAs[Double]("est_inter") - 10.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("jaccard_est") - 10.0 / 45.0) < 1e-12)
  }

  test("setAlgebra matches a local reference of the estimator formulas") {
    // three segments with staggered overlap; k small enough that every pair
    // is in estimation mode — replicate the merged-sketch math locally
    val k = 32
    val segs = Map(
      "p" -> (1 to 800).map(i => s"v_$i"),
      "q" -> (401 to 1200).map(i => s"v_$i"),
      "r" -> (1001 to 1400).map(i => s"v_$i"))
    val d = segs.toSeq.flatMap { case (g, xs) => xs.map(x => (g, x)) }.toDF("seg", "x")
    val got = Kmv.setAlgebra(Kmv.cells(d, col("x"), k, Seq("seg")), k, "seg")
      .collect().map(r => (r.getAs[String]("seg_a"), r.getAs[String]("seg_b")) -> r).toMap
    assert(got.keySet == Set(("p", "q"), ("p", "r"), ("q", "r")))
    for (((sa, sb), row) <- got) {
      val ca = segs(sa).map(x => (md5Prefix(x), x)).sorted.take(k)
      val cb = segs(sb).map(x => (md5Prefix(x), x)).sorted.take(k)
      val ku = (ca ++ cb).distinct.sorted.take(k)
      val hk = ku.last._1
      val estU = (k - 1).toDouble / (hk.toDouble / 4503599627370496.0)
      val matched = ku.count { case (_, x) => ca.exists(_._2 == x) && cb.exists(_._2 == x) }
      assert(row.getAs[Long]("n_union_cells") == ku.length.toLong)
      assert(math.abs(row.getAs[Double]("est_union") - estU) < 1e-6)
      assert(math.abs(row.getAs[Double]("jaccard_est") - matched.toDouble / ku.length) < 1e-12)
      assert(math.abs(row.getAs[Double]("est_inter") - estU * matched / ku.length) < 1e-6)
      // estimation quality: within 4 sigma of truth on union
      val exactU = (segs(sa) ++ segs(sb)).distinct.size
      assert(math.abs(estU - exactU) / exactU <= 4.0 / math.sqrt((k - 2).toDouble))
    }
  }

  test("setAlgebra emits disjoint pairs with zero intersection estimate") {
    val d = ((1 to 50).map(i => ("A", s"a_$i")) ++ (1 to 50).map(i => ("B", s"b_$i")))
      .toDF("seg", "x")
    val row = Kmv.setAlgebra(Kmv.cells(d, col("x"), 64, Seq("seg")), 64, "seg").head()
    assert(row.getAs[Double]("est_inter") == 0.0)
    assert(row.getAs[Double]("jaccard_est") == 0.0)
  }
}
