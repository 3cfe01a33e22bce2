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

  test("simhashNearDupPairs equals brute-force hamming pairs (exact for d < nBands)") {
    // random 64-bit hashes plus planted near-pairs at known distances
    val rnd = new scala.util.Random(7)
    val base = (0L until 60L).map(i => (i, rnd.nextLong()))
    val planted = Seq(
      (100L, base(0)._2 ^ 1L),                 // d=1 from id 0
      (101L, base(1)._2 ^ (1L << 13) ^ (1L << 40)), // d=2 from id 1
      (102L, base(2)._2 ^ 7L),                 // d=3 from id 2
      (103L, base(3)._2 ^ 0xF0L))              // d=4 from id 3 — beyond max
    val rows = (base ++ planted).toDF("doc_id", "sh")
    val got = Dedup.simhashNearDupPairs(rows, "doc_id", "sh", maxHamming = 3, nBands = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val all = (base ++ planted)
    val want = (for {
      (i, hi) <- all; (j, hj) <- all if i < j
      if java.lang.Long.bitCount(hi ^ hj) <= 3
    } yield (i, j)).toSet
    assert(got == want, s"banded=$got brute=$want")
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)) && got.contains((2L, 102L)))
    assert(!got.contains((3L, 103L)), "d=4 pair must be filtered by maxHamming=3")
  }

  test("connectedComponents labels every node with its component's min id") {
    // components: chain {1-2-3-4}, triangle {10,11,12}, pair {20,21};
    // 30 never appears in a pair and must not appear in the output
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b", idOut = "doc")
      .orderBy("doc").as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents labels a 10k-node chain in O(log n) rounds") {
    // path graph on 10^4 nodes with shuffled ids: diameter 10^4, so the
    // round-3 propagation needed ~10^4 rounds; star contraction must finish
    // within maxIters = 20 ≈ log2(n) + slack or throw its convergence guard
    val n = 10000
    val perm = new scala.util.Random(7).shuffle((0L until n.toLong).toVector)
    val pairs = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    val got = Dedup.connectedComponents(
      spark.createDataFrame(pairs).toDF("a", "b"), "a", "b", maxIters = 20)
    val comps = got.select("component").distinct().collect()
    assert(comps.length == 1 && comps.head.getLong(0) == 0L)
    assert(got.count() == n)
  }

  test("connectedComponents converges on a long chain (diameter > 2 rounds)") {
    val n = 33L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
    assert(got.select("component").distinct().count() == 1)
    assert(got.count() == n)
  }

  test("simhash near-dup finds an edited document end-to-end") {
    import graft.functions.{TextFunctions => TF}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (3L, "completely different content about spark catalyst expression planning")
    ).toDF("doc_id", "text")
      .withColumn("sh", TF.simhash64(TF.wordShingles(col("text"), 2)))
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "sh", maxHamming = 12, nBands = 16)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair not found: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
