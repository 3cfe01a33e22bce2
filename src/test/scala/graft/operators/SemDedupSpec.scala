package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def mark(df: org.apache.spark.sql.DataFrame, nBits: Int, tau: Double) =
    SemDedup
      .markDuplicates(df, "vec_id", "embedding", SemDedup.signBucket(col("embedding"), nBits), tau)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

  test("identical vectors in one bucket: higher id marked, dup_of = lower id") {
    val out = mark(frame(
      1L -> Array(1f, 1f, 0.5f, 0f),
      2L -> Array(1f, 1f, 0.5f, 0f),
      3L -> Array(-1f, 1f, 0f, 0.9f)), nBits = 2, tau = 0.9)
    assert(out(1L) == ((3L, None)))
    assert(out(2L) == ((3L, Some(1L))))
    assert(out(3L) == ((2L, None)))
  }

  test("transitive group points at the single smallest kept id") {
    val v = Array(1f, 2f, 3f, 4f)
    val out = mark(frame(1L -> v, 2L -> v, 3L -> v), nBits = 2, tau = 0.99)
    assert(out(2L)._2 == Some(1L))
    assert(out(3L)._2 == Some(1L))
  }

  test("dissimilar vectors sharing a bucket are kept") {
    val out = mark(frame(
      1L -> Array(1f, 0.01f, 1f, 0f),
      2L -> Array(0.01f, 1f, 0f, 1f)), nBits = 2, tau = 0.9)
    assert(out.values.forall(_._2.isEmpty))
  }

  test("near-identical pair straddling a sign boundary is missed (recall cost)") {
    // cosine ≈ 1 but dim-1 signs differ ⇒ different buckets ⇒ not compared
    val out = mark(frame(
      1L -> Array(1e-6f, 1f, 1f, 1f),
      2L -> Array(-1e-6f, 1f, 1f, 1f)), nBits = 2, tau = 0.9)
    assert(out.values.forall(_._2.isEmpty))
    assert(out(1L)._1 != out(2L)._1)
  }

  test("signBucket weights dims 1..n by 1,2,4,…") {
    val df = frame(
      1L -> Array(1f, -1f, 1f, 0f), // bits: 1,0,1 ⇒ 5
      2L -> Array(-1f, 1f, -1f, 0f)) // bits: 0,1,0 ⇒ 2
    val got = df.select(col("vec_id"), SemDedup.signBucket(col("embedding"), 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 2L))
  }

  test("kmeans-clustered form marks planted duplicates in separated blobs") {
    val blobA = (1L to 20L).map(i => i -> Array(10f + i * 0.01f, 10f, 0f, 0f))
    val blobB = (21L to 40L).map(i => i -> Array(-10f, -10f - i * 0.01f, 0f, 0f))
    // plant exact duplicates of one member of each blob
    val dups = Seq(41L -> blobA.head._2.clone(), 42L -> blobB.head._2.clone())
    val df = frame((blobA ++ blobB ++ dups): _*)
    val out = SemDedup
      .markDuplicatesKMeans(df, "vec_id", "embedding", k = 2, tau = 0.999999)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out.size == 42)
    assert(out(41L) == Some(1L))
    assert(out(42L) == Some(21L))
  }

  test("dedupStats totals reconcile with the marked frame") {
    val df = frame(
      1L -> Array(1f, 1f, 0f, 0f),
      2L -> Array(1f, 1f, 0f, 0f),
      3L -> Array(1f, 1f, 0.1f, 0f),
      4L -> Array(-1f, -1f, 0f, 0f))
    val marked = SemDedup
      .markDuplicates(df, "vec_id", "embedding", SemDedup.signBucket(col("embedding"), 2), 0.95)
    val stats = SemDedup.dedupStats(marked).collect()
    assert(stats.map(_.getLong(1)).sum == 4L)
    assert(stats.map(_.getLong(2)).sum ==
      marked.filter(col("dup_of").isNotNull).count())
  }
}
