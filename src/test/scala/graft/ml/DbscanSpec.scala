package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two dense blobs cluster; far outliers are noise") {
    val rng = new scala.util.Random(42)
    val blobA = (0 until 60).map(i => (i.toLong, rng.nextGaussian() * 0.2, rng.nextGaussian() * 0.2))
    val blobB = (60 until 120).map(i => (i.toLong, 10 + rng.nextGaussian() * 0.2, 10 + rng.nextGaussian() * 0.2))
    val noise = Seq((200L, 50.0, -50.0), (201L, -40.0, 70.0))
    val pts = (blobA ++ blobB ++ noise).toDF("id", "x", "y")

    val out = Dbscan.fit(pts, "id", "x", "y", eps = 1.0, minPts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val clustersA = blobA.map(p => out(p._1)).toSet
    val clustersB = blobB.map(p => out(p._1)).toSet
    assert(clustersA.size == 1 && !clustersA.contains(-1L), s"blob A fragmented: $clustersA")
    assert(clustersB.size == 1 && !clustersB.contains(-1L), s"blob B fragmented: $clustersB")
    assert(clustersA != clustersB, "blobs must be distinct clusters")
    assert(out(200L) == -1L && out(201L) == -1L, "outliers must be noise")
  }

  test("chain of points within eps forms ONE cluster (transitive closure)") {
    // points spaced 0.9 apart with eps=1: each only sees neighbors, but the
    // cluster must close transitively through label propagation
    val pts = (0 until 30).map(i => (i.toLong, i * 0.9, 0.0)).toDF("id", "x", "y")
    val out = Dbscan.fit(pts, "id", "x", "y", eps = 1.0, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.values.toSet.size == 1, s"chain fragmented: ${out.values.toSet}")
    assert(!out.values.toSet.contains(-1L))
  }

  test("border points adopt a neighboring core's cluster") {
    // dense core at origin + one point at distance 0.9 with only 2 neighbors
    val core = (0 until 10).map(i => (i.toLong, (i % 3) * 0.1, (i / 3) * 0.1))
    val border = Seq((100L, 1.0, 0.0))
    val pts = (core ++ border).toDF("id", "x", "y")
    val out = Dbscan.fit(pts, "id", "x", "y", eps = 1.0, minPts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(100L) != -1L, "border point should join the cluster")
    assert(out(100L) == out(0L))
  }
}
