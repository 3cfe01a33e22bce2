package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Sources

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("media")
    d.toFile.deleteOnExit()
    (1 to 6).foreach { i =>
      val label = if (i % 2 == 0) "dog" else "cat"
      Files.write(Paths.get(d.toString, s"$label.$i.jpg"), Array.fill[Byte](32 + i)(i.toByte))
    }
    d.toString
  }

  test("decode produces typed metadata + fixed-dim features per file") {
    val media = Multimodal.decode(spark, Sources.binaryDir(spark, dir, "*.jpg"), featureDim = 8)
    val rows = media.collect()
    assert(rows.length == 6)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(m => m.meta.channels == 3 && m.meta.format == "jpg"))
    assert(rows.forall(m => m.meta.width >= 64 && m.meta.height >= 64))
  }

  test("decode is deterministic (same bytes -> same features)") {
    val m1 = Multimodal.decode(spark, Sources.binaryDir(spark, dir, "*.jpg"), 8)
      .collect().map(m => m.path -> m.features.toSeq).toMap
    val m2 = Multimodal.decode(spark, Sources.binaryDir(spark, dir, "*.jpg"), 8)
      .collect().map(m => m.path -> m.features.toSeq).toMap
    assert(m1 == m2)
  }

  test("scorePartitions classifies every row with a bounded score") {
    val media = Multimodal.decode(spark, Sources.binaryDir(spark, dir, "*.jpg"), 8)
    val scored = Multimodal.scorePartitions(spark, media).collect()
    assert(scored.length == 6)
    assert(scored.forall(s => s.score >= 0.0 && s.score <= 8.0))
    assert(scored.forall(s => s.label == "cat" || s.label == "dog"))
  }

  test("resize retargets metadata and scales features deterministically") {
    val media = Multimodal.decode(spark, Sources.binaryDir(spark, dir, "*.jpg"), 8)
    val before = media.collect().map(m => m.path -> m).toMap
    val after = Multimodal.resize(spark, media, 224, 224).collect()
    assert(after.length == 6)
    after.foreach { m =>
      assert(m.meta.width == 224 && m.meta.height == 224)
      val orig = before(m.path)
      val scale = (224f * 224f) / (orig.meta.width.toFloat * orig.meta.height)
      orig.features.zip(m.features).foreach { case (a, b) =>
        assert(math.abs(a * scale - b) < 1e-5f)
      }
    }
  }

  test("sampleFrames explodes every k-th chunk with frame indices") {
    val files = Seq(("v1", Array.fill[Byte](100)(7))).toDF("path", "content")
    val frames = Multimodal.sampleFrames(files, chunkBytes = 10, everyK = 2).collect()
    // chunks at offsets 0..10 (11 positions), every 2nd -> 6 frames
    assert(frames.length == 6)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == (0 to 5))
  }
}
