package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension; SURVEY.md §7.2 phase 5).
  *
  * Design: media are opaque `binary` columns + a typed metadata struct
  * (width/height/channels/format). Decode, feature-extract, and batch
  * inference run as `mapPartitions` stages — per-partition setup cost
  * amortized over the partition (the Scala-native analog of batched pandas
  * UDF inference, 猫狗大战分类.py:420-430).
  *
  * The decode kernels are STUBS (no image/audio codecs in this environment):
  * `stubDecode` derives deterministic pseudo-metadata and a fixed-size
  * feature vector from the bytes. The Spark-side plumbing — schema, batch
  * shape, partition-wise model loading, pipeline composition — is real and
  * tested; swapping a real codec in changes only the function body.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  case class DecodedMedia(path: String, meta: MediaMeta, features: Array[Float])
  case class Scored(path: String, label: String, score: Double)

  /** STUB decode: deterministic pseudo-decode of binary content. A real
    * implementation would parse the image header for meta and decode pixels;
    * this derives both from a content hash so tests are reproducible.
    */
  def stubDecode(path: String, bytes: Array[Byte], featureDim: Int): DecodedMedia = {
    val h = java.util.Arrays.hashCode(bytes)
    val meta = MediaMeta(
      width = 64 + math.abs(h % 960),
      height = 64 + math.abs((h / 7) % 960),
      channels = 3,
      format = path.substring(path.lastIndexOf('.') + 1))
    val rnd = new scala.util.Random(h.toLong)
    DecodedMedia(path, meta, Array.fill(featureDim)(rnd.nextFloat()))
  }

  /** Decode a binaryFile frame (path, content) into typed media rows.
    * One `mapPartitions` pass; the iterator is lazy, so content bytes of a
    * partition never materialize together.
    */
  def decode(spark: SparkSession, files: DataFrame, featureDim: Int = 16): Dataset[DecodedMedia] = {
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, b) => stubDecode(p, b, featureDim) })
  }

  /** Batch model inference via mapPartitions: the "model" (a STUB scorer —
    * real use: an ONNX/DJL session) is instantiated ONCE per partition and
    * applied to every row, the pattern that makes per-row inference viable
    * at scale.
    */
  def scorePartitions(spark: SparkSession, media: Dataset[DecodedMedia]): Dataset[Scored] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // once-per-partition setup (stands in for loading model weights)
      val model: Array[Float] => Double = f => f.map(_.toDouble).sum / math.max(f.length, 1)
      it.map { m =>
        val s = model(m.features)
        Scored(m.path, if (s >= 0.5) "dog" else "cat", s)
      }
    }
  }

  /** STUB resize: the per-row media-transform stage (real impl: pixel
    * resample to `w`×`h`). Meta reflects the target dims; the stub features
    * are re-derived deterministically from (original features, target) so
    * downstream stages observe a resize-dependent value, as they would with
    * real pixels. Pure narrow map — composes into the same partition pass
    * as decode under whole-stage planning.
    */
  def resize(spark: SparkSession, media: Dataset[DecodedMedia], w: Int, h: Int): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val scale = (w.toFloat * h) / math.max(m.meta.width.toFloat * m.meta.height, 1f)
      m.copy(
        meta = m.meta.copy(width = w, height = h),
        features = m.features.map(_ * scale))
    })
  }

  /** Deterministic frame sampling for a "video" column: every k-th chunk of
    * the binary payload becomes a frame row (stub for keyframe extraction —
    * the explode/posexplode plumbing is the real part).
    */
  def sampleFrames(files: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    files.select(
      col("path"),
      posexplode(
        filter(
          transform(
            sequence(lit(0), (length(col("content")) / chunkBytes).cast("int")),
            i => when(i % everyK === 0, substring(col("content"), i * chunkBytes + 1, lit(chunkBytes)))),
          c => c.isNotNull)).as(Seq("frame_idx", "frame_bytes")))
}
