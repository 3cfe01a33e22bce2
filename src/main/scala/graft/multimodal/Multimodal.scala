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
  * IMAGE decode is REAL (round 4): `decodeImage` parses the actual payload
  * with `javax.imageio` (JPEG/PNG/GIF/BMP — the JDK's bundled codecs, no
  * external deps), reads true width/height/channels, and extracts a
  * deterministic mean-RGB grid feature vector from the decoded pixels —
  * the same resize-to-fixed-grid + pixel-statistics shape the reference
  * feeds its classifier (猫狗大战分类.py:143-152, :75-94). Payloads ImageIO
  * cannot parse (audio/video stand-ins, corrupt files) fall back to
  * `stubDecode`, the documented deterministic fake, so mixed-modality
  * directories decode in one pass without a partial failure.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  case class DecodedMedia(path: String, meta: MediaMeta, features: Array[Float])
  case class Scored(path: String, label: String, score: Double)

  /** Real image decode: parse `bytes` with the JDK's ImageIO codecs. Returns
    * None when no installed reader recognizes the payload (then callers fall
    * back to [[stubDecode]]). Meta carries the TRUE pixel dims, the color
    * model's component count, and the container format reported by the
    * matched reader (not the file extension — a mislabeled .jpg that is
    * really a PNG reports "png").
    *
    * Features: mean R,G,B per cell over a `featureDim/3`-cell vertical-strip
    * grid of the decoded raster, normalized to [0,1] — a fixed-size,
    * resolution-independent signature (the downsample-then-summarize step of
    * an image pipeline, with the summary deterministic and cheap enough to
    * assert exactly in tests). featureDim not divisible by 3 pads the tail
    * with zeros so the declared dim is always honored.
    */
  def decodeImage(path: String, bytes: Array[Byte], featureDim: Int): Option[DecodedMedia] =
    readImage(bytes).map { case (img, fmt) =>
      val meta = MediaMeta(
        width = img.getWidth,
        height = img.getHeight,
        channels = img.getColorModel.getNumComponents,
        format = fmt)
      DecodedMedia(path, meta, gridMeanRgb(img, featureDim))
    }

  /** Decode bytes to a raster + format name. None when no installed reader
    * recognizes the payload OR the recognized reader fails on a corrupt
    * body — JDK ImageIO readers throw UNCHECKED exceptions (AIOOBE,
    * NegativeArraySize, IllegalArgument) on truncated/crafted input, so the
    * guard is NonFatal, not IOException: a bad file must fall back, never
    * kill the task.
    */
  private[multimodal] def readImage(
      bytes: Array[Byte]): Option[(java.awt.image.BufferedImage, String)] = {
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(in)
        Some((reader.read(0), reader.getFormatName.toLowerCase(java.util.Locale.ROOT)))
      } finally reader.dispose()
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally if (in != null) in.close()
  }

  /** Mean R,G,B per vertical strip (strip i = columns [i·w/n, (i+1)·w/n)),
    * n = featureDim/3 strips, values in [0,1]; zero-padded tail if
    * featureDim % 3 != 0. Layout: [r0,g0,b0, r1,g1,b1, …].
    */
  private[multimodal] def gridMeanRgb(img: java.awt.image.BufferedImage, featureDim: Int): Array[Float] = {
    val n = math.max(featureDim / 3, 1)
    val w = img.getWidth
    val h = img.getHeight
    val out = Array.fill(featureDim)(0f)
    val sums = Array.fill(n, 3)(0L)
    val counts = Array.fill(n)(0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val strip = math.min(x.toLong * n / w, n - 1).toInt
        val rgb = img.getRGB(x, y)
        sums(strip)(0) += (rgb >> 16) & 0xff
        sums(strip)(1) += (rgb >> 8) & 0xff
        sums(strip)(2) += rgb & 0xff
        counts(strip) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < n && i * 3 + 2 < featureDim) {
      if (counts(i) > 0) {
        out(i * 3) = (sums(i)(0).toDouble / counts(i) / 255.0).toFloat
        out(i * 3 + 1) = (sums(i)(1).toDouble / counts(i) / 255.0).toFloat
        out(i * 3 + 2) = (sums(i)(2).toDouble / counts(i) / 255.0).toFloat
      }
      i += 1
    }
    out
  }

  /** STUB decode: deterministic pseudo-decode for payloads with no installed
    * codec (audio/video stand-ins). Derives meta + features from a content
    * hash so tests are reproducible.
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

  /** Decode a binaryFile frame (path, content) into typed media rows —
    * real ImageIO decode with stub fallback for non-image payloads.
    * One `mapPartitions` pass; the iterator is lazy, so content bytes of a
    * partition never materialize together.
    */
  def decode(spark: SparkSession, files: DataFrame, featureDim: Int = 16): Dataset[DecodedMedia] = {
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, b) =>
        decodeImage(p, b, featureDim).getOrElse(stubDecode(p, b, featureDim))
      })
  }

  /** Decode + REAL resize in one partition pass: ImageIO decode, bilinear
    * rescale to `w`×`h` through Graphics2D, features from the RESIZED
    * raster — the fixed-input-size preprocessing stage of an image model
    * (猫狗大战分类.py resizes every image to one grid before the classifier).
    * Non-image payloads take the stub path with meta retargeted, keeping
    * mixed directories total.
    */
  def decodeResized(
      spark: SparkSession,
      files: DataFrame,
      w: Int,
      h: Int,
      featureDim: Int = 16): Dataset[DecodedMedia] = {
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, b) =>
        // one decode per row: readImage hands back the raster, which feeds
        // the resize directly (decode dominates this stage's CPU)
        val resized = readImage(b).map { case (src, _) =>
          val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          DecodedMedia(
            p,
            MediaMeta(w, h, src.getColorModel.getNumComponents, "rgb"),
            gridMeanRgb(dst, featureDim))
        }
        resized.getOrElse {
          val stub = stubDecode(p, b, featureDim)
          stub.copy(meta = stub.meta.copy(width = w, height = h))
        }
      })
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

  /** CONTENT-based keyframe selection over the fixed-chunk frame format:
    * the scene-change detector of a video ingest pipeline. A frame is a
    * keyframe when the fraction of bytes differing from the PREVIOUS frame
    * is ≥ `minChangeFrac` (frame 0 always is — there is no previous scene).
    * A real codec would replace only the frame iterator (decode to rasters,
    * score with the same change metric on pixels); the selection logic,
    * per-row narrow pass (no shuffle — the scan order IS the frame order
    * within a row), and output contract are the production shape.
    *
    * Returns (path, frame_idx, change_frac, frame_bytes) — change_frac is
    * −1.0 for frame 0 (sentinel: unconditionally kept, no score defined).
    */
  def keyFrames(
      spark: SparkSession,
      files: DataFrame,
      chunkBytes: Int,
      minChangeFrac: Double): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive: $chunkBytes")
    require(minChangeFrac >= 0.0 && minChangeFrac <= 1.0,
      s"minChangeFrac must be in [0, 1]: $minChangeFrac")
    import spark.implicits._
    files
      .select(col("path").cast("string"), col("content").cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val frames = content.grouped(chunkBytes).toArray
        var prev: Array[Byte] = null
        frames.iterator.zipWithIndex.flatMap { case (f, i) =>
          val out =
            if (prev == null) Some((path, i, -1.0, f))
            else {
              val n = math.max(f.length, prev.length)
              var diff = 0
              var b = 0
              val common = math.min(f.length, prev.length)
              while (b < common) {
                if (f(b) != prev(b)) diff += 1
                b += 1
              }
              diff += n - common // length mismatch counts as changed bytes
              val frac = if (n == 0) 0.0 else diff.toDouble / n
              if (frac >= minChangeFrac) Some((path, i, frac, f)) else None
            }
          prev = f
          out
        }
      }
      .toDF("path", "frame_idx", "change_frac", "frame_bytes")
  }
}
