package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, SparkSession}

/** Batched model inference over media rows — the M24 *data plane* (the
  * reference trains/serves a CNN, 猫狗大战分类.py:420-430; the Spark-side
  * contract is "load the session once per partition, stream rows through
  * it", which is what makes per-row inference viable at scale regardless of
  * the backend).
  *
  * The session protocol is real: model bytes are broadcast once per job,
  * deserialized ONCE per partition (counted, test-asserted), and applied
  * row-by-row through the lazy partition iterator. The bundled backend is a
  * dependency-free 2-layer MLP (ReLU hidden, softmax head) over the decode
  * stage's feature vector, with a versioned little-endian wire format — an
  * ONNX/DJL session drops into the same `ScorerSession` seam without
  * touching the Spark plumbing (this container has no ONNX runtime jar, and
  * build.sbt may not grow dependencies).
  */
object Inference {

  /** A loaded, ready-to-score model instance (one per partition). */
  trait ScorerSession extends Serializable {
    def labels: Array[String]
    /** Class scores (higher = more likely), one per label. */
    def score(features: Array[Float]): Array[Double]
  }

  /** 2-layer perceptron: softmax(W2 · relu(W1 · f + b1) + b2).
    * w1 is hidden×in, w2 is out×hidden, labels.length == out.
    */
  final case class MlpModel(
      labels: Array[String],
      w1: Array[Array[Float]],
      b1: Array[Float],
      w2: Array[Array[Float]],
      b2: Array[Float])
      extends ScorerSession {
    require(w1.length == b1.length, "hidden dims of w1/b1 differ")
    require(w2.length == b2.length && w2.length == labels.length, "output dims differ")

    def score(features: Array[Float]): Array[Double] = {
      val hidden = new Array[Double](w1.length)
      var i = 0
      while (i < w1.length) {
        val row = w1(i)
        var acc = b1(i).toDouble
        var j = 0
        val lim = math.min(row.length, features.length)
        while (j < lim) { acc += row(j) * features(j); j += 1 }
        hidden(i) = math.max(acc, 0.0)
        i += 1
      }
      val logits = new Array[Double](w2.length)
      var k = 0
      while (k < w2.length) {
        val row = w2(k)
        var acc = b2(k).toDouble
        var j = 0
        val lim = math.min(row.length, hidden.length)
        while (j < lim) { acc += row(j) * hidden(j); j += 1 }
        logits(k) = acc
        k += 1
      }
      // max-shifted softmax (overflow-safe)
      val m = logits.max
      val exps = logits.map(l => math.exp(l - m))
      val z = exps.sum
      exps.map(_ / z)
    }

    /** Versioned wire format: magic "GMLP", version, label strings (UTF),
      * then each matrix/vector with explicit dims — forward-portable and
      * independent of JVM serialization.
      */
    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(0x474d4c50) // "GMLP"
      out.writeInt(1)
      out.writeInt(labels.length)
      labels.foreach(out.writeUTF)
      def mat(m: Array[Array[Float]]): Unit = {
        out.writeInt(m.length)
        out.writeInt(if (m.isEmpty) 0 else m(0).length)
        m.foreach(_.foreach(out.writeFloat))
      }
      def vec(v: Array[Float]): Unit = { out.writeInt(v.length); v.foreach(out.writeFloat) }
      mat(w1); vec(b1); mat(w2); vec(b2)
      out.flush()
      bos.toByteArray
    }
  }

  object MlpModel {
    def fromBytes(bytes: Array[Byte]): MlpModel = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      require(in.readInt() == 0x474d4c50, "not a GMLP model payload")
      val version = in.readInt()
      require(version == 1, s"unsupported GMLP version $version")
      val labels = Array.fill(in.readInt())(in.readUTF())
      def mat(): Array[Array[Float]] = {
        val r = in.readInt(); val c = in.readInt()
        Array.fill(r)(Array.fill(c)(in.readFloat()))
      }
      def vec(): Array[Float] = Array.fill(in.readInt())(in.readFloat())
      MlpModel(labels, mat(), vec(), mat(), vec())
    }
  }

  /** Sessions deserialized since JVM start — local-mode observable proof
    * that the model loads per PARTITION, not per row.
    */
  val sessionLoads = new AtomicLong(0)

  /** Score every media row: broadcast the model bytes once, deserialize one
    * session per partition, stream the partition through it. Label = argmax
    * class, score = its softmax probability.
    */
  def scoreWithModel(
      spark: SparkSession,
      media: Dataset[Multimodal.DecodedMedia],
      modelBytes: Array[Byte]): Dataset[Multimodal.Scored] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(modelBytes)
    media.mapPartitions { it =>
      val session: ScorerSession = MlpModel.fromBytes(bc.value)
      sessionLoads.incrementAndGet()
      it.map { m =>
        val probs = session.score(m.features)
        var best = 0
        var i = 1
        while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
        Multimodal.Scored(m.path, session.labels(best), probs(best))
      }
    }
  }
}
