package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, arXiv:2303.09540): partition the embedding space into
  * clusters, compare pairs only WITHIN a cluster, and drop every document
  * whose cosine similarity to a kept lower-id document exceeds τ. The
  * cluster step is what makes the pair cost tractable — pairs are generated
  * by a bucket equi-join, never an all-pairs product, and the per-bucket
  * quadratic is bounded by the bucket size (the paper sizes k ∝ corpus so
  * clusters stay ~constant; here `signBucket` doubles the bucket count per
  * added bit).
  *
  * Two bucketing frontends over one shared kernel:
  *  - [[signBucket]] — axis-aligned sign bits of the first `nBits`
  *    dimensions. Deterministic from the raw floats (no arithmetic, no
  *    model state), hence reproducible by any engine — the driver-gate
  *    form. It is a genuine random-projection LSH family for cosine
  *    (hyperplanes = coordinate axes), at some recall cost vs learned
  *    clusters: near-duplicate pairs straddling an axis are missed.
  *  - KMeans cluster ids (graft.ml.Clustering.kmeans's `prediction`) — the
  *    paper's form, spec-tested (model-dependent, so no SQL oracle).
  */
object SemDedup {

  /** Bucket id from the sign bits of dimensions 1..nBits: Σ 2^(i-1)·[v_i > 0].
    * Raw float comparisons only — bit-reproducible across engines.
    */
  def signBucket(vec: Column, nBits: Int): Column = {
    require(nBits >= 1 && nBits <= 30, s"nBits must be in [1, 30]: $nBits")
    (1 to nBits)
      .map(i => when(element_at(vec, i) > 0f, lit(1L << (i - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Mark semantic duplicates within buckets: a row is a duplicate iff some
    * SAME-BUCKET row with a smaller id has cosine ≥ tau with it; `dup_of`
    * is the smallest such id (null for kept rows). Returns one row per
    * input: (idCol, bucket, dup_of).
    *
    * The keep-the-minimum rule is a single pair pass + aggregation — no
    * iterative chaining: transitive near-dups each point at their own
    * smallest matching neighbor, which is exactly the paper's greedy
    * per-cluster sweep order.
    */
  def markDuplicates(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      bucket: Column,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val base = emb
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"), bucket.as("bucket"))
    val lo = base.select(col("_id").as("_aid"), col("_v").as("_av"), col("bucket"))
    val hi = base.select(col("_id").as("_bid"), col("_v").as("_bv"), col("bucket"))
    val dupOf = lo
      .join(hi, Seq("bucket"))
      .filter(col("_aid") < col("_bid"))
      .filter(VectorFunctions.cosine(col("_av"), col("_bv")) >= tau)
      .groupBy(col("_bid"))
      .agg(min(col("_aid")).as("dup_of"))
    base
      .join(dupOf, col("_id") === col("_bid"), "left")
      .select(col("_id").as(idCol), col("bucket"), col("dup_of"))
  }

  /** The paper's clustered form: KMeans over the embeddings, then
    * [[markDuplicates]] keyed by the learned cluster id. Model-dependent
    * output (spec-gated, not oracle-gated).
    */
  def markDuplicatesKMeans(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tau: Double,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val withFeatures = emb
      .select(col(idCol), col(vecCol))
      .withColumn("features", array_to_vector(col(vecCol).cast("array<double>")))
    val clustered = graft.ml.Clustering.kmeans(withFeatures, k, seed)
    markDuplicates(clustered, idCol, vecCol, col("prediction").cast("long"), tau)
  }

  /** Dedup summary over a [[markDuplicates]] result: per-bucket totals and
    * the corpus-level removal rate shape used to tune τ.
    */
  def dedupStats(marked: DataFrame): DataFrame =
    marked
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("dup_of").isNotNull, 1L).otherwise(0L)).as("n_dups"))
      .orderBy(col("bucket"))
}
