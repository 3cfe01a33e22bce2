package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopK, VectorFunctions}
import graft.operators.{Pin, SemDedup}

/** Contrastive-pair mining — the training-data prep for embedding models
  * (E5/GTE-style: positives from near-duplicate detection, hard negatives
  * from high-similarity non-duplicates). Each mined triplet is
  * (anchor, positive, negative): `positive` is a near-dup of `anchor`
  * (cosine ≥ tauPos inside a bucket), `negative` is the corpus vector MOST
  * similar to the anchor while still below tauPos — the hard negative that
  * makes the contrastive loss informative (a random negative is trivially
  * separable).
  *
  * Scale shape: positives ride SemDeDup's bucket equi-join (never
  * all-pairs). Hard negatives score the ANCHOR set (|anchors| ≤ number of
  * near-dup pairs, typically ≪ corpus) broadcast against the streamed
  * corpus with the bounded-heap top-k aggregation — the declared
  * brute-force-exact baseline of the kNN family; swap the scorer for
  * `VectorFunctions.ivfTopK` at cluster scale, same contract as q14/q45.
  */
object Contrastive {

  /** Mine triplets from `emb` (idCol: long-castable, vecCol: float array).
    * Returns (anchor, positive, negative, pos_sim, neg_sim) — one row per
    * near-dup pair, the anchor's single hardest negative repeated across
    * its positives. Deterministic: pair generation keeps the lowest
    * matching id (SemDeDup), negative ranking ties break on id.
    *
    * `pin` controls how the multiply-read pair frame is held: the default
    * LOCAL checkpoint is fastest but not fault-tolerant to executor loss —
    * elastic clusters should pass [[Pin.Persist]] (see [[Pin]]).
    */
  def mineTriplets(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      bucket: Column,
      tauPos: Double,
      pin: Pin = Pin.LocalCheckpoint): DataFrame = {
    val base = emb.select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))

    // pin: the bucketed cosine pair-join feeds THREE plan branches (anchor
    // vectors, negative scoring, positive similarities) and would re-run
    // per branch otherwise
    val pos = pin(SemDedup
      .markDuplicates(emb, idCol, vecCol, bucket, tauPos)
      .filter(col("dup_of").isNotNull)
      .select(col("dup_of").as("anchor"), col(idCol).cast("long").as("positive")))

    val anchorVecs = pos.select(col("anchor")).distinct()
      .join(base, col("anchor") === col("_id"))
      .select(col("anchor"), col("_v").as("_av"))

    // broadcast anchors × streamed corpus; candidates strictly below tauPos
    // (the anchor's positives sit at/above it, so they self-exclude)
    val scored = base
      .crossJoin(broadcast(anchorVecs))
      .filter(col("_id") =!= col("anchor"))
      .withColumn("_sim", VectorFunctions.cosine(col("_av"), col("_v")))
      .filter(col("_sim") < tauPos)
    val negatives = TopK
      .topKPerKey(scored, "anchor", col("_sim"), col("_id"), lit(0L), k = 1)
      .select(col("anchor"), col("id").as("negative"), col("sim").as("neg_sim"))

    val posSim = pos
      .join(anchorVecs, Seq("anchor"))
      .join(base, col("positive") === col("_id"))
      .select(col("anchor"), col("positive"),
        VectorFunctions.cosine(col("_av"), col("_v")).as("pos_sim"))

    posSim
      .join(negatives, Seq("anchor"))
      .select(col("anchor"), col("positive"), col("negative"),
        col("pos_sim"), col("neg_sim"))
  }

  /** [[mineTriplets]] with the hard-negative scorer swapped for the STORED
    * IVF index — the "swap the scorer for ivfTopK at cluster scale" note
    * above made executable against the persisted artifact
    * ([[graft.functions.IvfIndex]]): a standing daily mining service stops
    * re-streaming the corpus per anchor batch AND stops re-fitting the
    * quantizer per tick — negatives come from a partition-pruned probe of
    * the anchor's `nProbe` nearest cells (sub-threshold filter BEFORE the
    * bounded heap, so the hardest sub-tauPos candidate in the probed cells
    * wins). Positives are unchanged (SemDeDup's bucket equi-join).
    *
    * Approximate by construction: a negative hiding in an unprobed cell is
    * missed — recall rises with `nProbe`, and at `nProbe == nCells` the
    * output EQUALS [[mineTriplets]] row for row AFTER 6-dp canonicalization
    * (ContrastiveSpec pins it): `neg_sim` here rides the probe's ranked
    * output, which rounds sim to 6 dp, where the inline scorer emits the
    * raw double — the rows and ranking are identical, the similarity
    * differs below the 6th decimal.
    * The index must hold the same vectors `emb` carries (same idCol/vecCol
    * values); anchors absent from a probed cell self-exclude by id as in
    * the inline path.
    */
  def mineTripletsIndexed(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      bucket: Column,
      tauPos: Double,
      index: graft.functions.IvfIndex.Handle,
      nProbe: Int,
      pin: Pin = Pin.LocalCheckpoint): DataFrame = {
    val base = emb.select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"))
    val pos = pin(SemDedup
      .markDuplicates(emb, idCol, vecCol, bucket, tauPos)
      .filter(col("dup_of").isNotNull)
      .select(col("dup_of").as("anchor"), col(idCol).cast("long").as("positive")))
    val anchorVecs = pos.select(col("anchor")).distinct()
      .join(base, col("anchor") === col("_id"))
      .select(col("anchor"), col("_v").as("_av"))
    val negatives = graft.functions.IvfIndex
      .probe(index, anchorVecs, "anchor", "_av", k = 1, nProbe = nProbe,
        maxSimExclusive = Some(tauPos))
      .select(col("anchor"), col(index.idCol).cast("long").as("negative"),
        col("sim").as("neg_sim"))
    val posSim = pos
      .join(anchorVecs, Seq("anchor"))
      .join(base, col("positive") === col("_id"))
      .select(col("anchor"), col("positive"),
        VectorFunctions.cosine(col("_av"), col("_v")).as("pos_sim"))
    posSim
      .join(negatives, Seq("anchor"))
      .select(col("anchor"), col("positive"), col("negative"),
        col("pos_sim"), col("neg_sim"))
  }
}
