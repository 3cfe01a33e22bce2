package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding / similarity-search operators (north-star extensions).
  *
  * Vectors are plain `array<float>` columns (the TESTDATA `embeddings`
  * schema); all arithmetic is done in double via higher-order functions
  * (`zip_with` + `aggregate`) — codegen'd, no UDFs.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (→ null, not NaN).
    * Native fused expression — the HOF composition (dot + two norms as three
    * interpreted folds) was the bottleneck of the brute-force kNN queries.
    * Bit-identical arithmetic (same per-accumulator summation order).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSimilarity(a, b)

  /** Final per-query ranking shared by all the top-k variants: bounded-heap
    * partial top-k (TopK.topKPerKey) instead of
    * `row_number().over(Window.partitionBy(qId))` — the window form shuffles
    * every scored pair onto n_query reducers (each reducer holding a full
    * corpus's scores at scale); the aggregator reduces each map partition to
    * ≤ 2k entries per query before the exchange.
    */
  private[functions] def rankTopK(
      scored: DataFrame,
      qId: String,
      cId: String,
      simCol: Column,
      k: Int): DataFrame = {
    val cIdType = scored.schema(cId).dataType
    // the aggregator carries the candidate id as a Long slot; an integral id
    // type round-trips losslessly, anything else ('0042' strings, doubles)
    // would silently merge or null out — refuse instead
    require(
      Seq(org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(cIdType),
      s"top-k candidate id column '$cId' must be integral, got ${cIdType.catalogString}")
    TopK
      .topKPerKey(scored, qId, simCol, col(cId).cast("long"), lit(0L), k)
      .select(
        col(qId),
        col("id").cast(cIdType).as(cId),
        round(col("sim") + lit(1e-9), 6).as("sim"),
        col("rank"))
  }

  /** Brute-force exact top-k cosine neighbors: every row of `queries` against
    * every row of `corpus`. The query side is broadcast (it is the small
    * side by construction), so the plan is a BroadcastNestedLoopJoin that
    * streams the corpus once — the right baseline shape: at 100 TB corpus ×
    * small query batch there is no shuffle of the corpus at all.
    * Ties broken by ascending corpus id for determinism.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String,
      cId: String,
      qVec: String,
      cVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("_sim", cosine(col(qVec), col(cVec)))
    rankTopK(scored, qId, cId, col("_sim"), k)
  }

  /** IVF-style approximate top-k (the inverted-file ANN pattern): a KMeans
    * coarse quantizer (k ≈ √corpus) assigns every corpus vector to a cell;
    * each query probes its `nProbe` nearest centroids and scores exactly
    * ONLY within those cells. At scale the corpus is pre-partitioned by cell
    * (the "inverted file"), so a query touches nProbe/k of the data — the
    * candidate join is an equi-join on cell id, never a cross join.
    *
    * Returns (qId, cId, sim, rank). Recall < 1 by construction; raise
    * `nProbe` to trade compute for recall.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String,
      cId: String,
      qVec: String,
      cVec: String,
      k: Int,
      nCells: Int,
      nProbe: Int,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

    val corpusVec = corpus.withColumn("_fv", array_to_vector(col(cVec).cast("array<double>")))
    // the quantizer only PARTITIONS the corpus — recall comes from nProbe,
    // and correctness from exact in-cell scoring — so a loosely converged
    // clustering is as good as a tight one; 10 iterations, not the default 20
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("_fv").fit(corpusVec)
    val assigned = km.transform(corpusVec).withColumnRenamed("prediction", "_cell").drop("_fv")

    // centroid table is tiny (nCells rows) — broadcast to rank cells per query
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq
      .toDF("_cell", "_centroid")
    // nProbe nearest cells per query, via the same bounded partial top-k —
    // at 1M queries × √corpus cells a window over the (query × centroid)
    // pairs would be its own full shuffle.
    val qCellScores = queries
      .crossJoin(broadcast(centroids))
      .withColumn("_csim", cosine(col(qVec), col("_centroid")))
    val qCells = TopK
      .topKPerKey(qCellScores, qId, col("_csim"), col("_cell").cast("long"), lit(0L), nProbe)
      .select(col(qId), col("id").cast("int").as("_cell"))
      .join(queries, Seq(qId))

    val scored = assigned
      .join(broadcast(qCells), Seq("_cell"))
      .filter(col(qId) =!= col(cId))
      .withColumn("_sim", cosine(col(qVec), col(cVec)))
    rankTopK(scored, qId, cId, col("_sim"), k)
  }

  /** LSH-bucketed approximate top-k: random-hyperplane signatures (the same
    * family as `BucketedRandomProjectionLSH`, expressed natively). Vectors
    * whose sign-pattern under `nPlanes` fixed pseudo-random hyperplanes
    * matches land in the same bucket; candidates are generated by a bucket
    * equi-join (shuffle on a small int key instead of a cross join) and then
    * scored exactly. Recall < 1.0 by construction; `nTables` independent
    * bucketings raise it.
    *
    * The hyperplanes are derived deterministically from xxhash64(seed, dim,
    * plane) so the operator needs no driver-side randomness and replays
    * identically at any scale.
    */
  def lshBucketTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String,
      cId: String,
      qVec: String,
      cVec: String,
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      nTables: Int = 4): DataFrame = {

    def sigs(df: DataFrame, idCol: String, vecCol: String) =
      df.select(
        col(idCol),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("t"), lshSignature(col(vecCol), t, nPlanes, dim).as("b"))): _*)).as("tb"))
        .select(col(idCol), col("tb.t").as("t"), col("tb.b").as("b"))

    // Candidate generation moves ONLY ids: one signature pass per side, the
    // bucket join against the broadcast query signatures is map-side, and
    // the (qId, cId) dedup shuffles two ids per candidate — never vectors.
    val candIds = sigs(corpus, cId, cVec)
      .join(broadcast(sigs(queries, qId, qVec)), Seq("t", "b"))
      .filter(col(qId) =!= col(cId))
      .select(col(qId), col(cId))
      .dropDuplicates(qId, cId)

    // Scoring re-reads only the candidate corpus rows (broadcast semi
    // filter — candidate ids are bounded by n_queries × nTables × bucket
    // occupancy, small whenever the query batch is), so the corpus itself
    // is never shuffled, mirroring the bruteForceTopK contract.
    val candCorpus = corpus.join(
      broadcast(candIds.select(col(cId)).dropDuplicates(cId)), Seq(cId), "left_semi")
    val scored = candCorpus
      .join(broadcast(candIds), Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .withColumn("_sim", cosine(col(qVec), col(cVec)))
    rankTopK(scored, qId, cId, col("_sim"), k)
  }

  /** Sign-pattern bucket id of `vec` under `nPlanes` fixed hyperplanes for
    * LSH table `t` (random-hyperplane a.k.a. SimHash family: P[bit match] =
    * 1 − angle/π). Native single-node expression (LshBucketExpr) — the
    * composed element_at/multiply Column tree had nPlanes×dim nodes per
    * signature and made Catalyst planning, not execution, the near-dup
    * bottleneck. `dim` is taken from the runtime vector length; the
    * parameter is kept for API stability.
    */
  def lshSignature(vec: Column, t: Int, nPlanes: Int, dim: Int): Column =
    graft.expressions.VectorExpressions.lshBucket(vec, t, nPlanes)

  /** All pairs with cosine ≥ `threshold` (embedding near-duplicates).
    *
    * Two physical paths behind one logical contract:
    *   - corpus ≤ `exactGateRows`: exhaustive self-join — exact, and the
    *     oracle baseline for tests/small batches.
    *   - larger corpus: LSH-bucketed candidate generation — per table, a
    *     self-EQUI-join on the hyperplane bucket key (shuffleable,
    *     AQE-partitionable; no CartesianProduct / BroadcastNestedLoop over
    *     the corpus) — then exact cosine verification of candidates only.
    *     Output ⊆ exact output (verification is exact); recall governed by
    *     (nPlanes, nTables): miss probability per pair at similarity s is
    *     (1 − (1 − acos(s)/π)^nPlanes)^nTables. The defaults (8, 8) are
    *     sized for the real near-dup regime (s ≥ 0.9 → ~94% recall; s ≥
    *     0.95 → ~99.8%) while keeping buckets fine-grained (2^8 per table —
    *     candidate volume ~nTables/2^nPlanes of the cross product). A LOW
    *     threshold like 0.4 is inherently LSH-hostile (per-table collision
    *     0.63^8 ≈ 2.5%): there the exact path, a higher nTables, or
    *     fewer planes with the candidate-volume cost is the trade — all-pairs
    *     at low s is output-bound O(n²) no matter the algorithm.
    *
    * The count() gate is one cheap metadata-ish job per call; at 100 TB the
    * caller knows the corpus is big and the gate short-circuits into the
    * bucketed path.
    */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      exactGateRows: Long = 1000L,
      nPlanes: Int = 8,
      nTables: Int = 8): DataFrame = {
    val exact = corpus.count() <= exactGateRows
    val a = corpus.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = corpus.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    val candidates =
      if (exact) a.crossJoin(b).filter(col("id1") < col("id2"))
      else {
        // One signature pass over the corpus (explode over tables) instead of
        // 2×nTables recomputations; the candidate self-join and the pair
        // dedup carry ONLY (table, bucket, id) — the payload vectors rejoin
        // by id after dedup, so the widest shuffle moves ids, not 2×dim
        // floats per candidate. With b = 2^nPlanes buckets per table the
        // candidate volume is ~nTables·n²/b pairs, not n²/4 — sizing the
        // bucket count, not the join strategy, is what keeps this sub-cross.
        val sigs = corpus
          .select(
            col(idCol).as("id"),
            explode(array((0 until nTables).map(tb =>
              struct(lit(tb).as("t"), lshSignature(col(vecCol), tb, nPlanes, dim).as("b"))): _*)).as("tb"))
          .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
        val pairIds = sigs
          .join(sigs.select(col("id").as("id2"), col("t"), col("b")), Seq("t", "b"))
          .filter(col("id") < col("id2"))
          .select(col("id").as("id1"), col("id2"))
          .dropDuplicates("id1", "id2")
        pairIds
          .join(a.withColumnRenamed("id1", "jid1"), col("id1") === col("jid1")).drop("jid1")
          .join(b.withColumnRenamed("id2", "jid2"), col("id2") === col("jid2")).drop("jid2")
      }
    candidates
      .withColumn("sim", cosine(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), col("sim"))
  }

  /** Int8 scalar quantization of a float/double vector: per-vector affine
    * codes — `round((x − min)/scale)` ∈ [0, 255] with
    * `scale = (max − min)/255` — the standard 4×-at-rest memory trade for
    * billion-scale ANN corpora (a 128-dim float32 vector is 512 B; codes +
    * two doubles are ~144 B, and the int codes dictionary/bit-pack further
    * in parquet). Per-component reconstruction error ≤ scale/2.
    *
    * Returns struct(qmin double, qscale double, q array<int>). This is the
    * INGEST path (one pass), so interpreted HOFs are fine — the struct is
    * built through a single-element `transform` so min/scale are bound once
    * per row, not re-evaluated per element (the bindOnce pattern).
    */
  def quantizeInt8(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    element_at(
      transform(
        array(struct(
          d.as("v"),
          array_min(d).as("mn"),
          greatest((array_max(d) - array_min(d)) / lit(255.0), lit(1e-12)).as("sc"))),
        s =>
          struct(
            s.getField("mn").as("qmin"),
            s.getField("sc").as("qscale"),
            transform(
              s.getField("v"),
              // +1e-9 before the half-up round: pins boundary codes to the
              // same side as the SQL oracle's round()
              x => round((x - s.getField("mn")) / s.getField("sc") + lit(1e-9), 0)
                .cast("int")).as("q"))),
      1)
  }

  /** Inverse of `quantizeInt8`: the (lossy) reconstructed double vector
    * `code · scale + min`, directly usable by `cosine`/`bruteForceTopK`.
    * The quantized struct is bound once per row (not per element) — if the
    * optimizer collapses projections, an unbound reference would re-evaluate
    * the whole quantization expression per component.
    */
  def dequantize(qs: Column): Column =
    element_at(
      transform(
        array(qs),
        s =>
          transform(
            s.getField("q"),
            c => c.cast("double") * s.getField("qscale") + s.getField("qmin"))),
      1)
}
