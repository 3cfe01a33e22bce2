package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED inverted-file (IVF) ANN index — the embedding tier's member of
  * the stored-index family (signature/postings X37/X37b, decontamination
  * bloom X42/X46): coarse-quantizer centroids plus cell-partitioned vectors
  * as parquet, with the same lifecycle verbs the other index tiers carry —
  * probe, append, drift report, rebuild. [[VectorFunctions.ivfTopK]]
  * recomputes the quantizer on every call, which is right for a one-off
  * query and wrong for a standing service: daily semantic-dedup /
  * contrastive-mining ticks at 100 TB would re-pay the centroid build (a
  * full corpus pass) every tick. This artifact pays it once at build time;
  * a probe touches only `nProbe / nCells` of the stored corpus.
  *
  * Layout under `dir` (all parquet):
  *   - `cells/`      (cell, <idCol>, <vecCol>), PARTITIONED BY cell — the
  *                   inverted file. Partitioning is what makes the stored
  *                   form beat the inline one at scale: a probe whose
  *                   probed-cell set is small pushes `cell IN (…)` into the
  *                   scan and READS only those cells' files (the inline
  *                   form always rescans the whole corpus to re-assign it).
  *   - `centroids/`  (cell, centroid) — nCells rows.
  *   - `meta/`       1-row build record, written LAST: the commit record
  *                   (the ledger-written-last convention of
  *                   `Curation.persistServiceState`) — a crash mid-build
  *                   leaves no readable meta and [[load]] fails loud
  *                   instead of probing half an index. Carries the build
  *                   conventions (id/vec columns, nCells, assign metric,
  *                   seed, dim, built_n) so a probe under mismatched
  *                   conventions is impossible from a loaded handle.
  *
  * Two build paths, differing ONLY in how vectors are assigned to cells:
  *   - [[buildKMeans]]: the production quantizer — the same seeded KMeans
  *     as the inline [[VectorFunctions.ivfTopK]], so a loaded probe is
  *     plan-for-plan the inline operator minus the per-call fit;
  *   - [[build]] with an explicit centroid table: assignment = argmax
  *     cosine (ties → lowest cell), fully deterministic and replayable by
  *     a SQL oracle — the oracle-gating seam (q271), and the right path
  *     when centroids come from an upstream system.
  */
object IvfIndex {

  /** A loaded (or just-built) index: the two stored frames plus the meta
    * scalars. `cells`/`centroids` are plain lazily-planned reads of the
    * parquet — nothing vector-sized lives on the driver.
    */
  final case class Handle(
      dir: String,
      centroids: DataFrame,
      cells: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      dim: Int,
      assignMetric: String,
      builtN: Long,
      seed: Long,
      quantized: Boolean = false)

  /** Assignment metrics carried in meta. */
  val MetricKMeans = "kmeans_euclidean"
  val MetricCosine = "cosine"

  private def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** The stored candidate vector as a scorable column: raw float array, or
    * the int8 codes reconstructed (`code · scale + min`) for a
    * [[buildQuantized]] artifact — per-component error ≤ scale/2, the q59
    * trade carried into the inverted file.
    */
  private def storedVec(h: Handle): Column =
    if (h.quantized) VectorFunctions.dequantize(col(h.vecCol)) else col(h.vecCol)

  /** Best cell per row under cosine (ties → LOWEST cell, the deterministic
    * oracle-replayable convention): broadcast the nCells-row centroid table,
    * bounded-heap top-1 per id — map-side, no shuffle of the vectors beyond
    * the 1-row-per-id partial-agg exchange.
    */
  private def assignCosine(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val scored = df
      .crossJoin(broadcast(centroids))
      .withColumn("_as", cosine(col(vecCol), col("centroid")))
    TopK
      .topKPerKey(scored, idCol, col("_as"), col("cell").cast("long"), lit(0L), 1)
      .select(col(idCol), col("id").cast("int").as("cell"))
      .join(df, Seq(idCol))
  }

  /** Best cell per row under squared Euclidean distance (ties → lowest
    * cell), computed natively from the stored centroids: score =
    * −(v·v − 2·v·c + c·c). This is [[append]]'s assignment for
    * [[buildKMeans]]-built indexes — the model object is gone after a
    * restart, but its centroids ARE the quantizer; a hair's-width tie could
    * in principle land differently than `KMeans.predict`, which moves a
    * boundary vector between two cells it is equidistant from — probe
    * correctness is unaffected (in-cell scoring is exact; cell choice only
    * moves recall at the margin).
    */
  private def assignEuclid(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val v = col(vecCol)
    val c = col("centroid")
    val negDist = VectorFunctions.dot(v, c) * lit(2.0) -
      VectorFunctions.dot(v, v) - VectorFunctions.dot(c, c)
    val scored = df.crossJoin(broadcast(centroids)).withColumn("_as", negDist)
    TopK
      .topKPerKey(scored, idCol, col("_as"), col("cell").cast("long"), lit(0L), 1)
      .select(col(idCol), col("id").cast("int").as("cell"))
      .join(df, Seq(idCol))
  }

  private def assignFor(metric: String)(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    metric match {
      case MetricKMeans => assignEuclid(df, idCol, vecCol, centroids)
      case MetricCosine => assignCosine(df, idCol, vecCol, centroids)
      case other => throw new IllegalArgumentException(
        s"unknown IVF assign metric '$other' (stored meta is from a newer build?)")
    }

  private def writeArtifact(
      dir: String,
      assigned: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      dim: Int,
      metric: String,
      seed: Long,
      quantized: Boolean = false): Handle = {
    val spark = assigned.sparkSession
    assigned
      .select(col("cell"), col(idCol),
        (if (quantized) VectorFunctions.quantizeInt8(col(vecCol)) else col(vecCol))
          .as(vecCol))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    centroids.select(col("cell"), col("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // built_n from the WRITTEN cells (one bounded count over the artifact,
    // not a second pass over the source corpus)
    val builtN = spark.read.parquet(s"$dir/cells").count()
    import spark.implicits._
    Seq((idCol, vecCol, nCells, dim, metric, builtN, seed, quantized))
      .toDF("id_col", "vec_col", "n_cells", "dim", "assign_metric", "built_n",
        "seed", "quantized")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    load(spark, dir)
  }

  /** Build the stored index with the SAME seeded-KMeans coarse quantizer as
    * the inline [[VectorFunctions.ivfTopK]] (same feature prep, seed
    * semantics, and loose 10-iteration convergence — the quantizer only
    * partitions; recall comes from nProbe and correctness from exact
    * in-cell scoring). `probe(load(dir), …)` then returns exactly what the
    * inline operator would for the same (k, nProbe, seed) — spec-pinned.
    */
  def buildKMeans(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      dir: String,
      seed: Long = 42L,
      maxIter: Int = 10): Handle = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusVec = corpus.withColumn("_fv", array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("_fv").fit(corpusVec)
    val assigned = km.transform(corpusVec)
      .withColumnRenamed("prediction", "cell").drop("_fv")
    val dim = km.clusterCenters.headOption.map(_.size).getOrElse(0)
    val centroids = km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
    writeArtifact(dir, assigned, centroids, idCol, vecCol, nCells, dim,
      MetricKMeans, seed)
  }

  /** Build the stored index from an EXPLICIT centroid table
    * (`cell int, centroid array<float>`): assignment = argmax cosine, ties
    * to the lowest cell — fully deterministic, so a value oracle can replay
    * every assignment, probe ranking, and score (q271). Also the path for
    * centroids trained upstream (a sampled KMeans on another system, a
    * model's codebook).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      dir: String): Handle = {
    val cen = centroids.select(col("cell").cast("int").as("cell"), col("centroid"))
    val n = cen.count()
    require(n > 0, "IvfIndex.build: empty centroid table")
    val assigned = assignCosine(corpus, idCol, vecCol, cen)
    val dim = corpus.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    writeArtifact(dir, assigned, cen, idCol, vecCol, n.toInt, dim,
      MetricCosine, seed = 0L)
  }

  /** [[build]] with INT8-QUANTIZED cell storage — the q59 memory trade
    * carried into the inverted file: assignment runs on the RAW vectors
    * (same deterministic argmax-cosine chain as [[build]], so the cell
    * layout is identical), but each stored row holds
    * `VectorFunctions.quantizeInt8(vec)` — per-vector affine int8 codes,
    * ~4× smaller at rest (and the int codes dictionary/bit-pack further in
    * parquet) — the difference between a 100 TB float corpus and a ~25 TB
    * index. [[probe]] scores against the RECONSTRUCTED vectors
    * (`dequantize`, per-component error ≤ scale/2), so ranking is the
    * q59-class approximation; [[append]] quantizes incoming rows under the
    * same scheme. [[rebuild]] refuses quantized handles — refitting a
    * quantizer on reconstructions compounds the loss; rebuild from the raw
    * corpus upstream.
    */
  def buildQuantized(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      dir: String): Handle = {
    val cen = centroids.select(col("cell").cast("int").as("cell"), col("centroid"))
    val n = cen.count()
    require(n > 0, "IvfIndex.buildQuantized: empty centroid table")
    val assigned = assignCosine(corpus, idCol, vecCol, cen)
    val dim = corpus.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    writeArtifact(dir, assigned, cen, idCol, vecCol, n.toInt, dim,
      MetricCosine, seed = 0L, quantized = true)
  }

  /** Load a committed index. Fails loud when `meta` is unreadable — i.e. on
    * a crash-truncated build (meta is written last, so readable meta ⇒ the
    * frames it describes were fully written).
    */
  def load(spark: SparkSession, dir: String): Handle = {
    val led = scala.util.Try(spark.read.parquet(s"$dir/meta").head()).getOrElse(
      throw new IllegalArgumentException(
        s"IvfIndex.load: no committed index at $dir — meta is written last, " +
          "so an unreadable meta means the build never completed"))
    Handle(
      dir = dir,
      centroids = spark.read.parquet(s"$dir/centroids"),
      cells = spark.read.parquet(s"$dir/cells"),
      idCol = led.getAs[String]("id_col"),
      vecCol = led.getAs[String]("vec_col"),
      nCells = led.getAs[Int]("n_cells"),
      dim = led.getAs[Int]("dim"),
      assignMetric = led.getAs[String]("assign_metric"),
      builtN = led.getAs[Long]("built_n"),
      seed = led.getAs[Long]("seed"),
      quantized = led.getAs[Boolean]("quantized"))
  }

  /** Approximate top-k over the STORED index — the inline
    * [[VectorFunctions.ivfTopK]] probe half, reading the inverted file
    * instead of re-assigning the corpus: rank the broadcast centroid table
    * per query (bounded partial top-k, never a window), equi-join the
    * probed cells, score exactly in-cell, bounded-heap top-k.
    *
    * When the probed-cell set is small (≤ `pruneMaxCells` distinct cells —
    * the common service shape: a bounded query batch × nProbe), the set is
    * collected (a bounded driver read of ≤ pruneMaxCells+1 ints, the q264
    * 1-row-bind class) and pushed as a `cell IN (…)` partition filter, so
    * the scan READS ONLY the probed cells' parquet — the stored form's
    * scale win over the inline operator. A huge query batch skips the
    * collect and keeps the plain equi-join.
    *
    * Returns (qId, idCol, sim, rank), ties by ascending corpus id.
    *
    * `maxSimExclusive`: keep only candidates with sim strictly BELOW the
    * bound before ranking — the hard-negative shape (the most similar
    * corpus vectors that are NOT near-duplicates,
    * [[graft.ml.Contrastive.mineTripletsIndexed]]); the filter runs before
    * the bounded heap, so the top-k is the top-k OF the sub-threshold set,
    * not a post-filtered overall top-k that could come back empty.
    */
  def probe(
      h: Handle,
      queries: DataFrame,
      qId: String,
      qVec: String,
      k: Int,
      nProbe: Int,
      pruneMaxCells: Int = 256,
      maxSimExclusive: Option[Double] = None): DataFrame = {
    require(qId != h.idCol,
      s"probe: query id column '$qId' collides with the index id column — rename it")
    val qCellScores = queries
      .crossJoin(broadcast(h.centroids))
      .withColumn("_csim", cosine(col(qVec), col("centroid")))
    val qCells = TopK
      .topKPerKey(qCellScores, qId, col("_csim"), col("cell").cast("long"), lit(0L), nProbe)
      .select(col(qId), col("id").cast("int").as("cell"))
      .join(queries, Seq(qId))
    val probed = qCells.select(col("cell")).distinct()
      .limit(pruneMaxCells + 1).collect().map(_.getInt(0))
    val cellRows =
      if (probed.length <= pruneMaxCells)
        h.cells.where(col("cell").isin(probed.map(Integer.valueOf).toSeq: _*))
      else h.cells
    val scored = cellRows
      .join(broadcast(qCells), Seq("cell"))
      .filter(col(qId) =!= col(h.idCol))
      .withColumn("_sim", cosine(col(qVec), storedVec(h)))
    val bounded = maxSimExclusive
      .map(t => scored.filter(col("_sim") < lit(t)))
      .getOrElse(scored)
    VectorFunctions.rankTopK(bounded, qId, h.idCol, col("_sim"), k)
  }

  /** APPEND new vectors to the stored index: assign each to its nearest
    * centroid under the index's own build metric, append the rows to the
    * cell-partitioned parquet, and return a refreshed handle. Cost is
    * batch-proportional (one assignment pass over the NEW rows + their
    * write) — the tick-verb growth class, same as the postings/bloom
    * appends; the quantizer itself never moves, which is what
    * [[driftReport]] watches.
    */
  def append(h: Handle, rows: DataFrame): Handle = {
    assignFor(h.assignMetric)(
        rows.select(col(h.idCol), col(h.vecCol)), h.idCol, h.vecCol, h.centroids)
      .select(col("cell"), col(h.idCol),
        (if (h.quantized) VectorFunctions.quantizeInt8(col(h.vecCol))
         else col(h.vecCol)).as(h.vecCol))
      .write.mode("append").partitionBy("cell").parquet(s"${h.dir}/cells")
    h.copy(cells = h.cells.sparkSession.read.parquet(s"${h.dir}/cells"))
  }

  /** Health report for a standing index — the X41/X46 monitor analog for
    * the embedding tier, 1 row:
    *
    *   - `n_vectors` / `built_n` / `growth_ratio`: how much of the index
    *     was appended AFTER the quantizer was trained (appended mass never
    *     moved a centroid — past `growthRatio` the quantizer no longer
    *     reflects the corpus it partitions);
    *   - `max_cell_frac`, `imbalance` (= max_cell_frac · nCells, 1.0 =
    *     perfectly balanced), `empty_cells`: cell balance — probes pay the
    *     LARGEST probed cell, so a runaway cell is a latency cliff;
    *   - `mean_assign_sim`: mean cosine between each stored vector and its
    *     cell's centroid (the quantization-quality trend a drifting feed
    *     degrades — comparable across ticks under either build metric,
    *     since probing ranks cells by cosine);
    *   - `recommend_rebuild`: growth_ratio ≥ `growthRatio` OR imbalance ≥
    *     `imbalanceRatio` — the executable answer is [[rebuild]].
    */
  def driftReport(
      h: Handle,
      imbalanceRatio: Double = 4.0,
      growthRatio: Double = 2.0): DataFrame = {
    val perCell = h.cells.groupBy(col("cell")).agg(count(lit(1)).as("_n"))
    val balance = perCell.agg(
      sum(col("_n")).as("n_vectors"),
      max(col("_n")).as("_maxn"),
      count(lit(1)).as("_cells_used"))
    val quality = h.cells
      .join(broadcast(h.centroids), Seq("cell"))
      .agg(avg(cosine(storedVec(h), col("centroid"))).as("mean_assign_sim"))
    balance.crossJoin(quality).select(
      col("n_vectors"),
      lit(h.builtN).as("built_n"),
      (col("n_vectors").cast("double") / lit(math.max(h.builtN, 1L)).cast("double"))
        .as("growth_ratio"),
      (col("_maxn").cast("double") / col("n_vectors").cast("double")).as("max_cell_frac"),
      (col("_maxn").cast("double") / col("n_vectors").cast("double") * lit(h.nCells))
        .as("imbalance"),
      (lit(h.nCells) - col("_cells_used")).cast("int").as("empty_cells"),
      col("mean_assign_sim"),
      ((col("n_vectors").cast("double") / lit(math.max(h.builtN, 1L)).cast("double"))
        >= lit(growthRatio) ||
        (col("_maxn").cast("double") / col("n_vectors").cast("double") * lit(h.nCells))
          >= lit(imbalanceRatio)).as("recommend_rebuild"))
  }

  /** Rebuild the quantizer over everything the index now holds (build rows
    * + every appended batch) and write a fresh artifact to `newDir` —
    * [[driftReport]]'s `recommend_rebuild` made executable. `newDir` must
    * differ from the live dir: the rebuild READS `h.cells` while writing,
    * and the caller swaps dirs on success (the generation-swap pattern —
    * wrap dirs in `gen=<k>` à la `Curation.persistServiceState` for a
    * crash-safe standing deployment). KMeans-metric indexes refit with the
    * stored seed; cosine-metric indexes (upstream codebook) have nothing to
    * refit — rebalancing them means shipping a new centroid table through
    * [[build]], so rebuild refuses rather than guessing.
    */
  def rebuild(h: Handle, newDir: String): Handle = {
    require(newDir != h.dir,
      "IvfIndex.rebuild: target dir must differ from the live index dir " +
        "(the rebuild reads the live cells while writing — swap dirs on success)")
    require(h.assignMetric == MetricKMeans,
      s"IvfIndex.rebuild: '${h.assignMetric}' indexes carry an upstream centroid " +
        "table — re-train it upstream and ship it through IvfIndex.build")
    require(!h.quantized,
      "IvfIndex.rebuild: a quantized index stores lossy codes — refitting the " +
        "quantizer on reconstructions compounds the error silently; rebuild " +
        "from the raw vectors upstream (buildQuantized over the source corpus)")
    buildKMeans(h.cells.select(col(h.idCol), col(h.vecCol)),
      h.idCol, h.vecCol, h.nCells, newDir, h.seed)
  }
}
