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

  /** Best cell per row as a MAP-SIDE FOLD — zero exchanges on the build/
    * append path (the earlier shape scored a crossJoin through a bounded
    * heap and joined the winner back to the corpus BY ID: a second full
    * shuffle of the vectors for a value computable per row). The centroid
    * table collapses to ONE broadcast row holding the cell-sorted
    * `array<struct<cell,centroid>>`; each corpus row folds over it keeping
    * the best (score, cell). Strict `>` + ascending cell order = ties to
    * the LOWEST cell, the same deterministic oracle-replayable convention
    * the heap form had (rank by score desc, ties by ascending cell id).
    * Rows whose score is null against every centroid (null/zero vectors
    * under cosine) fold to cell −1 and are dropped — the heap form dropped
    * them too (no heap entry survives a null score).
    */
  private def assignBest(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame)(
      score: (Column, Column) => Column): DataFrame = {
    val cens = centroids.agg(
      sort_array(collect_list(struct(col("cell").cast("int").as("cell"),
        col("centroid").as("centroid")))).as("_cens"))
    val best = aggregate(
      col("_cens"),
      struct(lit(Double.NegativeInfinity).as("s"), lit(-1).as("c")),
      (acc, cen) => {
        val sc = score(col(vecCol), cen.getField("centroid"))
        when(sc > acc.getField("s"),
          struct(sc.as("s"), cen.getField("cell").as("c"))).otherwise(acc)
      })
    df.crossJoin(broadcast(cens)) // 1-row centroid-array bind
      .withColumn("cell", best.getField("c"))
      .filter(col("cell") >= 0)
      .drop("_cens")
  }

  /** [[assignBest]] under cosine (ties → lowest cell). */
  private def assignCosine(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    assignBest(df, idCol, vecCol, centroids)(cosine(_, _))

  /** [[assignBest]] under squared Euclidean distance (ties → lowest
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
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame =
    assignBest(df, idCol, vecCol, centroids)((v, c) =>
      VectorFunctions.dot(v, c) * lit(2.0) -
        VectorFunctions.dot(v, v) - VectorFunctions.dot(c, c))

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
      // the ONE exchange on the build path (assignment itself is a map-side
      // fold): cluster rows by cell before the partitioned write, so each
      // cell's directory gets ~one file instead of one PER INPUT PARTITION —
      // numPartitions × nCells tiny files is the classic small-files failure
      // at cluster scale, and the probe's partition-pruned scan pays it on
      // every read. AQE coalesces the post-shuffle partitions where cells
      // are small and splits skewed ones.
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/cells")
    centroids.select(col("cell"), col("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    // built_n from the WRITTEN cells (one bounded count over the artifact,
    // not a second pass over the source corpus)
    val builtN = spark.read.parquet(s"$dir/cells").count()
    writeMeta(spark, dir, idCol, vecCol, nCells, dim, metric, builtN, seed, quantized)
    load(spark, dir)
  }

  /** (Re)write the 1-row meta commit record — build's last step, and the
    * accounting refresh [[delete]] runs after a partition rewrite.
    */
  private def writeMeta(
      spark: SparkSession,
      dir: String,
      idCol: String,
      vecCol: String,
      nCells: Int,
      dim: Int,
      metric: String,
      builtN: Long,
      seed: Long,
      quantized: Boolean): Unit = {
    import spark.implicits._
    Seq((idCol, vecCol, nCells, dim, metric, builtN, seed, quantized))
      .toDF("id_col", "vec_col", "n_cells", "dim", "assign_metric", "built_n",
        "seed", "quantized")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
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
      // schema-tolerant: artifacts persisted before the quantized tier
      // existed carry no such column — they are raw-vector indexes, so the
      // default is false, not a field-not-found load failure (the whole
      // point of the stored format is surviving restarts AND upgrades)
      quantized = led.schema.fieldNames.contains("quantized") &&
        led.getAs[Boolean]("quantized"))
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
    val qCellsRaw = TopK
      .topKPerKey(qCellScores, qId, col("_csim"), col("cell").cast("long"), lit(0L), nProbe)
      .select(col(qId), col("id").cast("int").as("cell"))
      .join(queries, Seq(qId))
    // path decision only: is the probed-cell set small enough to prune?
    val prunable = qCellsRaw.select(col("cell")).distinct()
      .limit(pruneMaxCells + 1).count() <= pruneMaxCells
    // on the pruned path, PIN the (bounded: queries × nProbe rows) cell
    // assignment before deriving the IN-set, so the pushed partition filter
    // and the recomputed join input can never disagree — a nondeterministic
    // `queries` frame (a sample, an un-ordered limit) would otherwise be
    // re-evaluated differently by the driver collect and the final plan,
    // silently dropping candidates
    val (qCells, cellRows) =
      if (prunable) {
        val pinned = qCellsRaw.localCheckpoint()
        val probed = pinned.select(col("cell")).distinct().collect().map(_.getInt(0))
        (pinned, h.cells.where(col("cell").isin(probed.map(Integer.valueOf).toSeq: _*)))
      } else (qCellsRaw, h.cells)
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
      .repartition(col("cell")) // batch-sized; buys ~one file per touched cell
      .write.mode("append").partitionBy("cell").parquet(s"${h.dir}/cells")
    h.copy(cells = h.cells.sparkSession.read.parquet(s"${h.dir}/cells"))
  }

  /** TAKEDOWN: remove `removedIds` from the stored index — the lifecycle
    * verb every other stored-index tier carries (`Curation.takedown`,
    * `Decontaminate.benchIndexDelete`), now on the embedding tier: a
    * takedown request against a standing ANN/contrastive service is a
    * bounded partition rewrite, not a full manual rebuild.
    *
    * Shape: find the AFFECTED cells (a join against the bounded takedown
    * batch, collected as ≤ nCells ints — the q264 bounded-bind class), then
    * rewrite ONLY those cells' partitions with their survivors (dynamic
    * partition overwrite — untouched cells' files are never read or
    * written) and drop the directory of any cell the delete emptied
    * (dynamic overwrite writes nothing for a cell with zero survivors, so
    * its stale files must go explicitly). Survivor rows pass through
    * as stored — quantized codes are per-vector, so surviving codes are
    * exactly what a fresh [[buildQuantized]] over the survivors would
    * store.
    *
    * Accounting: meta's `built_n` re-baselines to the surviving row count —
    * the same clock a fresh build over the survivors would start with, so
    * `delete ∘ append ≡ build(survivors)` holds for the cells, the meta,
    * and every [[driftReport]] field (IvfIndexSpec pins it). A takedown
    * that matches nothing returns the handle unchanged — a no-op request
    * must not silently reset the growth clock.
    *
    * `removedIds` is the takedown batch (bounded by the request, the
    * broadcast side); the join against the cells prunes nothing on read —
    * membership is only known by id — but only affected partitions are
    * REWRITTEN, which is where a 100 TB index pays.
    */
  def delete(h: Handle, removedIds: DataFrame): Handle = {
    val spark = h.cells.sparkSession
    val rm = removedIds.select(col(h.idCol)).distinct()
    val affected = h.cells.join(broadcast(rm), Seq(h.idCol))
      .select(col("cell")).distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return h
    val aff = affected.map(Integer.valueOf).toSeq
    // survivors of the affected cells only, pinned: the write below
    // overwrites partitions the plan would otherwise still be reading
    val survivors = h.cells.where(col("cell").isin(aff: _*))
      .join(broadcast(rm), Seq(h.idCol), "left_anti")
      .select(col("cell"), col(h.idCol), col(h.vecCol))
      .localCheckpoint()
    survivors
      .repartition(col("cell")) // keep the ~one-file-per-cell layout
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"${h.dir}/cells")
    val kept = survivors.select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    val conf = spark.sparkContext.hadoopConfiguration
    affected.filterNot(kept).foreach { c =>
      val p = new org.apache.hadoop.fs.Path(s"${h.dir}/cells/cell=$c")
      p.getFileSystem(conf).delete(p, true)
    }
    val cells = spark.read.parquet(s"${h.dir}/cells")
    val n = cells.count()
    writeMeta(spark, h.dir, h.idCol, h.vecCol, h.nCells, h.dim, h.assignMetric,
      n, h.seed, h.quantized)
    h.copy(cells = cells, builtN = n)
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

  /** The executable rebuild path for a QUANTIZED index — what to run when
    * [[driftReport]] says `recommend_rebuild` on a [[buildQuantized]]
    * artifact, which [[rebuild]] rightly refuses (refitting a quantizer on
    * int8 reconstructions compounds the loss silently). The caller supplies
    * the RAW corpus (the source of truth a quantized index is a lossy view
    * of — build rows plus every appended batch); the verb re-runs the
    * deterministic assignment + re-quantization against the handle's own
    * centroid table into `newDir`, and the caller swaps dirs on success
    * (the same generation-swap pattern as [[rebuild]]). Rebalancing under
    * NEW centroids is the same call with a fresh centroid table shipped
    * through [[buildQuantized]] directly.
    */
  def rebuildQuantized(h: Handle, rawCorpus: DataFrame, newDir: String): Handle = {
    require(newDir != h.dir,
      "IvfIndex.rebuildQuantized: target dir must differ from the live index dir " +
        "(swap dirs on success)")
    require(h.quantized,
      "IvfIndex.rebuildQuantized: handle is not quantized — use rebuild (kmeans " +
        "metric) or build with a new centroid table (explicit-centroid metric)")
    buildQuantized(rawCorpus.select(col(h.idCol), col(h.vecCol)),
      h.idCol, h.vecCol, h.centroids, newDir)
  }
}
