package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.4 A1 + north-star dedup suite).
  *
  * Order-sensitivity note (SURVEY.md §7.5-1): pandas `drop_duplicates(keep=
  * 'last')` (蔬菜价格相关性分析.py:25-26) relies on implicit row order. Spark has no
  * implicit order, so keep-last/keep-first take an explicit ordering — the
  * caller names the tiebreak columns. This is the 100-TB-safe form: the
  * window shuffles once on the key and each partition resolves its own
  * groups; no global sort.
  */
object Dedup {

  /** A1 — keep the LAST row per key group under `order` (ascending). Plans as
    * one shuffle on `keys` + per-group sort; Catalyst/Tungsten handle spill.
    */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.map(_.desc).toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Keep the FIRST row per key group under `order` (ascending). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact content dedup: group identical values of `contentCols`, keep the
    * row with the smallest `idCol`, and report the duplicate count. At 100 TB
    * the groupBy key should be a digest, not the raw content — see
    * `exactDedupByHash`.
    */
  def exactDedup(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentCols.map(col).toIndexedSeq: _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Scale path for exact dedup: shuffle on a 256-bit content digest instead
    * of the raw payload (shuffles ~32 bytes/row instead of the document).
    * Semantically identical to `exactDedup` absent sha2 collisions.
    */
  def exactDedupByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(sha2(col(contentCol), 256).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** SimHash near-duplicate pairs: every id pair whose 64-bit SimHash values
    * (e.g. `TextFunctions.simhash64` over shingles) differ in at most
    * `maxHamming` bits.
    *
    * Candidates come from banding: the hash is cut into `nBands` equal bit
    * slices and docs sharing ANY band value meet in an equi-join on
    * (band, bits) — the standard sub-quadratic SimHash blocking. By
    * pigeonhole this is EXACT (recall 1.0), not approximate, whenever
    * `maxHamming < nBands`: d differing bits can dirty at most d bands, so
    * at least one band matches. The join carries (id, hash) only — 16
    * bytes/row — and the pair dedup shuffles ids; verification is a single
    * xor+popcount per candidate.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      simhashCol: String,
      maxHamming: Int = 3,
      nBands: Int = 8): DataFrame = {
    require(64 % nBands == 0, s"nBands must divide 64, got $nBands")
    require(maxHamming < nBands,
      s"exactness needs maxHamming < nBands ($maxHamming >= $nBands)")
    val w = 64 / nBands
    val mask = if (w == 64) lit(-1L) else lit((1L << w) - 1L)
    def sigs(id: String, h: String) =
      df.select(
        col(idCol).as(id),
        col(simhashCol).as(h),
        explode(array((0 until nBands).map(b =>
          struct(
            lit(b).as("band"),
            shiftrightunsigned(col(simhashCol), b * w).bitwiseAND(mask).as("bits"))): _*)).as("bb"))
        .select(col(id), col(h), col("bb.band").as("band"), col("bb.bits").as("bits"))
    sigs("id1", "h1")
      .join(sigs("id2", "h2"), Seq("band", "bits"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("h1"), col("h2"))
      .dropDuplicates("id1", "id2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Connected components over an undirected pair list — the clustering step
    * that turns near-dup PAIRS (MinHash/SimHash/Jaccard/cosine candidates)
    * into dedup GROUPS, so a canonical representative (the min id, which is
    * what every component label converges to) can be kept per group.
    *
    * Iterative min-label propagation to fixpoint: each round every node
    * takes the min of its own and its neighbors' labels — one equi-join +
    * partial-agg min per round, converging in O(component diameter) rounds.
    * Near-dup components are shallow (dup clusters are cliques-ish), so
    * rounds stay single-digit at any corpus size; pathological chain graphs
    * would want the large-star/small-star variant instead. localCheckpoint
    * per round truncates lineage — persist alone leaves the logical plan
    * growing per iteration until planning dominates (same pattern as
    * DBSCAN's propagation, ml/Dbscan.scala).
    *
    * Returns (`idCol`, "component") for every id appearing in `pairs`.
    */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      idOut: String = "id",
      maxIters: Int = 50): DataFrame = {
    val sym = pairs
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(pairs.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // every node in `sym` has >= 1 neighbor, so the inner join keeps all.
      // The pre-update label rides along as _old so convergence is read off
      // the already-checkpointed result — a second labels-vs-next join per
      // round would double the per-iteration shuffle work.
      val propagated = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("newc"))
      val next = labels
        .join(propagated, Seq("id"))
        .select(
          col("id"),
          col("component").as("_old"),
          least(col("component"), col("newc")).as("component"))
        .localCheckpoint()
      changed = next.filter(col("component") =!= col("_old")).count()
      labels = next.select(col("id"), col("component"))
      iter += 1
    }
    // a partially-propagated labeling splits real components and would make
    // a dedup pass silently keep duplicates — refuse to return one. The
    // loop's own `changed` cannot distinguish "converged ON the last
    // permitted round" from "still propagating" (convergence is only proven
    // by a zero-change round), so the boundary case runs one residual
    // measurement round instead of throwing on a correct labeling.
    if (changed > 0) {
      val residual = sym
        .join(labels.select(col("id").as("dst"), col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("newc"))
        .join(labels, Seq("id"))
        .filter(col("newc") < col("component"))
        .count()
      require(residual == 0L,
        s"connectedComponents did not converge in $maxIters rounds (component " +
          s"diameter exceeds maxIters); raise maxIters or use a star-contraction variant")
    }
    sym.unpersist()
    labels.withColumnRenamed("id", idOut)
  }
}
