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
    * Large-star/small-star contraction (the MapReduce CC algorithm of
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): each round rewires every node's strictly-larger neighbors to
    * its neighborhood minimum (large-star), then its smaller-or-equal
    * neighborhood plus itself to that hood's minimum (small-star). Paths
    * HALVE in length each round instead of shrinking by one hop, so a
    * chain of n nodes converges in O(log n) rounds where min-label
    * propagation (the round-3 implementation) needed O(n) — diameter no
    * longer bounds the round count, only log of it. At the fixpoint every
    * component is a star rooted at its min id; round-3's O(diameter)
    * propagation survives only in DBSCAN's bounded-radius growth
    * (ml/Dbscan.scala) where depth is a declared parameter.
    *
    * Each round is edge-linear: two groupBy-min + broadcast-free equi-joins
    * on the edge frame plus a distinct; localCheckpoint per round truncates
    * lineage (persist alone leaves the logical plan growing until planning
    * dominates). Convergence is proven by an unchanged (count, hash-sum)
    * edge-set signature across a full round.
    *
    * Returns (`idOut`, "component") for every id appearing in `pairs`.
    */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      idOut: String = "id",
      maxIters: Int = 50): DataFrame = {
    val raw = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
    // the node set is fixed up front — contraction rewires edges, so ids
    // with only self-pairs (or whose edges contract away) must still label
    val allIds = raw
      .select(explode(array(col("u"), col("v"))).as("id"))
      .distinct()
      .localCheckpoint()
    var edges = raw
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    // order-independent edge-set signature; sum of per-edge hashes over a
    // distinct set collides only on a 64-bit accident
    def signature(df: DataFrame): (Long, Long) = {
      val r = df
        .agg(count(lit(1)), coalesce(sum(xxhash64(col("u"), col("v"))), lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1))
    }

    // one large-star + small-star round over canonical (u > v) edges
    def round(es: DataFrame): DataFrame = {
      val sym = es.union(es.select(col("v").as("u"), col("u").as("v")))
      val minsL = sym
        .groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym
        .join(minsL, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // after large-star every edge points large -> small, so the full
      // smaller-neighborhood of u is exactly its out-edges
      val minsS = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      large
        .join(minsS, Seq("u"))
        .select(
          explode(
            array(
              struct(col("v").as("a"), col("m").as("b")),
              struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint()
    }

    var sig = signature(edges)
    var stable = edges.isEmpty
    var iter = 0
    while (!stable && iter < maxIters) {
      val next = round(edges)
      val nextSig = signature(next)
      stable = nextSig == sig
      sig = nextSig
      edges = next
      iter += 1
    }
    // an unconverged contraction still has nodes pointing at non-roots, and
    // a dedup pass over it would silently split real components — refuse to
    // return one. The loop cannot distinguish "reached the fixpoint ON the
    // last permitted round" from "still contracting" (convergence is only
    // proven by an unchanged round), so the boundary case runs one residual
    // measurement round instead of throwing on a correct labeling.
    if (!stable) {
      val residualSig = signature(round(edges))
      require(residualSig == sig,
        s"connectedComponents did not converge in $maxIters rounds; raise maxIters")
    }
    // fixpoint edges are (node -> component root) stars; roots label selves
    val rooted = edges
      .groupBy(col("u").as("id"))
      .agg(min(col("v")).as("_c"))
    allIds
      .join(rooted, Seq("id"), "left")
      .select(col("id").as(idOut), coalesce(col("_c"), col("id")).as("component"))
  }
}
