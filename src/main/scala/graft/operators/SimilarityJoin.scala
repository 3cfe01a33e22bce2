package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions

/** Prefix-filtered EXACT set-similarity join — the AllPairs/PPJoin family
  * (Bayardo, Ma & Srikant, WWW 2007; Xiao et al., WWW 2008): every pair
  * with Jaccard ≥ t is found with NO all-pairs enumeration and NO recall
  * loss (contrast MinHash banding, which trades recall for speed).
  *
  * The filter: order the element universe rarest-first (global document
  * frequency, ties on the element value). A set of size s keeps only its
  * first p(s) = s − ⌈t·s⌉ + 1 elements as its PREFIX. Two sets with
  * J ≥ t must share an element lying in BOTH prefixes — their smallest
  * common element e cannot sit outside either prefix, because a set's
  * suffix holds only ⌈t·s⌉ − 1 elements while J ≥ t forces an
  * intersection of at least ⌈t·s⌉ on each side. So the equi-join of
  * prefix postings is a LOSSLESS candidate generator, and hub elements
  * (stopword shingles) sort last — they almost never enter a prefix, which
  * is what keeps the candidate count near-linear on text corpora.
  *
  * Scale shape: one frequency aggregation over element instances, one
  * per-doc sort (narrow, after a broadcast-or-shuffle freq join), one
  * equi-join of prefix postings (AQE handles residual skew), then the
  * early-exit exact verify on candidates only. No window, no driver state.
  *
  * Fault tolerance: both entry points pin their multiply-read intermediates
  * via the `pin` parameter — [[Pin.LocalCheckpoint]] by default (fastest,
  * not executor-loss-safe); pass [[Pin.Persist]] on elastic clusters.
  */
object SimilarityJoin {

  /** Per-row prefix postings: for each key row of `df` (columns `keyCols`
    * plus the element array `_set`), emit the first s − ⌈t·s⌉ + 1 elements
    * in global rarest-first `(df, h)` order as (keyCols…, h) rows. The
    * −1e-9 nudge before ceil errs the prefix LONGER under FP rounding of
    * t·s — extra candidates, never a missed pair.
    */
  private def prefixPostings(
      df: DataFrame,
      keyCols: Seq[String],
      freq: DataFrame,
      threshold: Double): DataFrame = {
    val s = size(col("_byRank"))
    val plen = (s - ceil(s.cast("double") * threshold - lit(1e-9)) + 1).cast("int")
    df.select(keyCols.map(col) :+ explode(col("_set")).as("h"): _*)
      .join(freq, Seq("h"))
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("_df"), col("h")))).as("_byRank"))
      .select(keyCols.map(col) :+ explode(
        transform(slice(col("_byRank"), lit(1), plen), e => e.getField("h"))).as("h"): _*)
  }

  /** Exact verify on candidate id pairs: join the set arrays back, apply the
    * exact size prune (J ≤ min/max of the DISTINCT-set sizes; −0.5 slack
    * keeps FP rounding of t·max from dropping boundary pairs), then the
    * early-exit sorted-merge Jaccard kernel.
    */
  private def verify(
      candidates: DataFrame,
      aSets: DataFrame, // (_aid, _as)
      bSets: DataFrame, // (_bid, _bs)
      threshold: Double): DataFrame =
    candidates
      .join(aSets, Seq("_aid"))
      .join(bSets, Seq("_bid"))
      .filter(least(size(col("_as")), size(col("_bs")))
        >= lit(threshold) * greatest(size(col("_as")), size(col("_bs"))) - lit(0.5))
      .withColumn("_j",
        VectorExpressions.jaccardSortedMin(col("_as"), col("_bs"), threshold))
      .filter(col("_j") >= threshold)

  /** All cross-frame pairs with exact Jaccard ≥ `threshold` between
    * `left` and `right` — frames of (idCol, setCol) where setCol is an
    * array<long> of DISTINCT SORTED element hashes (the q46 shingle-hash
    * contract; `sort_array(array_distinct(...))`). Returns
    * (id_l, id_r, jac). Self-pairs are the caller's concern — pass
    * disjoint frames (the incremental-ingest shape) or use
    * [[jaccardSelfJoin]] for the within-corpus dedup shape.
    */
  def jaccardJoin(
      left: DataFrame,
      leftId: String,
      right: DataFrame,
      rightId: String,
      setCol: String,
      threshold: Double,
      pin: Pin = Pin.LocalCheckpoint): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(leftId != rightId,
      s"left and right id columns must differ in the output (rename one): $leftId")

    // pin both inputs: each side is read 3× (frequency pass, prefix pass,
    // verify join-back) and the caller's set column is typically an
    // expensive shingle+hash+sort projection — without the pin the whole
    // prep would recompute per read
    val l = pin(left.select(col(leftId).cast("long").as("_aid"), col(setCol).as("_as")))
    val r = pin(right.select(col(rightId).cast("long").as("_bid"), col(setCol).as("_bs")))

    // global rarest-first order: document frequency over BOTH frames.
    // Pinned too — it feeds both prefixPostings calls, and recomputing it
    // would re-read both (already pinned) sides and re-aggregate.
    val freq = pin(l.select(explode(col("_as")).as("h"))
      .unionAll(r.select(explode(col("_bs")).as("h")))
      .groupBy(col("h")).agg(count(lit(1)).as("_df")))

    val candidates = prefixPostings(
        l.withColumnRenamed("_as", "_set"), Seq("_aid"), freq, threshold)
      .join(prefixPostings(
        r.withColumnRenamed("_bs", "_set"), Seq("_bid"), freq, threshold), Seq("h"))
      .select(col("_aid"), col("_bid"))
      .distinct()

    verify(candidates, l, r, threshold)
      .select(col("_aid").as(leftId), col("_bid").as(rightId), col("_j").as("jac"))
  }

  /** All WITHIN-corpus pairs with exact Jaccard ≥ `threshold` — the dedup
    * self-join shape (the single most common near-dup call). Returns
    * (id_a, id_b, jac) with id_a < id_b, each qualifying unordered pair
    * exactly once. Same lossless prefix filter as [[jaccardJoin]] (the
    * proof in the header applies verbatim to the self case); the id
    * ordering on the candidate join halves the candidate space and drops
    * self-pairs before any verification work.
    *
    * `blockCols` optionally restricts pairs to rows agreeing on every
    * block column (e.g. same language) — the block keys join the posting
    * equi-join key, so this never enumerates cross-block candidates. Plain
    * equi-join semantics: rows with a NULL block value pair with nothing.
    * `idCol` must be castable to long, unique, and non-null.
    *
    * Unlike [[Pairs.allPairs]] (quadratic per block — the bounded-block
    * exact regime), candidate count here scales with shared-rare-prefix
    * co-occurrence, not block size² — this is the 100-TB path for exact
    * within-corpus dedup.
    */
  def jaccardSelfJoin(
      df: DataFrame,
      idCol: String,
      setCol: String,
      threshold: Double,
      blockCols: Seq[String] = Nil,
      pin: Pin = Pin.LocalCheckpoint): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(!blockCols.contains(idCol),
      s"idCol $idCol must not appear in blockCols")

    // base is read 3× (frequency pass, prefix pass, verify join-back ×2)
    val base = pin(df.select(
      (col(idCol).cast("long").as("_id") +: blockCols.map(col)) :+ col(setCol).as("_set"): _*))

    // freq feeds exactly one prefixPostings call here — no pin needed
    val freq = base.select(explode(col("_set")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("_df"))

    // the postings table is BOTH sides of the candidate join — pin it so
    // the freq-join + per-doc sort run once, not twice
    val post = pin(prefixPostings(base, "_id" +: blockCols, freq, threshold))

    val candidates = post.toDF(("_aid" +: blockCols) :+ "h": _*)
      .join(post.toDF(("_bid" +: blockCols) :+ "h": _*), "h" +: blockCols)
      .filter(col("_aid") < col("_bid"))
      .select(col("_aid"), col("_bid"))
      .distinct()

    verify(
        candidates,
        base.select(col("_id").as("_aid"), col("_set").as("_as")),
        base.select(col("_id").as("_bid"), col("_set").as("_bs")),
        threshold)
      .select(col("_aid").as("id_a"), col("_bid").as("id_b"), col("_j").as("jac"))
  }
}
