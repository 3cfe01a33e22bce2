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
  */
object SimilarityJoin {

  /** All cross-frame pairs with exact Jaccard ≥ `threshold` between
    * `left` and `right` — frames of (idCol, setCol) where setCol is an
    * array<long> of DISTINCT SORTED element hashes (the q46 shingle-hash
    * contract; `sort_array(array_distinct(...))`). Returns
    * (id_l, id_r, jac). Self-pairs are the caller's concern — pass
    * disjoint frames (the incremental-ingest shape) or filter ids after.
    */
  def jaccardJoin(
      left: DataFrame,
      leftId: String,
      right: DataFrame,
      rightId: String,
      setCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    require(leftId != rightId,
      s"left and right id columns must differ in the output (rename one): $leftId")

    // pin both inputs: each side is read 3× (frequency pass, prefix pass,
    // verify join-back) and the caller's set column is typically an
    // expensive shingle+hash+sort projection — without the checkpoint the
    // whole prep would recompute per read
    val l = left.select(col(leftId).cast("long").as("_lid"), col(setCol).as("_ls"))
      .localCheckpoint(false)
    val r = right.select(col(rightId).cast("long").as("_rid"), col(setCol).as("_rs"))
      .localCheckpoint(false)

    // global rarest-first order: document frequency over BOTH frames
    val freq = l.select(explode(col("_ls")).as("h"))
      .unionAll(r.select(explode(col("_rs")).as("h")))
      .groupBy(col("h")).agg(count(lit(1)).as("_df"))

    // per-doc prefix: sort elements by (df, h), keep the first
    // s − ⌈t·s⌉ + 1. The −1e-9 nudge before ceil errs the prefix LONGER
    // under FP rounding of t·s — extra candidates, never a missed pair.
    def prefixes(df: DataFrame, id: String, set: String): DataFrame = {
      val s = size(col("_byRank"))
      val plen = (s - ceil(s.cast("double") * threshold - lit(1e-9)) + 1).cast("int")
      df.select(col(id), explode(col(set)).as("h"))
        .join(freq, Seq("h"))
        .groupBy(col(id))
        .agg(array_sort(collect_list(struct(col("_df"), col("h")))).as("_byRank"))
        .select(col(id), explode(
          transform(slice(col("_byRank"), lit(1), plen), e => e.getField("h"))).as("h"))
    }

    val candidates = prefixes(l, "_lid", "_ls")
      .join(prefixes(r, "_rid", "_rs"), Seq("h"))
      .select(col("_lid"), col("_rid"))
      .distinct()

    candidates
      .join(l, Seq("_lid"))
      .join(r, Seq("_rid"))
      // exact length prune (sets are distinct): J ≤ min/max sizes — the
      // −0.5 slack keeps FP rounding of t·max from dropping boundary pairs
      .filter(least(size(col("_ls")), size(col("_rs")))
        >= lit(threshold) * greatest(size(col("_ls")), size(col("_rs"))) - lit(0.5))
      .withColumn("_j",
        VectorExpressions.jaccardSortedMin(col("_ls"), col("_rs"), threshold))
      .filter(col("_j") >= threshold)
      .select(col("_lid").as(leftId), col("_rid").as(rightId), col("_j").as("jac"))
  }
}
