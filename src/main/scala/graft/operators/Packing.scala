package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — assembling variable-length documents into fixed-
  * capacity training sequences (the pretraining batch-prep step that turns
  * a shuffled document stream into max_seq_len-token rows; greedy packing
  * keeps padding waste low without the O(n log n) global coordination of
  * first-fit-decreasing).
  *
  * Scale shape: packing is inherently sequential, so the distributed form
  * range-partitions on the order key and packs each partition independently
  * with a per-partition greedy fold — bins never span partitions, costing
  * at most one under-filled bin per partition (ε waste for thousands of
  * bins per partition). Bin ids are (partition, local ordinal) pairs
  * encoded into one long, so they are globally unique without any
  * cross-partition coordination.
  */
object Packing {

  /** Greedily pack docs (in ascending `idCol` order) into bins of at most
    * `maxLen` tokens. A document longer than `maxLen` gets a bin of its own
    * (callers chunk oversize docs first — see TextFunctions.tokenChunks).
    *
    * Returns (idCol, n_tokens, bin_id) — one row per input doc.
    */
  def greedyPack(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      maxLen: Int,
      partitions: Int = 0): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive: $maxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val p =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    docs
      .select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .mapPartitions { it =>
        val part = org.apache.spark.TaskContext.getPartitionId().toLong
        var localBin = -1L
        var fill = 0L
        var started = false
        it.map { case (id, n) =>
          if (!started || fill + n > maxLen) { localBin += 1; fill = 0L; started = true }
          fill += n
          (id, n, (part << 32) | localBin)
        }
      }
      .toDF(idCol, "n_tokens", "bin_id")
  }

  /** Training-shard plan — the writer side of a pretraining pipeline:
    * documents are put in a DETERMINISTIC pseudo-random global order (Knuth
    * multiplicative hash of the id, tie-broken by id — the corpus-wide
    * "shuffle once, then read sequentially" every epoch loader expects) and
    * cut into contiguous shards of ~`budget` tokens each: a document starts
    * a new shard when the running token total before it has crossed the next
    * budget boundary. Deterministic from ids alone; re-running on the same
    * corpus yields the same shard for every document.
    *
    * Scale shape: one range exchange on the hash order (GlobalRank's
    * distributed cumsum — per-partition running sums plus a
    * numPartitions-sized driver offset array, never a single-partition
    * window), then a pure projection. No joins, no per-key state.
    *
    * Returns (idCol, n_tok, shard_id) — one row per doc.
    */
  def shardByTokenBudget(
      docs: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"shard token budget must be positive: $budget")
    // shared overflow-safe Knuth hash (single source: Features.knuthHashU32)
    val h = graft.ml.Features.knuthHashU32(col(idCol))
    val ranked = GlobalRank.globalCumSum(
      docs.select(col(idCol), col(tokenCol).cast("long").as("n_tok"),
        h.as("_h")),
      Seq(col("_h"), col(idCol)),
      col("n_tok"),
      "_cum")
    ranked
      .select(col(idCol), col("n_tok"),
        ((col("_cum") - col("n_tok")) / budget).cast("long").as("shard_id"))
  }

  /** Packing-efficiency report over a greedyPack result: bins, mean fill
    * ratio, padding waste — the metric a packing strategy is judged on.
    */
  def packingStats(packed: DataFrame, maxLen: Int): DataFrame = {
    val bins = packed.groupBy(col("bin_id")).agg(sum(col("n_tokens")).as("fill"))
    bins.agg(
      count(lit(1)).as("n_bins"),
      sum(col("fill")).as("total_tokens"),
      (sum(col("fill")) / (count(lit(1)) * maxLen.toLong).cast("double")).as("fill_ratio"),
      max(col("fill")).as("max_fill"))
  }
}
