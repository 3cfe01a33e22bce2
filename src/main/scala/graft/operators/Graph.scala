package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (companion to `Dedup.connectedComponents`
  * — the other graph primitive the dedup pipeline already ships).
  *
  * Everything stays in DataFrames: node and edge frames are the shuffle
  * unit, iterations are unrolled joins on the node key. Designed for the
  * "aggregated graph" regime that dominates analytics at scale — edges are
  * produced by an upstream aggregation (transition counts, co-occurrence
  * counts), so the frames here are category-cardinality-sized even when the
  * input scan was 100 TB.
  */
object Graph {

  /** Weighted PageRank with damping `d` over a directed edge list, `iters`
    * fixed power iterations from the uniform start:
    *
    *   pr⁰(v)   = 1/N
    *   prᵗ⁺¹(v) = (1−d)/N + d · Σ_{(u,v)∈E} prᵗ(u) · w(u,v)/Σ_x w(u,x)
    *
    * Returns (node, pr). Nodes = union of both edge endpoints. Dangling
    * mass (nodes with no out-edges) is NOT redistributed — the plain
    * SQL-expressible formulation, documented so the oracle can mirror it
    * exactly. The 1-row node count binds via broadcast (scalar bind, not a
    * pairwise product); each iteration is one equi-join + one grouped sum
    * on the node key, so the plan survives arbitrary node counts.
    *
    * Edges with null or non-positive weight are treated as ABSENT (filtered
    * before the out-weight normalization): a negative or zero weight has no
    * probabilistic reading, and keeping it would make w/Σw null or negative
    * and silently drop the source's contributions. A node whose out-edges
    * are all filtered becomes dangling (see above); nodes still appear in
    * the result via the endpoint union, which runs on the unfiltered edges.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // Lazy localCheckpoint truncates lineage so the unrolled iterations do
    // NOT replay the (potentially 100-TB) edge-producing scan once per
    // iteration — the aggregate-sized node/edge frames materialize once per
    // action (Dbscan label-propagation precedent).
    val nodes = edges
      .select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint(false)
    val nCount = nodes.agg(count(lit(1)).cast("double").as("_nn"))
    val posEdges = edges.filter(col(weightCol) > 0)
    val outW = posEdges.groupBy(col(srcCol).as("_s")).agg(sum(col(weightCol)).as("_out"))
    val norm = posEdges
      .join(outW, col(srcCol) === col("_s"))
      .select(
        col(srcCol).as("_u"),
        col(dstCol).as("_v"),
        (col(weightCol).cast("double") / col("_out")).as("_w"))
      .localCheckpoint(false)
    val base = nodes.crossJoin(broadcast(nCount))
    var pr = base.select(col("node"), (lit(1.0) / col("_nn")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = pr
        .join(norm, col("node") === col("_u"))
        .groupBy(col("_v").as("node"))
        .agg(sum(col("pr") * col("_w")).as("_in"))
      pr = base
        .join(contrib, Seq("node"), "left")
        .select(
          col("node"),
          ((lit(1.0) - damping) / col("_nn") +
            lit(damping) * coalesce(col("_in"), lit(0.0))).as("pr"))
    }
    pr
  }
}
