package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed DBSCAN for low-dimensional data (SURVEY.md §2.9 M21 — the
  * reference runs it on 2-D PCA projections, 红楼梦作者分析.py:189-220).
  *
  * Shape: grid-cell bucketing (cell side = eps) turns the ε-neighborhood
  * search into an equi-join — each point joins candidates from its 3×3
  * neighboring cells only, never a cross join. Core points (≥ minPts
  * neighbors, self included) connect into clusters by iterative min-label
  * propagation over core-core edges (a driver-controlled fixpoint loop of
  * joins, each a distributed job); border points adopt the smallest
  * neighboring core's cluster; the rest are noise (-1).
  *
  * Scale note: the candidate join's fan-out is bounded by cell occupancy —
  * uniform-ish data keeps it O(n · points-per-cell); degenerate all-in-one-
  * cell data degrades toward O(n²) exactly like classic grid DBSCAN.
  */
object Dbscan {

  /** Cluster (id, x, y) rows. Returns (id, cluster) with cluster = -1 for
    * noise; cluster labels are the minimum member core-id (deterministic).
    */
  def fit(points: DataFrame, idCol: String, xCol: String, yCol: String, eps: Double, minPts: Int): DataFrame = {
    val spark = points.sparkSession
    val pts = points
      .select(col(idCol).cast("long").as("id"), col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / eps))
      .withColumn("cy", floor(col("y") / eps))

    // candidate generation: replicate each point into its 3x3 neighbor cells
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val probes = pts.select(
      col("id").as("pid"), col("x").as("px"), col("y").as("py"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }: _*)).as("cell"))
      .select(col("pid"), col("px"), col("py"), col("cell.cx"), col("cell.cy"))

    val dist2 = (col("px") - col("x")) * (col("px") - col("x")) +
      (col("py") - col("y")) * (col("py") - col("y"))
    val edges = probes
      .join(pts.select(col("id"), col("x"), col("y"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(dist2 <= eps * eps)
      .select(col("pid"), col("id").as("nid"))
      .persist()

    // degree includes self (pid==nid pair comes from the (0,0) offset)
    val degrees = edges.groupBy("pid").agg(count(lit(1)).as("deg"))
    val core = degrees.filter(col("deg") >= minPts).select(col("pid").as("id")).persist()
    core.count()

    // core-core edges for label propagation
    val coreEdges = edges
      .join(core.withColumnRenamed("id", "pid"), Seq("pid"))
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"))
      .select(col("pid"), col("nid"))
      .persist()
    coreEdges.count()
    edges.unpersist()

    // Iterative min-label propagation to fixpoint (connected components).
    // localCheckpoint each round: persist alone caches DATA but the logical
    // plan still grows per iteration and planning time explodes — lineage
    // must be truncated in iterative DataFrame algorithms.
    var labels = core.withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 100) {
      val propagated = coreEdges
        .join(labels.select(col("id").as("nid"), col("label").as("nlabel")), Seq("nid"))
        .groupBy(col("pid").as("id"))
        .agg(min(col("nlabel")).as("newLabel"))
      val next = labels
        .join(propagated, Seq("id"))
        .select(col("id"), least(col("label"), col("newLabel")).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels = next
      iter += 1
    }

    // border points: non-core with a core neighbor -> that core's cluster
    val coreLabels = labels.select(col("id").as("nid"), col("label"))
    val assigned = pts.select(col("id"))
      .join(labels.withColumnRenamed("label", "core_label"), Seq("id"), "left_outer")
      .join(borderLabel(probes, pts, core, coreLabels, eps), Seq("id"), "left_outer")
      .select(
        col("id"),
        coalesce(col("core_label"), col("border_label"), lit(-1L)).as("cluster"))

    core.unpersist()
    coreEdges.unpersist()
    assigned
  }

  private def probesToCores(probes: DataFrame, pts: DataFrame, core: DataFrame, eps: Double): DataFrame = {
    val dist2 = (col("px") - col("x")) * (col("px") - col("x")) +
      (col("py") - col("y")) * (col("py") - col("y"))
    probes
      .join(pts.select(col("id"), col("x"), col("y"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(dist2 <= eps * eps)
      .join(core.withColumnRenamed("id", "cid"), col("id") === col("cid"))
      .select(col("pid").as("id"), col("cid"))
  }

  /** cluster label for border points = min label among neighboring cores */
  private def borderLabel(
      probes: DataFrame,
      pts: DataFrame,
      core: DataFrame,
      coreLabels: DataFrame,
      eps: Double): DataFrame =
    probesToCores(probes, pts, core, eps)
      .join(coreLabels.withColumnRenamed("nid", "cid"), Seq("cid"))
      .groupBy(col("id"))
      .agg(min(col("label")).as("border_label"))
}
