package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact weighted LOWER median (smallest value whose cumulative weight
  * reaches half the total) per group, by iterative histogram refinement —
  * the distributed binary-search-on-value plan, replacing the sort-based
  * window form whose per-group sort input grows with value cardinality.
  *
  * Each round bucketizes the surviving value range [lo, hi] into `buckets`
  * equal-width bins, aggregates (weight, min value, max value) per
  * (group, bin) — a groups×buckets-row frame, driver-bounded by contract —
  * and descends into the bin holding the median target. A bin whose min and
  * max coincide IS the answer (every smaller value is already accounted in
  * the running target). The value range shrinks ×buckets per round, so
  * doubles exhaust their 52 mantissa bits in ≤ ⌈52/log2(buckets)⌉ + 2
  * rounds regardless of row count; each round is one scan + one shuffle of
  * the (filtered) input with NO per-group sort. The default 1024-way
  * fan-out resolves money-style domains (≤ ~10⁶ distinct 2-dp values) in
  * two rounds; the per-round shuffle stays groups×1024 rows — still
  * driver-trivial.
  *
  * Contract: GROUP cardinality must be driver-bounded (the per-round
  * histogram is collected); VALUE cardinality is unbounded — the exact
  * inverse of the window form's trade, and the right one when groups are a
  * domain (return flags, categories) and values grow with the data.
  * Weights must be non-negative; null values/weights are excluded.
  */
object WeightedMedian {

  /** Result: one row per group with `totCol` = total weight and `outCol` =
    * the weighted lower median. Original group column types survive (the
    * driver's per-group answers are joined back to the distinct-groups
    * frame via a broadcast on an internal string key).
    */
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      weightCol: String,
      outCol: String = "weighted_median",
      totCol: String = "total_weight",
      buckets: Int = 1024,
      maxIters: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "WeightedMedian needs at least one group column")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    // non-printing sentinels: separator keeps multi-column keys collision-free;
    // the null marker distinguishes SQL NULL from the string "null"

    val sep = "\u0001"
    val nullMark = "\u0002null"
    val gk = concat_ws(sep, groupCols.map(c => coalesce(col(c).cast("string"), lit(nullMark))): _*)
    val base = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(
        gk.as("_wm_gk"),
        col(valueCol).cast("double").as("_wm_v"),
        col(weightCol).cast("double").as("_wm_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one aggregate pass: per-group total / value bounds (groups-bounded);
      // the weight minimum rides the same pass so the documented
      // "weights must be non-negative" contract is ENFORCED, not assumed —
      // a negative weight corrupts every descent target silently otherwise
      val init = base
        .groupBy(col("_wm_gk"))
        .agg(
          sum(col("_wm_w")).as("tot"),
          min(col("_wm_v")).as("lo"),
          max(col("_wm_v")).as("hi"),
          min(col("_wm_w")).as("minw"))
        .collect()
      init.foreach { r =>
        // isNullAt guard: a null min (defensively possible if the null-filter
        // above ever changes) must raise the descriptive error, not an NPE
        require(!r.isNullAt(4) && r.getDouble(4) >= 0.0,
          s"WeightedMedian requires non-negative weights; group ${r.getString(0)} " +
            s"has min weight ${if (r.isNullAt(4)) "NULL" else r.getDouble(4).toString}")
      }

      final case class St(lo: Double, hi: Double, target: Double, tot: Double)
      val answers = scala.collection.mutable.Map[String, (Double, Double)]() // gk -> (median, tot)
      val state = scala.collection.mutable.Map[String, St]()
      init.foreach { r =>
        val (k, tot, lo, hi) = (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
        if (lo == hi) answers(k) = (lo, tot)
        else state(k) = St(lo, hi, tot / 2.0, tot)
      }

      var iter = 0
      while (state.nonEmpty && iter < maxIters) {
        val bounds = state.toSeq
          .map { case (k, s) => (k, s.lo, s.hi) }
          .toDF("_wm_gk", "_wm_lo", "_wm_hi")
        val span = col("_wm_hi") - col("_wm_lo")
        val bin = least(
          floor((col("_wm_v") - col("_wm_lo")) / span * buckets).cast("int"),
          lit(buckets - 1))
        val hist = base
          .join(broadcast(bounds), Seq("_wm_gk"))
          .filter(col("_wm_v") >= col("_wm_lo") && col("_wm_v") <= col("_wm_hi"))
          .groupBy(col("_wm_gk"), bin.as("_wm_b"))
          .agg(sum(col("_wm_w")).as("w"), min(col("_wm_v")).as("mn"), max(col("_wm_v")).as("mx"))
          .collect()
          .groupBy(_.getString(0))
        hist.foreach { case (k, rows) =>
          val s = state(k)
          var target = s.target
          val sorted = rows.sortBy(_.getInt(1))
          var i = 0
          var found = false
          while (!found && i < sorted.length) {
            val (w, mn, mx) = (sorted(i).getDouble(2), sorted(i).getDouble(3), sorted(i).getDouble(4))
            if (w >= target) {
              if (mn == mx) { answers(k) = (mn, s.tot); state.remove(k) }
              else state(k) = St(mn, mx, target, s.tot)
              found = true
            } else target -= w
            i += 1
          }
          // target exceeding the remaining in-range weight can only be a
          // float-accumulation artifact at the top boundary: answer = max
          if (!found) { answers(k) = (s.hi, s.tot); state.remove(k) }
        }
        iter += 1
      }
      require(state.isEmpty,
        s"WeightedMedian did not converge in $maxIters rounds (${state.size} groups open)")

      val resolved = answers.toSeq
        .map { case (k, (med, tot)) => (k, med, tot) }
        .toDF("_wm_gk", outCol, totCol)
      df.select(groupCols.map(col): _*).distinct()
        .withColumn("_wm_gk", gk)
        .join(broadcast(resolved), Seq("_wm_gk"), "inner")
        .drop("_wm_gk")
    } finally base.unpersist()
  }
}
