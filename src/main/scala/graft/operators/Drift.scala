package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift read-offs over histogram CELL TABLES — the
  * monitoring layer on top of the sketch tier: the cells
  * ([[graft.functions.QuantileSketch.cells]] /
  * `StreamOps.windowedHistCells`) summarize the data once; drift scoring
  * then runs on the summaries only (periods × bins rows), never on the
  * data. Complements the batch two-sample forms (q116's decile PSI,
  * q125's KS) with the STANDING-MONITOR shape: one reference window, a
  * PSI score per period, scheduled over drained streaming cells.
  */
object Drift {

  /** Population Stability Index per period from cell tables:
    * `cells` = (periodCol, bin, cnt), `refCells` = (bin, cnt) — both at
    * the SAME (lo, hi, bins) declaration (a contract, like every cell
    * merge). psi(period) = Σ_bins (p − q)·ln(p/q) with
    * p = max(cnt_period/total_period, eps),
    * q = max(cnt_ref/total_ref, eps) — the standard empty-bin floor, kept
    * DETERMINISTIC: p and q are ratios of exact integers and the one ln
    * per term is the single transcendental (the q245 discipline), so a
    * batch oracle re-derives every psi bit-for-bit modulo final rounding.
    * Returns (periodCol, psi).
    *
    * The conventional alarm levels on this statistic (Karakoulas 2004 /
    * credit-scoring practice): < 0.1 stable, 0.1–0.2 watch, > 0.2 drifted.
    *
    * Scale shape: the score grid is periods × union-of-bins — both sides
    * BOUNDED (bins by declaration, periods by the calendar/watermark), so
    * the broadcast bin spine and the 1-row reference-total bind are
    * dimension products, never input-cardinality work; nothing here
    * rescans the data the cells summarized.
    *
    * An EMPTY reference (no rows, or all-NULL counts) fails loud at
    * action time (in-plan assert on the 1-row total) instead of silently
    * flooring every q to eps and scoring garbage PSI against nothing.
    */
  def psiByPeriod(
      cells: DataFrame,
      periodCol: String,
      refCells: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0.0 && eps < 1.0, s"eps must be in (0, 1): $eps")
    Seq("bin", "cnt").foreach { c =>
      require(cells.columns.contains(c) && refCells.columns.contains(c),
        s"cell tables need (bin, cnt): ${cells.columns.toSeq} / ${refCells.columns.toSeq}")
    }
    val working = Set("_tp", "_cp", "_cr", "_tr")
    val clash = working.intersect(cells.columns.toSet ++ refCells.columns.toSet + periodCol)
    require(clash.isEmpty,
      s"psiByPeriod's working columns clash with input columns: $clash — rename them first")
    val totals = cells.groupBy(col(periodCol)).agg(sum(col("cnt")).as("_tp"))
    // `agg` on a frame with zero rows still yields one row with a NULL sum,
    // so this 1-row filter sees exactly one tuple: assert_true throws on an
    // empty/all-null reference, and the IsNull wrapper reads true otherwise
    // (the filter can't be pruned — its child is non-foldable).
    val refTot = refCells.agg(sum(col("cnt")).as("_tr"))
      .where(assert_true(col("_tr").isNotNull && col("_tr") > 0,
        lit("psiByPeriod: reference cells are empty (no rows or all-NULL counts) — " +
          "a PSI against nothing is meaningless")).isNull)
    val bins = cells.select(col("bin"))
      .unionByName(refCells.select(col("bin"))).distinct()
    val p = greatest(coalesce(col("_cp"), lit(0L)) / col("_tp"), lit(eps))
    val q = greatest(coalesce(col("_cr"), lit(0L)) / col("_tr"), lit(eps))
    totals
      .crossJoin(broadcast(bins)) // period × bin spine: bounded dimensions
      .join(cells.select(col(periodCol), col("bin"), col("cnt").as("_cp")),
        Seq(periodCol, "bin"), "left")
      .join(broadcast(refCells.select(col("bin"), col("cnt").as("_cr"))),
        Seq("bin"), "left")
      .crossJoin(broadcast(refTot)) // 1-row total bind
      .groupBy(col(periodCol))
      .agg(sum((p - q) * log(p / q)).as("psi"))
  }

  /** [[psiByPeriod]] over ADAPTIVE histogram cells — the align step that
    * lets the standing monitor ride the unknown-range sketch
    * ([[graft.functions.AdaptiveHist]] /
    * `StreamOps.windowedAdaptiveHistBufs`) instead of requiring a declared
    * (lo, hi, bins). Inputs carry a `scale` column: `cells` =
    * (periodCol, scale, bin, cnt), `refCells` = (scale, bin, cnt) — each
    * row's bin is floor(value / 2^scale), and different periods (or a
    * grown reference) legitimately sit at different scales.
    *
    * Alignment is the `AdaptiveHistAgg.merge` discipline: every row rebins
    * to the COARSEST scale present in either input —
    * bin' = floorDiv(bin, 2^(target − scale)), counts summed — which is
    * exact (floorDiv composes: a cell at a finer scale partitions
    * perfectly into the coarser bins), order-independent, and leaves all
    * distributions on ONE shared bin grid, the precondition
    * [[psiByPeriod]]'s contract states. floorDiv by 2^d is an arithmetic
    * shift; deltas ≥ 63 collapse to the sign bin (0 / −1) explicitly —
    * Java's `>>` would silently wrap at 64. The PSI read-off is then
    * [[psiByPeriod]] verbatim, so the determinism contract (exact integer
    * ratios, one ln per term) carries over, at the resolution cost the
    * adaptive trade always pays: PSI is scored at the coarsest
    * contributing scale (when every input sits at one scale already, the
    * align step is the identity and this equals the fixed-range score —
    * same bins, counts, and per-term doubles; only the float summation
    * order can differ at the ulp level — DriftSpec pins it).
    */
  def psiByPeriodAdaptive(
      cells: DataFrame,
      periodCol: String,
      refCells: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    Seq("scale", "bin", "cnt").foreach { c =>
      require(cells.columns.contains(c) && refCells.columns.contains(c),
        s"adaptive cell tables need (scale, bin, cnt): " +
          s"${cells.columns.toSeq} / ${refCells.columns.toSeq}")
    }
    val workingAd = Set("_ts", "_bin2")
    val clashAd = workingAd.intersect(
      cells.columns.toSet ++ refCells.columns.toSet + periodCol)
    require(clashAd.isEmpty,
      s"psiByPeriodAdaptive's working columns clash with input columns: $clashAd — " +
        "rename them first")
    val tgt = cells.select(col("scale"))
      .unionAll(refCells.select(col("scale")))
      .agg(max(col("scale")).as("_ts"))
    def aligned(df: DataFrame, keys: Seq[String]): DataFrame = {
      val d = col("_ts") - col("scale")
      val bin2 = when(d >= 63, when(col("bin") < 0, lit(-1L)).otherwise(lit(0L)))
        .otherwise(expr("shiftright(bin, _ts - scale)"))
      df.crossJoin(broadcast(tgt)) // 1-row target-scale bind
        .withColumn("_bin2", bin2)
        .groupBy((keys :+ "_bin2").map(col): _*)
        .agg(sum(col("cnt")).as("cnt"))
        .withColumnRenamed("_bin2", "bin")
    }
    psiByPeriod(aligned(cells, Seq(periodCol)), periodCol, aligned(refCells, Nil), eps)
  }
}
