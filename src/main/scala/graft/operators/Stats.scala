package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical diagnostics over distributed data (north-star EDA suite:
  * the reference's correlation / contingency / trend analyses re-expressed
  * as aggregate-only Spark plans).
  *
  * Every operator here reduces to sufficient statistics computed in ONE
  * map-side-combinable aggregation pass wherever the math allows (corr
  * matrix, OLS fit) — no per-row UDFs, no driver-side loops over data, so
  * each survives a 100× scale-up as a single shuffle of group keys.
  */
object Stats {

  /** Pairwise Pearson correlation matrix over `cols`, melted to long form
    * (col_a, col_b, corr) with col_a < col_b by input order.
    *
    * All n·(n−1)/2 `corr` aggregates ride ONE aggregation pass over the
    * input (a single scan + a 1-row result) — the pandas `df.corr()` shape
    * (reference: 蔬菜价格相关性分析.py's price-correlation step) without n²
    * separate jobs. The melt happens on the 1-row aggregate frame, so the
    * stack is driver-sized regardless of input size.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns, got ${cols.size}")
    val pairs = for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) => corr(col(a), col(b)).as(s"_c$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Typed-Column melt (array-of-structs + explode) rather than a
    // string-interpolated stack(): column names with quotes/backticks can't
    // break expression parsing, and the explode rides the 1-row agg frame.
    val entries = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col(s"_c$i").as("corr"))
    }
    wide
      .select(explode(array(entries: _*)).as("_e"))
      .select(col("_e.col_a"), col("_e.col_b"), col("_e.corr"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns, plus Cramér's V effect size. Returns ONE row:
    * (n, n_rows, n_cols, dof, chi2, cramers_v).
    *
    * Zero-observed cells still contribute their expected count (the full
    * R×C grid is materialized from the row/column marginals). The grid is
    * the product of two AGGREGATE frames (R and C category rows) — a
    * deliberate tiny product, never a product over the input.
    */
  def chiSquareIndependence(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val obs = df.groupBy(col(rowCol).as("_r"), col(colCol).as("_c"))
      .agg(count(lit(1)).as("_o"))
    val rowTot = obs.groupBy(col("_r")).agg(sum(col("_o")).as("_rt"))
    val colTot = obs.groupBy(col("_c")).agg(sum(col("_o")).as("_ct"))
    val tot = obs.agg(sum(col("_o")).as("_n"))
    val grid = rowTot
      .crossJoin(broadcast(colTot))
      .crossJoin(broadcast(tot))
      .join(obs, Seq("_r", "_c"), "left")
      .withColumn("_o0", coalesce(col("_o"), lit(0L)).cast("double"))
      .withColumn("_e", col("_rt").cast("double") * col("_ct") / col("_n"))
    grid
      .agg(
        first(col("_n")).as("n"),
        countDistinct(col("_r")).as("n_rows"),
        countDistinct(col("_c")).as("n_cols"),
        sum(pow(col("_o0") - col("_e"), 2) / col("_e")).as("_chi2"))
      .select(
        col("n"),
        col("n_rows"),
        col("n_cols"),
        ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
        col("_chi2").as("chi2"),
        sqrt(
          col("_chi2") / (col("n") * least(col("n_rows") - 1, col("n_cols") - 1)))
          .as("cramers_v"))
  }

  /** Per-group simple-OLS fit y ~ slope·x + intercept from sufficient
    * statistics: one groupBy pass computing (n, Σx, Σy, Σxy, Σx², Σy²),
    * then the closed forms
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * Entirely codegen'd aggregates — the distributed version of the
    * reference's per-series scipy/np.polyfit trend fits. Degenerate groups
    * (constant x) yield null slope/intercept/r².
    */
  def olsFit(df: DataFrame, groupCols: Seq[String], xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("double").as("_n"),
        sum(x).as("_sx"),
        sum(y).as("_sy"),
        sum(x * y).as("_sxy"),
        sum(x * x).as("_sxx"),
        sum(y * y).as("_syy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val denX = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val denY = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val slope = when(denX =!= 0.0, num / denX)
    agged.select(
      groupCols.map(col) ++ Seq(
        col("_n").cast("long").as("n"),
        slope.as("slope"),
        when(denX =!= 0.0, (col("_sy") - (num / denX) * col("_sx")) / col("_n"))
          .as("intercept"),
        when(denX =!= 0.0 && denY =!= 0.0, (num * num) / (denX * denY)).as("r2")): _*)
  }

  /** Per-group robust outlier report via the MAD rule: modified z-score
    * z_i = 0.6745·(x_i − median) / MAD, outlier when |z| > `cutoff`
    * (Iglewicz–Hoaglin, the robust companion to the q85 IQR fence).
    * Returns per group: (n, med, mad, n_outliers, max_abs_z).
    *
    * Exact medians via `percentile` — two grouped percentile passes (values,
    * then absolute deviations) + one final rollup, all shuffling only the
    * group key. Degenerate groups (MAD = 0) report null z and 0 outliers.
    * Group keys are matched null-safely (`<=>`), so null-keyed groups keep
    * their stats instead of being dropped by the re-join.
    */
  def madOutliers(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    // Null-safe re-join helper: rename the agg frame's keys, join on <=>,
    // drop the renamed keys — groupBy emits a row for null keys and the
    // default equi-join would silently drop it.
    def joinNullSafe(left: DataFrame, right: DataFrame): DataFrame = {
      val renamed = groupCols.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"_gk_$c"))
      left
        .join(broadcast(renamed), groupCols.map(c => col(c) <=> col(s"_gk_$c")).reduce(_ && _))
        .drop(groupCols.map(c => s"_gk_$c"): _*)
    }
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("_med"))
    val withMed = joinNullSafe(df, med)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(v - col("_med")), lit(0.5)).as("_mad"))
    val z = when(col("_mad") =!= 0.0, abs(v - col("_med")) * 0.6745 / col("_mad"))
    joinNullSafe(withMed, mad)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        first(col("_med")).as("med"),
        first(col("_mad")).as("mad"),
        sum(when(z > cutoff, 1L).otherwise(0L)).as("n_outliers"),
        max(z).as("max_abs_z"))
  }

  /** Theil–Sen robust slope: the median of all pairwise slopes
    * (y_j − y_i)/(x_j − x_i) over x_j > x_i — the outlier-resistant trend
    * estimator (breakdown point ~29%, vs 0 for OLS).
    *
    * BOUNDED-FRAME CONTRACT: the O(n²) pair join is only sane when `df` is
    * an AGGREGATE frame whose cardinality is fixed by the calendar or a
    * category domain (daily/monthly series: ≤ a few thousand rows ⇒ ≤ a few
    * million pairs), never a raw data-sized input. Under that contract the
    * broadcast nested-loop pair join and the single exact-percentile reduce
    * are both constant-sized regardless of the underlying data volume.
    */
  def theilSen(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val a = df.select(col(xCol).cast("double").as("_xa"), col(yCol).cast("double").as("_ya"))
    val b = df.select(col(xCol).cast("double").as("_xb"), col(yCol).cast("double").as("_yb"))
    val slopes = a.join(b, col("_xb") > col("_xa"))
      .select(((col("_yb") - col("_ya")) / (col("_xb") - col("_xa"))).as("_slope"))
    // exact median via the range-partitioned global ranking, not a single
    // `percentile` reduce: the slope frame is bounded but still millions of
    // rows — GlobalRank sorts it across all partitions and the median is
    // the mean of the two middle order statistics (equals the interpolated
    // median for even counts, the exact element for odd).
    val (ranked, n) = GlobalRank.globalRowNumberWithTotal(slopes, Seq(col("_slope")), "_rn")
    val lo = (n + 1) / 2
    val hi = n / 2 + 1
    ranked
      .filter(col("_rn") === lo || col("_rn") === hi)
      .agg(avg(col("_slope")).as("theil_sen_slope"))
      .select(lit(n).as("n_pairs"), col("theil_sen_slope"))
  }

  /** Mann–Kendall trend test: S = Σ_{i<j} sign(v_j − v_i) over the series
    * ordered by `orderCol`, normal approximation with continuity correction
    * and the standard tie-adjusted variance
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 over the tied-
    * value groups (Kendall 1975) — without it, heavily tied series overstate
    * Var(S) and under-flag real trends. Returns one row:
    * (n, n_pairs, s, var_s, z, verdict) with verdict 'trend' when |z| > zCrit.
    *
    * Same bounded-frame contract as [[theilSen]]: the pair join is for
    * calendar-sized aggregate series only.
    */
  def mannKendall(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      zCrit: Double = 1.96): DataFrame = {
    val a = df.select(col(orderCol).as("_oa"), col(valueCol).cast("double").as("_va"))
    val b = df.select(col(orderCol).as("_ob"), col(valueCol).cast("double").as("_vb"))
    val sAgg = a.join(b, col("_ob") > col("_oa"))
      .select(signum(col("_vb") - col("_va")).cast("long").as("_sgn"))
      .agg(sum(col("_sgn")).as("s"), count(lit(1)).as("n_pairs"))
    val nAgg = df.agg(count(lit(1)).as("n"))
    // tie groups: one aggregate over the (bounded) series — groups of size 1
    // contribute 0 to the term, so no filter is needed
    val tieAgg = df
      .groupBy(col(valueCol).cast("double").as("_tv"))
      .agg(count(lit(1)).as("_t"))
      .agg(coalesce(
        sum(col("_t") * (col("_t") - 1) * (col("_t") * 2 + 5)), lit(0L)).as("tie_term"))
    val varS =
      (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_term")) / 18.0
    val sCorr = when(col("s") > 0, col("s") - 1).when(col("s") < 0, col("s") + 1).otherwise(0L)
    nAgg
      .crossJoin(broadcast(sAgg))
      .crossJoin(broadcast(tieAgg))
      .withColumn("var_s", varS)
      // var_s = 0 ⇔ every value tied ⇔ S = 0: define z = 0 (no trend), not 0/0
      .withColumn("z", when(col("var_s") > 0, sCorr / sqrt(col("var_s"))).otherwise(0.0))
      .withColumn("verdict", when(abs(col("z")) > zCrit, "trend").otherwise("no_trend"))
      .select(col("n"), col("n_pairs"), col("s"), col("var_s"), col("z"), col("verdict"))
  }
}
