package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — `row_number()` / `ntile(k)` over a
  * total order WITHOUT the single-partition `WindowExec` that
  * `Window.orderBy(...)` (no partitionBy) plans. That shape sorts the whole
  * frame on one reducer; fine on a bounded frame, a scale-killer on any
  * frame that grows with the input (per-user aggregates at 10⁹ users).
  *
  * Two-pass range-partitioned rank instead (the classic distributed
  * order-statistics plan, same shape Spark itself uses inside
  * `repartitionByRange` + sortWithinPartitions):
  *
  *   1. `repartitionByRange(sortCols)` — sampled range exchange puts each
  *      partition in charge of a contiguous key range (equal keys land in
  *      one partition); `localCheckpoint` pins ONE materialization so the
  *      count pass and the rank pass see identical partition boundaries
  *      (range sampling re-executed across actions is not guaranteed to
  *      resample identically).
  *   2. Per-partition counts (numPartitions rows — a scalar-sized frame)
  *      are collected, turned into exclusive prefix offsets on the driver,
  *      and broadcast-joined back; the global rank is the WITHIN-partition
  *      `row_number()` (a `WindowExec` partitioned by `spark_partition_id`,
  *      i.e. parallel) plus the partition's offset.
  *
  * Every shuffle here carries the frame once; the only sequential state is
  * the numPartitions-entry offset array. Callers must pass a tie-broken
  * sort (append a unique key column) for a deterministic total order —
  * ties that straddle a range boundary would otherwise make the rank
  * assignment nondeterministic (same contract as `Window.orderBy`).
  */
object GlobalRank {

  /** df + `outCol` = exact global 1-based rank (long) under `sortCols`. */
  def globalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      numPartitions: Int = 0): DataFrame =
    rankedWithTotal(df, sortCols, outCol, numPartitions)._1

  /** Like [[globalRowNumber]] but also returns the total row count (already
    * known from the offset pass — saves callers a second action when they
    * need both the rank and N, e.g. top-p% membership).
    */
  def globalRowNumberWithTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      numPartitions: Int = 0): (DataFrame, Long) =
    rankedWithTotal(df, sortCols, outCol, numPartitions)

  /** df + `outCol` = exact global running sum of `valueCol` over the
    * `sortCols` total order (frame = unbounded preceding .. current row),
    * range-partitioned: per-partition running sums in parallel plus the
    * driver-combined exclusive prefix of per-partition totals — the
    * distributed sweep-line / cumulative-distribution scan. Integral value
    * columns accumulate in Long, fractional in Double (same promotion as
    * Spark's own `sum`). Ties within `sortCols` are summed in partition
    * order — callers needing a deterministic per-row value (rather than a
    * tie-commutative downstream agg) must tie-break to a total order.
    */
  def globalCumSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: Column,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val (parted, n) = rangeParted(df, sortCols, numPartitions)
    val perPid = parted
      .groupBy(col("_grk_pid"))
      .agg(sum(valueCol).as("_grk_v"))
    val sumType = perPid.schema("_grk_v").dataType
    val sums = perPid
      .collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Number]))
      .toMap
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = sumType match {
      case org.apache.spark.sql.types.LongType =>
        val offs = (0 until n).scanLeft(0L) { (acc, pid) =>
          acc + sums.getOrElse(pid, None).map(_.longValue).getOrElse(0L)
        }
        (0 until n).map(pid => (pid, offs(pid))).toDF("_grk_pid", "_grk_off")
      case dt: org.apache.spark.sql.types.DecimalType =>
        // money columns must stay EXACT — accumulate offsets in BigDecimal
        // and carry the sum's own decimal type (collapsing to double here
        // would silently trade the window form's exactness for float error)
        val offs = (0 until n).scanLeft(java.math.BigDecimal.ZERO) { (acc, pid) =>
          acc.add(sums.getOrElse(pid, None)
            .map {
              case d: java.math.BigDecimal => d
              case x => new java.math.BigDecimal(x.toString)
            }
            .getOrElse(java.math.BigDecimal.ZERO))
        }
        (0 until n).map(pid => (pid, offs(pid))).toDF("_grk_pid", "_grk_off")
          .select(col("_grk_pid"), col("_grk_off").cast(dt).as("_grk_off"))
      case _ =>
        val offs = (0 until n).scanLeft(0.0) { (acc, pid) =>
          acc + sums.getOrElse(pid, None).map(_.doubleValue).getOrElse(0.0)
        }
        (0 until n).map(pid => (pid, offs(pid))).toDF("_grk_pid", "_grk_off")
    }
    val within = Window
      .partitionBy(col("_grk_pid"))
      .orderBy(sortCols.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .join(broadcast(offDf), Seq("_grk_pid"))
      .withColumn(outCol, sum(valueCol).over(within) + col("_grk_off"))
      .drop("_grk_pid", "_grk_off")
  }

  /** df + `outCol` = exact global running max of `valueCol` over STRICTLY
    * PRECEDING rows in the `sortCols` total order (frame = unbounded
    * preceding .. -1; null on the first row) — the Pareto-frontier /
    * record-to-date scan. Same range-partitioned shape as [[globalCumSum]]:
    * the per-partition exclusive running max is combined with the max over
    * all earlier partitions (greatest() skips nulls, so empty prefixes and
    * first rows degrade exactly like the window form).
    */
  def globalRunningMaxExclusive(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: Column,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val (parted, n) = rangeParted(df, sortCols, numPartitions)
    val perPid = parted
      .groupBy(col("_grk_pid"))
      .agg(max(valueCol).as("_grk_v"))
    val dt = perPid.schema("_grk_v").dataType
    val maxes = perPid
      .collect()
      .map(r => r.getInt(0) -> Option(r.get(1)).map(_.asInstanceOf[Number]))
      .toMap
    // exclusive prefix max of the per-partition maxes, on numPartitions
    // scalars; integral types compare in Long (exact beyond 2^53),
    // fractional in Double
    val integral = dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        true
      case _ => false
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf =
      if (integral) {
        val prefix = (0 until n).scanLeft(Option.empty[Long]) { (acc, pid) =>
          val v = maxes.getOrElse(pid, None).map(_.longValue)
          (acc, v) match {
            case (Some(a), Some(b)) => Some(math.max(a, b))
            case (a, b) => a.orElse(b)
          }
        }
        (0 until n).map(pid => (pid, prefix(pid))).toDF("_grk_pid", "_grk_off")
      } else {
        val prefix = (0 until n).scanLeft(Option.empty[Double]) { (acc, pid) =>
          val v = maxes.getOrElse(pid, None).map(_.doubleValue)
          (acc, v) match {
            case (Some(a), Some(b)) => Some(math.max(a, b))
            case (a, b) => a.orElse(b)
          }
        }
        (0 until n).map(pid => (pid, prefix(pid))).toDF("_grk_pid", "_grk_off")
      }
    val offTyped = offDf.withColumn("_grk_off", col("_grk_off").cast(dt))
    val within = Window
      .partitionBy(col("_grk_pid"))
      .orderBy(sortCols.toIndexedSeq: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .join(broadcast(offTyped), Seq("_grk_pid"))
      .withColumn(outCol, greatest(max(valueCol).over(within), col("_grk_off")))
      .drop("_grk_pid", "_grk_off")
  }

  /** df + `outCol` = SQL `ntile(buckets)` (int) under `sortCols`, computed
    * from the global rank in closed form: with N rows, q = N/buckets,
    * r = N mod buckets, buckets 1..r hold q+1 rows and the rest hold q —
    * exactly the standard-SQL bucket sizing, so results are value-identical
    * to `ntile(k).over(Window.orderBy(...))` while the plan stays parallel.
    */
  def globalNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      buckets: Int,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (ranked, n) = rankedWithTotal(df, sortCols, s"_grn_$outCol", numPartitions)
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1)
    val rn = col(s"_grn_$outCol")
    // All operands are exact-integer doubles far below 2^53, and floor of a
    // correctly-rounded quotient of such integers is the true integer part.
    val bucket =
      if (q == 0L) rn // fewer rows than buckets: bucket i = rank i
      else
        when(rn <= cut, floor((rn - 1) / lit(q + 1)) + 1)
          .otherwise(lit(r) + floor((rn - cut - 1) / lit(q)) + 1)
    ranked
      .withColumn(outCol, bucket.cast("int"))
      .drop(s"_grn_$outCol")
  }

  /** Per-group exact `ntile(buckets)` under `sortCols` WITHIN each value of
    * `groupCol`, from ONE range exchange on (groupCol, sortCols…) — the
    * multi-frame form of [[globalNtile]]. Ranking k frames (periods,
    * cohorts) as separate globalNtile calls costs k range exchanges +
    * checkpoints + count jobs; here the group key leads the range sort, so
    * every group is ranked off the same exchange, and the driver state is
    * one (numPartitions × groups) count frame — BOUNDED-GROUPS CONTRACT:
    * `groupCol` must have a small, data-independent cardinality (a handful
    * of periods), never a data-sized key.
    */
  def globalNtileGrouped(
      df: DataFrame,
      groupCol: String,
      sortCols: Seq[Column],
      buckets: Int,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (parted, n) = rangeParted(df, col(groupCol) +: sortCols, numPartitions)
    val spark = df.sparkSession
    val gType = df.schema(groupCol).dataType
    // (numPartitions × groups) rows — scalar-sized under the contract
    val counts = parted
      .groupBy(col("_grk_pid"), col(groupCol).as("_grk_g"))
      .agg(count(lit(1)).as("_grk_c"))
      .collect()
      .map(r => (r.getInt(0), r.get(1)) -> r.getLong(2))
      .toMap
    val groups = counts.keysIterator.map(_._2).toSeq.distinct
    val totals = groups.map { g =>
      g -> counts.collect { case ((_, g2), c) if g2 == g => c }.sum
    }.toMap
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    groups.foreach { g =>
      var acc = 0L
      (0 until n).foreach { pid =>
        val c = counts.getOrElse((pid, g), 0L)
        if (c > 0L) offRows.add(org.apache.spark.sql.Row(pid, g, acc, totals(g)))
        acc += c
      }
    }
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_grk_pid", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_grk_g", gType),
      org.apache.spark.sql.types.StructField("_grk_off", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_grk_tot", org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(offRows, offSchema)
    val within = Window
      .partitionBy(col("_grk_pid"), col(groupCol))
      .orderBy(sortCols.toIndexedSeq: _*)
    // standard-SQL ntile sizing from the in-group rank, per group: with N
    // rows and b buckets, q = N/b, r = N mod b — buckets 1..r get q+1 rows
    val rn = row_number().over(within).cast("long") + col("_grk_off")
    val q = floor(col("_grk_tot") / buckets).cast("long")
    val r = col("_grk_tot") % buckets
    val cut = r * (q + 1)
    val bucket =
      when(q === 0L, rn)
        .when(rn <= cut, floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + floor((rn - cut - 1) / q) + 1)
    parted
      .join(
        broadcast(offDf),
        // <=> not ===: the driver offsets include a NULL group (groupBy
        // keeps nulls), so the join-back must too or those rows vanish
        parted("_grk_pid") === offDf("_grk_pid") && col(groupCol) <=> offDf("_grk_g"))
      .drop(offDf("_grk_pid"))
      .withColumn(outCol, bucket.cast("int"))
      .drop("_grk_pid", "_grk_g", "_grk_off", "_grk_tot")
  }

  /** Shared first pass: range exchange + partition id, pinned by
    * localCheckpoint so every later pass sees identical boundaries.
    */
  private def rangeParted(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int): (DataFrame, Int) = {
    require(sortCols.nonEmpty, "GlobalRank needs at least one sort column")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, sortCols: _*)
      .withColumn("_grk_pid", spark_partition_id())
      .localCheckpoint(false)
    (parted, n)
  }

  private def rankedWithTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      outCol: String,
      numPartitions: Int): (DataFrame, Long) = {
    val (parted, n) = rangeParted(df, sortCols, numPartitions)
    val spark = df.sparkSession
    // numPartitions-sized aggregate → driver: scalar-sized by construction.
    val counts = parted
      .groupBy(col("_grk_pid"))
      .agg(count(lit(1)).as("_grk_c"))
      .collect()
      .map(row => row.getInt(0) -> row.getLong(1))
      .toMap
    val total = counts.valuesIterator.sum
    val offsets = (0 until n).scanLeft(0L) { (acc, pid) =>
      acc + counts.getOrElse(pid, 0L)
    }
    import spark.implicits._
    val offDf = (0 until n)
      .map(pid => (pid, offsets(pid)))
      .toDF("_grk_pid", "_grk_off")
    val within = Window
      .partitionBy(col("_grk_pid"))
      .orderBy(sortCols.toIndexedSeq: _*)
    val ranked = parted
      .join(broadcast(offDf), Seq("_grk_pid"))
      .withColumn(outCol, row_number().over(within).cast("long") + col("_grk_off"))
      .drop("_grk_pid", "_grk_off")
    (ranked, total)
  }
}
