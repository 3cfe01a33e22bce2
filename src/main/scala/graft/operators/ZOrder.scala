package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout lever
  * for 100-TB scans filtered on MORE than one column (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`): interleave the bits of the
  * dimension keys so rows close in EVERY dimension land close in the
  * 1-D sort order, then range-partition on the z-value. Each written file
  * then covers a small bounding BOX of the key space instead of a thin
  * slab, so min/max file statistics prune scans for predicates on ANY
  * prefix-free combination of the dimensions — a linear sort only ever
  * prunes its leading column.
  *
  * Everything here is pure integer bit arithmetic (codegen'd `Column`
  * expressions, no UDF) plus one range exchange — the identical shuffle
  * cost of a plain sort-by-one-column write.
  */
object ZOrder {

  /** Morton z-value of pre-bucketed dimension keys: interleaves the low
    * `bits` bits of each column (col i contributes bit b to output
    * position b·n + i). Inputs MUST already lie in [0, 2^bits) — bucket
    * with `pmod`/width-scaling first; enforced per row (raise_error, not
    * silent truncation, which would corrupt locality).
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits >= 1 && dims.size * bits <= 62,
      s"dims*bits must fit a long: ${dims.size} x $bits")
    val lim = 1L << bits
    val checked = dims.map { d =>
      val dl = d.cast("long")
      // NULL propagates to a NULL z (the row groups under a NULL slice,
      // matching plain SQL) — only a genuinely out-of-range VALUE raises
      when(dl.isNull, lit(null).cast("long"))
        .when(dl >= 0 && dl < lim, dl)
        .otherwise(raise_error(format_string(
          s"zValue: dimension out of [0, $lim): %s", dl)).cast("long"))
    }
    val terms = for {
      b <- 0 until bits
      (d, i) <- checked.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * dims.size + i)
    terms.reduce(_ + _)
  }

  /** Range-partition + sort `df` by the z-value of `dims` — the layout
    * pass before a columnar write. Adds the z-value as `zCol` (callers
    * usually drop it after the write; kept for stats/debug).
    */
  def zOrderBy(
      df: DataFrame,
      dims: Seq[Column],
      bits: Int,
      zCol: String = "_z",
      partitions: Int = 0): DataFrame = {
    // withColumn would silently REPLACE an existing column of that name —
    // the caller's data would vanish from the layout (and from a
    // writeClustered output, which drops zCol after the sort)
    require(!df.columns.contains(zCol),
      s"zOrderBy: input already has a column named '$zCol' — pass a different zCol")
    val withZ = df.withColumn(zCol, zValue(dims, bits))
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(p, col(zCol)).sortWithinPartitions(col(zCol))
  }

  /** The write path: persist `df` as parquet PHYSICALLY clustered on the
    * z-order of `dims` — range-partition on the z-value into `files` output
    * files, sort within each, drop the helper column, write. Because every
    * file then covers a tight bounding BOX of the dimension space, the
    * parquet footer min/max statistics let a reader skip whole files /
    * row groups for predicates on ANY of the dimensions (a linear-sorted
    * write only ever prunes its leading column) — asserted end-to-end, with
    * scan metrics, in ZOrderSpec.
    *
    * This is the OPTIMIZE ZORDER BY analog: same shuffle cost as a plain
    * sorted write (one range exchange), pruning on every dimension at read.
    */
  def writeClustered(
      df: DataFrame,
      dims: Seq[Column],
      bits: Int,
      path: String,
      files: Int): Unit = {
    // zOrderBy treats partitions <= 0 as "use the session default" — a
    // reasonable layout-pass fallback, but silent surprise as a FILE COUNT
    require(files > 0, s"writeClustered: files must be positive: $files")
    zOrderBy(df, dims, bits, partitions = files)
      .drop("_z") // projection — keeps the range partitioning + sort order
      .write.mode("overwrite").parquet(path)
  }

  /** Layout-quality report: cut the z-range into `buckets` equal slices
    * (the file-boundary proxy) and measure each slice's bounding box over
    * the dimensions. Tight boxes ⇒ min/max stats prune; a linear sort
    * yields full-width boxes on every non-leading dimension. Pure
    * arithmetic on the z-value — no partitioner involved, so the report is
    * engine-reproducible.
    */
  def layoutStats(
      df: DataFrame,
      dims: Seq[(String, Column)],
      bits: Int,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && java.lang.Long.bitCount(buckets.toLong) == 1,
      s"buckets must be a power of two (slice id is an exact bit shift): $buckets")
    val sliceBits = dims.size * bits - java.lang.Long.numberOfTrailingZeros(buckets.toLong)
    require(sliceBits >= 0, s"buckets=$buckets exceeds the z-range 2^${dims.size * bits}")
    val z = zValue(dims.map(_._2), bits)
    val aggs = dims.flatMap { case (name, c) =>
      Seq(min(c).as(s"min_$name"), max(c).as(s"max_$name"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(shiftright(z, sliceBits).as("z_slice"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
