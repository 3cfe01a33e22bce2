package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join.
  *
  * Spark has no range-join operator: a bare `p >= s && p < e` join condition
  * has no equi-key, so Catalyst plans BroadcastNestedLoopJoin — O(n·m) pair
  * evaluations and a broadcast requirement on one whole side. The standard
  * scale shape is BINNING: quantize the domain into fixed-width bins, emit
  * each interval under every bin it overlaps, emit each point under its own
  * bin, equi-join on the bin id, and keep the exact containment filter as a
  * post-join predicate. The join shuffles on a dense integer key; interval
  * replication is ceil(span/binWidth)+1 — bounded by construction when
  * `binWidth` is chosen near the typical interval span.
  */
object RangeJoin {

  /** Join `points` to every `intervals` row with
    * `start <= point < end`, all three columns long-valued (epoch days,
    * epoch seconds, any quantized domain). Output: all columns of both
    * inputs (names must not collide).
    *
    * `binWidth` tunes replication vs selectivity: intervals of span `w`
    * replicate to ~`w/binWidth + 1` bins; points never replicate.
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    // [start, end) overlaps bins bin(start)..bin(end-1); empty intervals
    // (end <= start) produce a descending sequence guard -> no bins
    val binned = intervals
      .withColumn(
        "_bin",
        explode(
          when(col(endCol) <= col(startCol), array().cast("array<long>"))
            .otherwise(sequence(bin(col(startCol)), bin(col(endCol) - 1)))))
    points
      .withColumn("_bin", bin(col(ptCol)))
      .join(binned, "_bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bin")
  }
}
