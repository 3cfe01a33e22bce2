package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries sketch buffer: item → (under-counted) counter, ≤ m live. */
case class MGBuf(var counts: Map[String, Long])

/** Misra–Gries frequent-items sketch (Misra & Gries '82) as a typed
  * Aggregator, the bounded-state scale path for heavy-hitters over an
  * unbounded vocabulary: per-partition state never exceeds `m` counters no
  * matter how many distinct items stream through, and partial buffers merge
  * associatively (Agarwal et al., "Mergeable Summaries", PODS '12: sum the
  * counter tables, then subtract the (m+1)-th largest value and drop ≤ 0),
  * so it plans as ObjectHashAggregate with a map-side partial phase.
  *
  * Guarantees (for n rows total): every estimate under-counts by at most
  * n/(m+1), and any item with true frequency > n/(m+1) is present in the
  * final table. Estimates for SUB-threshold survivors depend on the
  * partition/merge order — callers needing deterministic output recount the
  * surviving candidates exactly (see `HeavyHitters.frequentItems`).
  */
class MisraGries(m: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(m > 0 && m <= (1 << 20), s"sketch capacity out of range: $m")

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, item: String): MGBuf = {
    val c = b.counts
    c.get(item) match {
      case Some(v) => b.counts = c.updated(item, v + 1L)
      case None if c.size < m => b.counts = c.updated(item, 1L)
      case None =>
        // table full: decrement every counter (amortized O(1) per row —
        // each decrement pays back one earlier increment), drop zeros
        b.counts = c.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
    }
    b
  }

  override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
    val summed = b2.counts.foldLeft(b1.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    b1.counts =
      if (summed.size <= m) summed
      else {
        val d = summed.valuesIterator.toArray.sortBy(-_).apply(m) // (m+1)-th largest
        summed.flatMap { case (k, v) => if (v > d) Some(k -> (v - d)) else None }
      }
    b1
  }

  override def finish(b: MGBuf): Map[String, Long] = b.counts

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {

  /** EXACT φ-frequent items by sketch → prune → recount: one pass builds the
    * Misra–Gries candidate table (and the exact row count) in a single scan,
    * then a second scan recounts ONLY the ≤ m surviving candidates and keeps
    * those with exact count ≥ ⌈φn⌉.
    *
    * Why this instead of a plain groupBy-having: the naive form shuffles the
    * ENTIRE vocabulary (at 100 TB, billions of distinct keys) to compute
    * counts it then throws away. Here the shuffle never carries more than
    * m ≈ 2/φ candidate keys per map partition, and the recount's filter
    * prunes the scan to candidate rows before its (tiny) aggregation.
    *
    * Correct by the MG guarantee: with m ≥ 2/φ, any item with true count
    * ≥ φn > n/(m+1) survives the sketch, so the recount misses no frequent
    * item; the exact filter then removes order-dependent sub-threshold
    * survivors — output is DETERMINISTIC even though sketch contents aren't.
    */
  def frequentItems(items: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi out of (0,1): $phi")
    val m = math.max(15, math.ceil(2.0 / phi).toInt)
    val sketch = udaf(new MisraGries(m), Encoders.STRING)
    val nonNull = items.filter(col(itemCol).isNotNull)
    val row = nonNull
      .agg(sketch(col(itemCol)).as("sk"), count(lit(1)).as("n"))
      .head()
    val cands = row.getMap[String, Long](0).keys.toSeq
    val thresh = math.ceil(phi * row.getLong(1)).toLong
    nonNull
      .filter(col(itemCol).isin(cands: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
  }
}
