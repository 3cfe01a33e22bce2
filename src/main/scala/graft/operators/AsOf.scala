package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking point-in-time) join — the one nontrivial join the
  * reference's time-series work implies and Spark lacks natively.
  *
  * Implemented by COMPOSITION (preference order (a) of the custom-operator
  * rules, SURVEY.md §7.1): tag and union both sides, sort within each key
  * partition by (time, tag), and carry the last right-side payload forward
  * with `last(ignoreNulls)` over an unbounded-preceding frame. One shuffle
  * on the key — the same cost as a regular sort-merge join, no custom
  * physical operator needed.
  */
object AsOf {

  /** For every left row, attach the most recent right row with
    * `rightTime <= leftTime` within the same `on` key group (backward
    * as-of). Right columns (minus key/time) come back nullable; rows with no
    * prior right match keep nulls. `toleranceSeconds`: matches older than
    * this are discarded.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceSeconds: Option[Double] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(c => on.contains(c)).filterNot(_ == rightTime).toSeq

    val taggedRight = right
      .withColumn("_t", col(rightTime).cast("double"))
      .withColumn("_tag", lit(0))
      .withColumn("_payload", struct((payloadCols.map(col) :+ col(rightTime).as("_rt")).toIndexedSeq: _*))
      .select((on.map(col) :+ col("_t") :+ col("_tag") :+ col("_payload")).toIndexedSeq: _*)

    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("_t", col(leftTime).cast("double"))
      .withColumn("_tag", lit(1))
      .withColumn("_left", struct(leftCols.map(col).toIndexedSeq: _*))
      .select((on.map(col) :+ col("_t") :+ col("_tag") :+ lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload") :+ col("_left")).toIndexedSeq: _*)

    val unioned = taggedRight.withColumn("_left", lit(null).cast(taggedLeft.schema("_left").dataType))
      .unionByName(taggedLeft)

    // right rows sort before left rows at equal time (tag 0 < 1) ⇒ a quote
    // AT the event time matches (<= semantics)
    val w = Window.partitionBy(on.map(col).toIndexedSeq: _*)
      .orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val withTolerance = toleranceSeconds.fold(carried) { tol =>
      carried.withColumn(
        "_match",
        when(col("_t") - col("_match._rt").cast("double") <= tol, col("_match")))
    }

    val out = withTolerance.select(
      (leftCols.map(c => col(s"_left.`$c`").as(c)) ++
        payloadCols.map(c => col(s"_match.`$c`").as(c))).toIndexedSeq: _*)
    out
  }

  /** Nearest as-of: for every left row, attach the right row minimizing
    * |rightTime − leftTime| within the key group (polars
    * `join_asof(strategy="nearest")`). ONE union + ONE window pass carries
    * both candidates: the backward match is INCLUSIVE (right at the exact
    * left time sorts before the left row → distance 0) and the forward
    * match is STRICT (the `rowsBetween(1, ∞)` frame starts after the
    * current row, and equal-time rights sit behind it) — so exact-time hits
    * and |gap| ties both resolve to the backward candidate, a stated
    * contract the oracle mirrors. Adds `asof_gap_s`: signed seconds,
    * positive = matched a past right row, negative = a future one.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => on.contains(c)).filterNot(_ == rightTime).toSeq

    val taggedRight = right
      .withColumn("_t", col(rightTime).cast("double"))
      .withColumn("_tag", lit(0))
      .withColumn("_payload", struct((payloadCols.map(col) :+ col(rightTime).as("_rt")).toIndexedSeq: _*))
      .select((on.map(col) :+ col("_t") :+ col("_tag") :+ col("_payload")).toIndexedSeq: _*)

    val leftCols = left.columns.toSeq
    val taggedLeft = left
      .withColumn("_t", col(leftTime).cast("double"))
      .withColumn("_tag", lit(1))
      .withColumn("_left", struct(leftCols.map(col).toIndexedSeq: _*))
      .select((on.map(col) :+ col("_t") :+ col("_tag") :+ lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload") :+ col("_left")).toIndexedSeq: _*)

    val unioned = taggedRight.withColumn("_left", lit(null).cast(taggedLeft.schema("_left").dataType))
      .unionByName(taggedLeft)

    val ord = Window.partitionBy(on.map(col).toIndexedSeq: _*).orderBy(col("_t"), col("_tag"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = ord.rowsBetween(1, Window.unboundedFollowing)
    val picked = unioned
      .withColumn("_back", last(col("_payload"), ignoreNulls = true).over(wBack))
      .withColumn("_fwd", first(col("_payload"), ignoreNulls = true).over(wFwd))
      .filter(col("_tag") === 1)
      .withColumn("_bgap", col("_t") - col("_back._rt").cast("double"))
      .withColumn("_fgap", col("_fwd._rt").cast("double") - col("_t"))
      .withColumn(
        "_match",
        when(col("_back").isNull, col("_fwd"))
          .when(col("_fwd").isNull, col("_back"))
          .when(col("_bgap") <= col("_fgap"), col("_back"))
          .otherwise(col("_fwd")))
      .withColumn(
        "_gap",
        when(col("_match").isNull, lit(null).cast("double"))
          .otherwise(col("_t") - col("_match._rt").cast("double")))
    picked.select(
      (leftCols.map(c => col(s"_left.`$c`").as(c)) ++
        payloadCols.map(c => col(s"_match.`$c`").as(c)) :+
        col("_gap").as("asof_gap_s")).toIndexedSeq: _*)
  }
}
