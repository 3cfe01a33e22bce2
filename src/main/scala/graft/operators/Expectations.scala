package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the contract-check
  * pass every large-scale ingest pipeline runs before training data is
  * accepted (generalizes the reference's ad-hoc preamble audits:
  * isnull().sum(), value-range eyeballing, dtype checks — e.g.
  * 新冠疫情分析.py:36, 蔬菜价格相关性分析.py:29-55 — into one declared suite).
  *
  * All non-uniqueness constraints compile into a SINGLE aggregate pass over
  * the table (one scan, map-side partial sums, one tiny exchange); each
  * `Unique` constraint adds one count-distinct on its column (Spark plans
  * multiple count-distincts via Expand — still one scan of the input).
  * Output is one row per constraint: (constraint, column, violations,
  * n_rows, passed) — driver-sized regardless of input scale.
  */
object Expectations {

  sealed trait Constraint {
    def name: String
    def column: String
  }

  /** Null values violate. */
  case class NotNull(column: String) extends Constraint { val name = "not_null" }

  /** Duplicated values violate: non-null duplicates plus any null beyond the
    * first (SQL-DISTINCT view of null as one group).
    */
  case class Unique(column: String) extends Constraint { val name = "unique" }

  /** Non-null values outside [lo, hi] violate (null handled by NotNull). */
  case class InRange(column: String, lo: Double, hi: Double) extends Constraint {
    val name = "in_range"
  }

  /** Non-null values not in `values` violate. */
  case class InSet(column: String, values: Seq[String]) extends Constraint {
    val name = "in_set"
  }

  /** Non-null values not fully matching `regex` violate. */
  case class Matches(column: String, regex: String) extends Constraint {
    val name = "matches"
  }

  private def violationExpr(c: Constraint): Column = c match {
    case NotNull(col0)         => col(col0).isNull
    case InRange(col0, lo, hi) => col(col0).isNotNull && !col(col0).between(lo, hi)
    case InSet(col0, vs)       => col(col0).isNotNull && !col(col0).isin(vs: _*)
    case Matches(col0, re)     => col(col0).isNotNull && !col(col0).rlike("^(?:" + re + ")$")
    case Unique(_) => throw new IllegalArgumentException("unique handled separately")
  }

  /** Evaluate `constraints` against `df` in one scan. Result columns:
    * constraint (name), column, violations, n_rows, passed — one row per
    * constraint in declaration order (explicit ordinal, stable report).
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints declared")
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++
      constraints.zipWithIndex.map {
        case (Unique(c), i) => count_distinct(col(c)).as(s"_c$i")
        // coalesce: sum over ZERO rows is null, and an empty ingest batch
        // must report 0 violations / passed=true, not null/null
        case (c, i) =>
          coalesce(sum(when(violationExpr(c), 1L).otherwise(0L)), lit(0L)).as(s"_c$i")
      } ++
      // Unique is null-blind in count_distinct; carry per-column null counts
      // through the same pass so its violation formula can see them
      constraints.zipWithIndex.collect { case (Unique(c), i) =>
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"_nn$i")
      }
    val summary = df.agg(aggs.head, aggs.tail: _*)
    val rows = constraints.zipWithIndex.map { case (c, i) =>
      val viol = c match {
        case Unique(_) =>
          (col("_n") - col(s"_nn$i") - col(s"_c$i")) +
            greatest(col(s"_nn$i") - 1L, lit(0L))
        case _ => col(s"_c$i")
      }
      struct(
        lit(i).as("ord"),
        lit(c.name).as("constraint"),
        lit(c.column).as("column"),
        viol.as("violations"))
    }
    summary
      .select(col("_n"), explode(array(rows: _*)).as("r"))
      .select(
        col("r.ord").as("ord"),
        col("r.constraint").as("constraint"),
        col("r.column").as("column"),
        col("r.violations").as("violations"),
        col("_n").as("n_rows"),
        (col("r.violations") === 0L).as("passed"))
      .orderBy(col("ord"))
  }
}
