package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float/double array columns.
  *
  * The composed higher-order-function form (`zip_with` + `aggregate`) is
  * interpreted and allocates a boxed pair array per element — it dominated
  * the brute-force kNN queries (2M pairs × 64 dims). This expression is one
  * fused primitive loop per row: dot product and both norms in a single
  * pass, no allocation.
  *
  * Returns null when either vector is null, lengths differ, or a norm is
  * zero (matching VectorFunctions.cosine's null-not-NaN contract).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case _ => null
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) == FloatType || elemType(e) == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires array<float|double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityExpr =
    copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toColumn, expression => toExpr}

  def cosineSimilarity(a: Column, b: Column): Column =
    toColumn(CosineSimilarityExpr(toExpr(a), toExpr(b)))

  /** Jaccard over pre-sorted array<long> (set semantics). */
  def jaccardSorted(a: Column, b: Column): Column =
    toColumn(JaccardSortedLongExpr(toExpr(a), toExpr(b)))
}

/** Exact Jaccard similarity of two SORTED array<long> columns (set
  * semantics: duplicates collapse). Two-pointer merge — O(n+m) primitive
  * comparisons per pair, no allocation — replacing interpreted
  * `array_intersect`/`array_union` over shingle-string arrays in the
  * near-dup verification join (measured 10× on the sf0.1 candidate set).
  * Inputs MUST be sorted ascending (e.g. `sort_array(transform(shingles,
  * xxhash64))`); unsorted input yields undefined results.
  */
case class JaccardSortedLongExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted requires array<bigint>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    var union = 0L
    var last = 0L
    var hasLast = false
    def bump(v: Long, isInter: Boolean): Unit = {
      if (!hasLast || v != last) {
        union += 1
        if (isInter) inter += 1
        last = v
        hasLast = true
      } else if (isInter && union > 0) {
        // duplicate of last union element: if this duplicate represents the
        // intersection case it was already counted; nothing to do
      }
    }
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { bump(xi, isInter = true); i += 1; j += 1 }
      else if (xi < yj) { bump(xi, isInter = false); i += 1 }
      else { bump(yj, isInter = false); j += 1 }
    }
    while (i < n) { bump(x.getLong(i), isInter = false); i += 1 }
    while (j < m) { bump(y.getLong(j), isInter = false); j += 1 }
    if (union == 0L) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  override def prettyName: String = "jaccard_sorted"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedLongExpr =
    copy(left = l, right = r)
}
