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

  /** Jaccard over pre-sorted DISTINCT array<long> with an early-exit
    * threshold: exact J when J ≥ minJ, −1.0 as soon as the unscanned
    * remainder provably cannot reach minJ. Callers MUST pass deduplicated
    * arrays (array_distinct before sort) — the bound counts raw lengths.
    */
  def jaccardSortedMin(a: Column, b: Column, minJ: Double): Column =
    toColumn(JaccardSortedMinExpr(toExpr(a), toExpr(b), minJ))

  /** Exact |A∩B| over pre-sorted DISTINCT array<long> with an early-exit
    * CONTAINMENT threshold: the intersection size when it reaches
    * minFrac·min(|A|,|B|) (i.e. max-directional containment ≥ minFrac),
    * −1 as soon as the unscanned remainder provably cannot. Same
    * deduplicated-input contract as [[jaccardSortedMin]].
    */
  def intersectSortedMin(a: Column, b: Column, minFrac: Double): Column =
    toColumn(IntersectSortedMinExpr(toExpr(a), toExpr(b), minFrac))

  /** Sign-pattern LSH bucket of a vector under `nPlanes` fixed pseudo-random
    * hyperplanes for table `table`.
    */
  def lshBucket(vec: Column, table: Int, nPlanes: Int): Column =
    toColumn(LshBucketExpr(toExpr(vec), table, nPlanes))
}

/** Random-hyperplane (SimHash-family) LSH bucket id: the sign pattern of
  * `vec` projected onto `nPlanes` fixed hyperplanes for LSH table `table`,
  * packed into an int (P[bit match] = 1 − angle/π per plane).
  *
  * This replaces a composed Column formula of nPlanes × dim `element_at` ×
  * multiply terms: that tree has thousands of Catalyst nodes once a
  * multi-table signature set is built, and planning + codegen over it
  * dominated the near-dup queries (130 s planning for a 70k-pair join at
  * sf0.1). Here the whole projection is one expression node with a tight
  * primitive loop and a lazily built plane matrix.
  *
  * Hyperplane components are derived deterministically from splitmix64 of
  * (table, plane, dim-index) mapped to [-1, 1) — no driver randomness, the
  * signature replays identically at any scale and on any executor.
  */
case class LshBucketExpr(child: Expression, table: Int, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  // bucket ids pack into a non-negative Int bit per plane; > 30 planes
  // would wrap `1 << p` silently, 0 would index an empty plane matrix
  require(nPlanes > 0 && nPlanes <= 30, s"nPlanes out of range [1, 30]: $nPlanes")
  require(table >= 0, s"table must be >= 0: $table")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  private def elemType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => null
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType == FloatType || elemType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket requires array<float|double>, got ${child.dataType.catalogString}")

  @transient private lazy val isFloat = elemType == FloatType

  // planes(p)(d), built on first eval once the vector dimension is known
  @transient private var planes: Array[Array[Double]] = _

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def ensurePlanes(dim: Int): Unit =
    if (planes == null || planes(0).length != dim) {
      planes = Array.tabulate(nPlanes, dim) { (p, d) =>
        val h = splitmix64(table.toLong * 0x100000001b3L + p.toLong * 8191L + d.toLong)
        h.toDouble / Long.MaxValue.toDouble // [-1, 1)
      }
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    ensurePlanes(n)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) return null
        proj += (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)) * plane(d)
        d += 1
      }
      if (proj >= 0) bucket |= (1 << p)
      p += 1
    }
    java.lang.Integer.valueOf(bucket)
  }

  override def prettyName: String = "lsh_bucket"
  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
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

/** Threshold-verifying Jaccard over pre-sorted DISTINCT array<long>: the
  * similarity-join verify kernel. Returns the exact Jaccard when J ≥ minJ
  * and −1.0 once the merge can prove J < minJ — the bound
  *   J ≤ (inter + min(remA, remB)) / (|A| + |B| − inter − min(remA, remB))
  * rearranges to the INTEGER test inter + min(remA, remB) < K with
  * K = ⌈minJ·(|A|+|B|)/(1+minJ)⌉ computed once per pair, so the hot loop
  * pays one long compare per non-matching step and exits ~(1−minJ)/(1+minJ)
  * of the way through dissimilar pairs (at minJ = 0.5: after ~⅓ of the
  * merge). Inputs must be SETS (array_distinct'd): the bound counts raw
  * lengths, and duplicates would both break it and skew the union count —
  * this kernel drops the duplicate-tolerant bookkeeping the unthresholded
  * expression carries, in exchange for the exit test.
  */
case class JaccardSortedMinExpr(left: Expression, right: Expression, minJ: Double)
    extends BinaryExpression
    with CodegenFallback {

  require(minJ > 0.0 && minJ <= 1.0, s"minJ must be in (0, 1]: $minJ")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted_min requires array<bigint>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 && m == 0) return java.lang.Double.valueOf(-1.0) // J defined 0 < minJ
    // J ≥ minJ ⟺ (1+minJ)·inter ≥ minJ·(n+m) — K is that bound on the
    // optimistic inter (current + all remaining could still match).
    // −1 safety margin (same as IntersectSortedMinExpr): a half-ulp of FP
    // error in K must never early-exit a pair whose true J is exactly minJ
    // — the final exact jac >= minJ compare still gates what survives
    val k = math.max(1L, math.ceil(minJ * (n + m) / (1.0 + minJ)).toLong - 1L)
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else {
        if (xi < yj) i += 1 else j += 1
        val rem = math.min(n - i, m - j).toLong
        if (inter + rem < k) return java.lang.Double.valueOf(-1.0)
      }
    }
    val union = (n + m).toLong - inter
    val jac = if (union == 0L) 0.0 else inter.toDouble / union.toDouble
    java.lang.Double.valueOf(if (jac >= minJ) jac else -1.0)
  }

  override def prettyName: String = "jaccard_sorted_min"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedMinExpr =
    copy(left = l, right = r)
}

/** Containment-verifying set intersection over pre-sorted DISTINCT
  * array<long>: exact |A∩B| (long) when it reaches minFrac·min(|A|,|B|) —
  * max-directional containment max(I/|A|, I/|B|) = I/min(|A|,|B|) ≥ minFrac
  * — and −1 once inter + min(remA, remB) < K = ⌈minFrac·min(|A|,|B|)⌉.
  * Same early-exit structure and deduplicated-input contract as
  * [[JaccardSortedMinExpr]], with the containment bound instead of the
  * Jaccard one (symmetric length ratios prune NOTHING for containment — a
  * tiny doc fully inside a huge one is exactly the pair it must keep).
  */
case class IntersectSortedMinExpr(left: Expression, right: Expression, minFrac: Double)
    extends BinaryExpression
    with CodegenFallback {

  require(minFrac > 0.0 && minFrac <= 1.0, s"minFrac must be in (0, 1]: $minFrac")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"intersect_sorted_min requires array<bigint>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return java.lang.Long.valueOf(-1L) // containment undefined/0
    // −1 safety margin: borderline intersections survive to the caller's
    // exact double-compare filter, so a half-ulp in K can never drop a
    // true-positive pair; costs one extra merge step of pruning power
    val k = math.max(1L, math.ceil(minFrac * math.min(n, m)).toLong - 1L)
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { inter += 1; i += 1; j += 1 }
      else {
        if (xi < yj) i += 1 else j += 1
        val rem = math.min(n - i, m - j).toLong
        if (inter + rem < k) return java.lang.Long.valueOf(-1L)
      }
    }
    java.lang.Long.valueOf(if (inter >= k) inter else -1L)
  }

  override def prettyName: String = "intersect_sorted_min"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSortedMinExpr =
    copy(left = l, right = r)
}
