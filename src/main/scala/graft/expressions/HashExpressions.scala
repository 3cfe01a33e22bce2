package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the dedup signature suite.
  *
  * Rationale (SURVEY.md §7.4): MinHash/SimHash over a shingle array are the
  * hot path of near-dup detection at corpus scale. Composed higher-order
  * functions (`aggregate`/`zip_with`/`transform`) are interpreted and
  * allocate a boxed array per element per pass — measured 10-30s for 5k docs.
  * These expressions do one tight primitive loop per row: each shingle is
  * string-hashed once (XXH64, the same kernel behind `xxhash64`), the k
  * seeded family members derive from the base long.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k > 0 && k <= 1024, s"minhash signature length out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string> or array<bigint>, got ${other.catalogString}")
    }

  // array<long> input = pre-hashed elements (e.g. xxhash64 of shingles):
  // skips the string-hash pass so pipelines that also need the raw hashes
  // hash each shingle exactly once.
  @transient private lazy val elementsAreLongs =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base =
          if (elementsAreLongs) XXH64.hashLong(arr.getLong(i), 42L)
          else {
            val s = arr.getUTF8String(i)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** 64-bit SimHash: per-bit majority vote over XXH64 hashes of the elements.
  * Bit b of the result is set iff at least half of the elements have bit b
  * set in their hash.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        total += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 >= total) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Winnowing fingerprints (Schleimer et al., SIGMOD'03) over a pre-hashed
  * shingle sequence: the distinct minima of every sliding window of `w`
  * hashes, returned sorted ascending (set semantics — the selection POSITIONS
  * don't matter for document similarity, only the value set).
  *
  * Native rolling-minimum via a monotonic index deque: O(n) with zero
  * per-window allocation. The composed HOF form
  * (`transform(sequence(...), i => array_min(slice(hashes, i, w)))`) is
  * interpreted, O(n·w), and allocates a w-element array per window — it alone
  * made q15 the slowest declared query (56 s of 180 s at sf0.1).
  *
  * Empty input → empty array; n ≤ w → the single global minimum.
  */
case class WinnowingFingerprintsExpr(child: Expression, w: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(w > 0 && w <= 4096, s"winnowing window out of range: $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowing_fingerprints requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) Long.MaxValue else arr.getLong(i)
      i += 1
    }
    if (n <= w) {
      var mn = Long.MaxValue
      i = 0
      while (i < n) { if (vals(i) < mn) mn = vals(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val nWin = n - w + 1
    val mins = new Array[Long](nWin)
    // monotonic deque of indices, values strictly increasing front→back
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // window of valid entries: [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && vals(dq(tail - 1)) >= vals(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = vals(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  override def prettyName: String = "winnowing_fingerprints"
  override protected def withNewChildInternal(newChild: Expression): WinnowingFingerprintsExpr =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toColumn, expression => toExpr}

  /** MinHash signature Column over an array<string> column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    toColumn(MinHashSignatureExpr(toExpr(shingles), k))

  /** SimHash64 Column over an array<string> column. */
  def simhash64(elems: Column): Column =
    toColumn(SimHash64Expr(toExpr(elems)))

  /** Winnowing fingerprints Column over an array<bigint> hash column. */
  def winnowingFingerprints(hashes: Column, w: Int): Column =
    toColumn(WinnowingFingerprintsExpr(toExpr(hashes), w))
}
