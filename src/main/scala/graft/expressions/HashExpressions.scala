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

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toColumn, expression => toExpr}

  /** MinHash signature Column over an array<string> column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    toColumn(MinHashSignatureExpr(toExpr(shingles), k))

  /** SimHash64 Column over an array<string> column. */
  def simhash64(elems: Column): Column =
    toColumn(SimHash64Expr(toExpr(elems)))
}
