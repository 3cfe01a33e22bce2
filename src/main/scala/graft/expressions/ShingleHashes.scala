package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{lower, regexp_replace, trim}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Fused char-shingle hashing: one tight pass from a NORMALIZED text string
  * to the sorted (optionally distinct) array of per-shingle 64-bit hashes —
  * the value-identical replacement for the engine's hottest projection
  * idiom,
  *
  *   sort_array(array_distinct(transform(
  *     TextFunctions.charShingles(text, n), h)))
  *
  * whose composed form pays three interpreted higher-order passes and a
  * per-shingle UTF8String allocation (`transform` is a CodegenFallback
  * eval per element; round-14 thread-dump sampling showed
  * `ArrayTransform.eval`/`Substring` as the top remaining executor-CPU
  * frames in the service tier after the shuffle-writer fix).
  *
  * Value equality with the composed idiom, by construction:
  *
  *   - the window over code points [i, i+n) covers EXACTLY the bytes
  *     `substr(i+1, n)` returns (UTF8String.substringSQL slices on the
  *     same code-point boundaries this walk computes);
  *   - `XxHash` hashes those bytes with seed 42 — the same
  *     `XXH64.hashUnsafeBytes` call `xxhash64(string)` performs;
  *   - `Md5Slice` reproduces `conv(substring(md5(s), 1, 13), 16, 10)
  *     .cast("long")` (graft.functions.Kmv.hash): the first 13 hex chars
  *     of the MD5 are the digest's first 52 bits, read big-endian;
  *   - sort-then-dedupe over longs ≡ array_distinct-then-sort_array
  *     (both yield the ascending distinct multiset; with
  *     `distinct = false` the plain sorted multiset ≡ sort_array alone).
  *
  * The normalization half of charShingles (trim → \s+ collapse → lower)
  * stays OUTSIDE as the stock codegen'd expressions — see
  * [[ShingleHashes.hashedCharShingles]] — so this expression re-implements
  * no string semantics beyond the window walk.
  */
case class ShingleHashesExpr(
    child: Expression,
    n: Int,
    distinct: Boolean,
    md5Slice: Boolean)
    extends UnaryExpression
    with CodegenFallback {

  require(n > 0 && n <= 1024, s"shingle width out of range: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    // one pass over the bytes: code-point start offsets (ASCII-only texts
    // take the branchless fast path of numBytesForFirstByte)
    var nChars = 0
    var i = 0
    val offs = new Array[Int](nBytes + 1)
    while (i < nBytes) {
      offs(nChars) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      nChars += 1
    }
    offs(nChars) = nBytes
    if (nChars < n) return new GenericArrayData(Array.emptyLongArray)
    val nOut = nChars - n + 1
    val out = new Array[Long](nOut)
    if (md5Slice) {
      val md = java.security.MessageDigest.getInstance("MD5")
      // widest window in bytes bounds the copy buffer (windows share it)
      var maxLen = 0
      var w = 0
      while (w < nOut) {
        val len = offs(w + n) - offs(w)
        if (len > maxLen) maxLen = len
        w += 1
      }
      val buf = new Array[Byte](maxLen)
      w = 0
      while (w < nOut) {
        val start = offs(w)
        val len = offs(w + n) - start
        Platform.copyMemory(base, off + start, buf, Platform.BYTE_ARRAY_OFFSET, len)
        md.reset()
        md.update(buf, 0, len)
        val d = md.digest()
        // first 13 hex chars = bytes 0..5 plus the high nibble of byte 6,
        // read big-endian — exactly conv(substring(hex, 1, 13), 16, 10)
        var v = 0L
        var b = 0
        while (b < 6) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        out(w) = (v << 4) | ((d(6) & 0xf0L) >>> 4)
        w += 1
      }
    } else {
      var w = 0
      while (w < nOut) {
        val start = offs(w)
        out(w) = XXH64.hashUnsafeBytes(base, off + start, offs(w + n) - start, 42L)
        w += 1
      }
    }
    java.util.Arrays.sort(out)
    if (!distinct) return new GenericArrayData(out)
    var kept = 0
    i = 0
    while (i < nOut) {
      if (i == 0 || out(i) != out(i - 1)) { out(kept) = out(i); kept += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, kept))
  }

  override def prettyName: String = "shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toColumn, expression => toExpr}

  /** Sorted (distinct) shingle-hash array straight from raw text — fuses
    * `TextFunctions.charShingles(text, n)` + per-element hash + distinct +
    * sort into one expression over the SAME normalization chain
    * (trim → whitespace collapse → lower, stock codegen'd expressions).
    * `md5Slice = false` = the xxhash64 convention; `true` = the portable
    * 52-bit md5-slice (graft.functions.Kmv.hash). Null text → null, text
    * shorter than n → empty array — the charShingles contract.
    */
  def hashedCharShingles(
      text: Column, n: Int, distinct: Boolean = true,
      md5Slice: Boolean = false): Column = {
    val norm = lower(regexp_replace(trim(text), "\\s+", " "))
    // null/short-text semantics match the composed idiom without a when()
    // wrapper (which would evaluate the regex chain twice per row): null
    // text → null via UnaryExpression null-intolerance (= transform(null)),
    // text shorter than n → empty array inside the eval (= the
    // charShingles length guard)
    toColumn(ShingleHashesExpr(toExpr(norm), n, distinct, md5Slice))
  }
}
