package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document winnowing kernel (Schleimer, Wilkerson & Aiken 2003):
  * MD5 every character k-gram, take the minimum of each window of `w`
  * consecutive gram hashes with a monotonic deque (O(L), not O(L·w)),
  * return the SORTED DISTINCT minima.
  *
  * Winnowing is per-document local, so expressing it as one projection
  * expression removes every corpus-sized exchange the explode → Window
  * → distinct formulation needs (shuffle grams by doc, two interpreted
  * WindowExec passes, a distinct shuffle) — at 100 TB the fingerprint
  * scan becomes embarrassingly parallel map work. The 60-bit hash is
  * bit-identical to `conv(substring(md5(g), 1, 15), 16, 10)` (the
  * DuckDB-oracle form): the first 15 hex characters of an MD5 are the
  * top 60 bits of its first 8 big-endian bytes.
  */
object WinnowKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = text.numChars()
    val g = n - k + 1
    if (g < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](g)
    val digest = md.get()
    val out = new Array[Byte](16)
    @inline def pack(d: Array[Byte]): Long =
      (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
    val bytes = text.getBytes
    var i = 0
    if (bytes.length == n) {
      // ASCII fast path: gram i is bytes [i, i+k) — hash in place with a
      // reused output buffer. substringSQL would re-walk the string from
      // the start per gram (O(L²) per doc) and allocate per call.
      while (i < g) {
        digest.update(bytes, i, k)
        digest.digest(out, 0, 16)
        hs(i) = pack(out)
        i += 1
      }
    } else {
      // Multi-byte codepoints: defer to the codepoint-exact substring.
      while (i < g) {
        digest.reset()
        hs(i) = pack(digest.digest(text.substringSQL(i + 1, k).getBytes))
        i += 1
      }
    }
    val m = g - w + 1
    val mins = new Array[Long](m)
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0
    i = 0
    while (i < g) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
      i += 1
    }
    java.util.Arrays.sort(mins)
    var cnt = 0
    var j = 0
    while (j < m) {
      if (j == 0 || mins(j) != mins(j - 1)) { mins(cnt) = mins(j); cnt += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOfRange(mins, 0, cnt))
  }
}

/** `winnow_fps(text)` → sorted distinct window-min 60-bit MD5 hashes.
  * Stays inside whole-stage codegen (the generated code is one static
  * kernel call), unlike the HOF/WindowExec formulations which fall back
  * to interpreted evaluation per element.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "k and w must be >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(t: Any): Any =
    WinnowKernel.fingerprints(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowKernel.fingerprints($t, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowExpressions {
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(text), k, w))
}
