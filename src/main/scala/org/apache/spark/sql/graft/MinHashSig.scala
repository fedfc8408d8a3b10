package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document MinHash signature kernel (Broder 1997): tokenize, build
  * word n-gram shingles, MD5 each shingle ONCE to a 60-bit value, and
  * keep the minimum of each universal-hash permutation
  * `(aᵢ·x₁ + bᵢ·x₂ + cᵢ) mod (2⁶¹−1)` (x₁/x₂ the 30-bit halves).
  *
  * Bit-identical to the aggregation formulation in
  * `graft.text.Dedup.minhashLshPairs` (split `\s+` drop-empties
  * tokenization, space-joined shingles, `conv(substring(md5,1,15),16,10)`
  * hash, the same permutation family) — the DuckDB oracles are
  * unchanged. Signature building is per-document LOCAL, so this removes
  * the explode + corpus-wide groupBy(id) shuffle from the minhash tier:
  * at 100 TB the signature scan is embarrassingly parallel map work and
  * only the (band, band_sig) bucket join shuffles.
  */
object MinHashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // Java-regex \s — the exact class `split(text, "\\s+")` uses.
  @inline private def isWs(ch: Char): Boolean =
    ch == ' ' || (ch >= '\t' && ch <= '\r')

  def sig(text: UTF8String, n: Int,
      a: Array[Long], b: Array[Long], c: Array[Long]): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val g = toks.size - n + 1
    if (g <= 0) return null
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val digest = md.get()
    val out = new Array[Byte](16)
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p < g) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(p + j))
        j += 1
      }
      digest.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      digest.digest(out, 0, 16)
      val h = (((out(0) & 0xffL) << 56) | ((out(1) & 0xffL) << 48) |
        ((out(2) & 0xffL) << 40) | ((out(3) & 0xffL) << 32) |
        ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
        ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)) >>> 4
      val x1 = h & ((1L << 30) - 1)
      val x2 = h >>> 30
      var t = 0
      while (t < k) {
        val v = (a(t) * x1 + b(t) * x2 + c(t)) % ((1L << 61) - 1)
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      p += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_minhash_sig(text)` → array of `k` permutation minima; null when
  * the document has fewer than `n` tokens (callers filter, matching the
  * groupBy formulation which emits no row). Codegen is one static kernel
  * call, so the projection stays inside whole-stage codegen.
  */
case class MinHashSig(child: Expression, n: Int,
    coeffA: Seq[Long], coeffB: Seq[Long], coeffC: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && coeffA.nonEmpty &&
    coeffA.size == coeffB.size && coeffB.size == coeffC.size)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val aArr = coeffA.toArray
  @transient private lazy val bArr = coeffB.toArray
  @transient private lazy val cArr = coeffC.toArray

  override def nullSafeEval(t: Any): Any =
    MinHashKernel.sig(t.asInstanceOf[UTF8String], n, aArr, bArr, cArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigExpr", this, classOf[MinHashSig].getName)
    val code = nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $ref.kernelCall($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
    code
  }

  /** Bridge for generated code (arrays pre-resolved once per task). */
  def kernelCall(t: UTF8String): ArrayData =
    MinHashKernel.sig(t, n, aArr, bArr, cArr)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashExpressions {
  def minhashSig(text: Column, n: Int,
      coeffs: Array[(Long, Long, Long)]): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(text), n,
      coeffs.map(_._1).toSeq, coeffs.map(_._2).toSeq, coeffs.map(_._3).toSeq))
}
