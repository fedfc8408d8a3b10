package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Per-document SimHash kernel (Charikar 2002): MD5 each shingle ONCE to
  * the 60-bit value, accumulate ±1 per bit position, fingerprint bit =
  * sign of the sum. Bit-identical to the explode + groupBy(id)
  * bit-sum-aggregate formulation in `graft.text.Dedup.simhashAgg`
  * (spec'd against it) — fingerprinting is per-document local, so this
  * removes that corpus-sized shuffle; only the pigeonhole band join
  * shuffles. Takes the SHINGLE ARRAY column, so any shingling scheme
  * keeps working unchanged at the call sites.
  */
object SimHashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sig(arr: ArrayData, bits: Int): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val counts = new Array[Long](bits)
    val digest = md.get()
    val out = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // Match the explode+groupBy formulation this kernel replaced: a
        // null shingle hashed to a null bit-test, which the bit-sum
        // aggregate counted as −1 on every position. The input type is
        // ArrayType(StringType) with containsNull=true, so a public
        // caller CAN pass null elements — skip-and-subtract instead of
        // the NPE arr.getUTF8String(i) would throw (ADVICE r10 #2).
        var b = 0
        while (b < bits) { counts(b) -= 1L; b += 1 }
        i += 1
      } else {
      digest.update(arr.getUTF8String(i).getBytes)
      digest.digest(out, 0, 16)
      val h = (((out(0) & 0xffL) << 56) | ((out(1) & 0xffL) << 48) |
        ((out(2) & 0xffL) << 40) | ((out(3) & 0xffL) << 32) |
        ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
        ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)) >>> 4
      var b = 0
      while (b < bits) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** `graft_simhash(shingles)` → 60-bit-hash SimHash fingerprint; null for
  * an empty shingle array (callers filter, matching the groupBy
  * formulation which emits no row).
  */
case class SimHashSig(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    SimHashKernel.sig(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("simhashRes")
      s"""
         |Object $tmp = org.apache.spark.sql.graft.SimHashKernel.sig($a, $bits);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashExpressions {
  def simhashSig(shingles: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashSig(ExpressionUtils.expression(shingles), bits))
}
