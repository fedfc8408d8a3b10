package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** Perceptual image fingerprints (public knowledge: the dHash/aHash
  * family popularized by the pHash project and Krawetz's "Kind of Like
  * That" write-ups) over the multimodal binary payload column. The
  * payload is the same `srcW`-bytes-per-row grayscale grid the stub
  * resize/frame-sample decoders read (Multimodal.StubImageResizer);
  * both hashes nearest-neighbor-sample a fixed tiny grid from it — the
  * exact index arithmetic a real implementation applies after decode —
  * and emit a 60-BIT fingerprint (not the classic 64) so the value
  * stays positive in a signed 64-bit long on both engines and plugs
  * straight into the existing 60-bit hamming machinery
  * (Dedup.hamming / Dedup.simhashNearDupPairs pigeonhole bands).
  *
  *  - dHash: sample an 11-row × 6-col grid, bit(r,c) = px(r,c) >
  *    px(r+1,c) for r ∈ [0,10), c ∈ [0,6) — the vertical-gradient
  *    variant, 60 bits. Gradients are illumination-invariant, the
  *    property that makes dHash the default near-dup fingerprint.
  *  - aHash: sample a 10-row × 6-col grid, bit(i) = 60·px(i) > Σpx —
  *    the mean comparison done in exact integers (60·px > sum ⇔
  *    px > mean) so engine/oracle parity never touches a float.
  *
  * Both are per-row local, deterministic, and total: a payload shorter
  * than one grid row (`srcW` bytes) returns null — callers filter,
  * matching the repo's empty-shingle convention.
  */
object PerceptualHashKernel {
  /** 60-bit vertical-gradient dHash; null when the payload holds no
    * complete row. Indices stay in bounds for any h ≥ 1 because the
    * NN sample ⌊r·h/11⌋ ≤ h−1 for r ≤ 10.
    */
  def dhash60(payload: Array[Byte], srcW: Int): Any = {
    val h = payload.length / srcW
    if (h < 1) return null
    var fp = 0L
    var r = 0
    while (r < 10) {
      val ra = (r.toLong * h / 11).toInt
      val rb = ((r + 1).toLong * h / 11).toInt
      var c = 0
      while (c < 6) {
        val sc = c * srcW / 6
        val a = payload(ra * srcW + sc) & 0xff
        val b = payload(rb * srcW + sc) & 0xff
        if (a > b) fp |= (1L << (r * 6 + c))
        c += 1
      }
      r += 1
    }
    fp
  }

  /** 60-bit audio energy-gradient fingerprint (the shape of
    * acoustic-fingerprint front-ends like Chromaprint, public
    * knowledge, over the stub frame model): slice the payload into 61
    * equal frames of ⌊len/61⌋ bytes (remainder dropped so every frame
    * energy is an exact integer over the same length), bit r =
    * energy(r) > energy(r+1). Robust to gain changes that preserve
    * energy ordering — the audio analog of dHash's gradient argument.
    * Null when the payload holds fewer than 61 bytes.
    */
  def audiohash60(payload: Array[Byte]): Any = {
    val step = payload.length / 61
    if (step < 1) return null
    val e = new Array[Long](61)
    var f = 0
    while (f < 61) {
      var s = 0L
      var i = f * step
      val end = i + step
      while (i < end) { s += (payload(i) & 0xff); i += 1 }
      e(f) = s
      f += 1
    }
    var fp = 0L
    var r = 0
    while (r < 60) {
      if (e(r) > e(r + 1)) fp |= (1L << r)
      r += 1
    }
    fp
  }

  /** 60-bit average hash over a 10×6 sampled grid; null when the
    * payload holds no complete row.
    */
  def ahash60(payload: Array[Byte], srcW: Int): Any = {
    val h = payload.length / srcW
    if (h < 1) return null
    val px = new Array[Int](60)
    var sum = 0L
    var r = 0
    while (r < 10) {
      val sr = (r.toLong * h / 10).toInt
      var c = 0
      while (c < 6) {
        val v = payload(sr * srcW + c * srcW / 6) & 0xff
        px(r * 6 + c) = v
        sum += v
        c += 1
      }
      r += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (60L * px(i) > sum) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

sealed trait PerceptualHashExpr extends UnaryExpression with ExpectsInputTypes {
  def srcW: Int
  require(srcW >= 8, "source grid width must cover the 6 sampled columns")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

/** `graft_dhash(payload)` → 60-bit vertical-gradient dHash. */
case class DHash60(child: Expression, srcW: Int) extends PerceptualHashExpr {
  override def prettyName: String = "graft_dhash"

  override def nullSafeEval(a: Any): Any =
    PerceptualHashKernel.dhash60(a.asInstanceOf[Array[Byte]], srcW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("dhashRes")
      s"""
         |Object $tmp = org.apache.spark.sql.graft.PerceptualHashKernel.dhash60($a, $srcW);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DHash60 =
    copy(child = newChild)
}

/** `graft_ahash(payload)` → 60-bit average hash. */
case class AHash60(child: Expression, srcW: Int) extends PerceptualHashExpr {
  override def prettyName: String = "graft_ahash"

  override def nullSafeEval(a: Any): Any =
    PerceptualHashKernel.ahash60(a.asInstanceOf[Array[Byte]], srcW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("ahashRes")
      s"""
         |Object $tmp = org.apache.spark.sql.graft.PerceptualHashKernel.ahash60($a, $srcW);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHash60 =
    copy(child = newChild)
}

/** `graft_audiohash(payload)` → 60-bit energy-gradient fingerprint. */
case class AudioHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audiohash"

  override def nullSafeEval(a: Any): Any =
    PerceptualHashKernel.audiohash60(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("audiohashRes")
      s"""
         |Object $tmp = org.apache.spark.sql.graft.PerceptualHashKernel.audiohash60($a);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $tmp).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHash60 =
    copy(child = newChild)
}

object PerceptualHashExpressions {
  def dhash60(payload: Column, srcW: Int = 8): Column =
    ExpressionUtils.column(DHash60(ExpressionUtils.expression(payload), srcW))
  def ahash60(payload: Column, srcW: Int = 8): Column =
    ExpressionUtils.column(AHash60(ExpressionUtils.expression(payload), srcW))
  def audiohash60(payload: Column): Column =
    ExpressionUtils.column(AudioHash60(ExpressionUtils.expression(payload)))
}
