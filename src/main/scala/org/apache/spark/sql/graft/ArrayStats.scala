package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Fused window-statistics expressions for the pattern-window pipeline.
  * Each mirrors the HOF formulation's sequential floating-point order
  * exactly (oracle-parity) while compiling to primitive loops.
  */

/** Σ arr — sequential sum. */
case class ArraySum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_asum"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) s += x.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) $s += $a.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArraySum =
    copy(child = newChild)
}

/** Σ (arr_i − mean)² — the second pass of a population std. */
case class ArraySumSqAround(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_asumsq"

  override def nullSafeEval(a: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mean = m.asInstanceOf[Double]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i)) {
        val d = x.getDouble(i) - mean
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $d = $a.getDouble($i) - $m;
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySumSqAround =
    copy(left = newLeft, right = newRight)
}

/** Σ over arr[start, start+len) of (x − center)/(scale + eps) — one
  * mean-pool bucket of the z-scored window, computed without
  * materializing the z array. `start`/`len` are 0-based plan constants.
  */
case class ArrayZSliceSum(first: Expression, second: Expression, third: Expression,
    start: Int, len: Int, eps: Double = 1e-8)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_zslicesum"

  override def nullSafeEval(a: Any, c: Any, s0: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val center = c.asInstanceOf[Double]
    val scale = s0.asInstanceOf[Double]
    val end = math.min(start + len, x.numElements())
    var s = 0.0
    var i = start
    while (i < end) {
      if (!x.isNullAt(i)) s += (x.getDouble(i) - center) / (scale + eps)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c, sc) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val end = ctx.freshName("end")
      s"""
         |int $end = java.lang.Math.min($start + $len, $a.numElements());
         |double $s = 0.0;
         |for (int $i = $start; $i < $end; $i++) {
         |  if (!$a.isNullAt($i)) $s += ($a.getDouble($i) - $c) / ($sc + $eps);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ArrayZSliceSum =
    copy(first = f, second = s, third = t)
}

object ArrayStatsExpressions {
  def arraySum(a: Column): Column =
    ExpressionUtils.column(ArraySum(ExpressionUtils.expression(a)))

  def arraySumSqAround(a: Column, mean: Column): Column =
    ExpressionUtils.column(ArraySumSqAround(
      ExpressionUtils.expression(a), ExpressionUtils.expression(mean)))

  def arrayZSliceSum(a: Column, center: Column, scale: Column,
      start: Int, len: Int): Column =
    ExpressionUtils.column(ArrayZSliceSum(
      ExpressionUtils.expression(a), ExpressionUtils.expression(center),
      ExpressionUtils.expression(scale), start, len))
}
