package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, ExpectsInputTypes, Expression, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Null-faithful fused dot product: bit-for-bit equivalent to the
  * declarative `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v)` — returns NULL when the arrays differ in length
  * or any paired element is NULL (exactly what the zip/aggregate chain
  * yields, since a padded or NULL element poisons the running sum), and
  * otherwise the same sequential left-to-right summation. Unlike
  * [[ArrayDot]] (skip-nulls, min-length — the engine's own kernels),
  * this one exists to be a SEMANTICS-PRESERVING rewrite target, so
  * [[FuseDotProduct]] can fire with no guards.
  */
case class ArrayDotStrict(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot_strict"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotStrict =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: fuse the declarative higher-order-function dot
  * product into [[ArrayDotStrict]].
  *
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)`
  * materializes an intermediate array and evaluates interpreted lambdas
  * per element (ArrayAggregate/ZipWith are CodegenFallback), breaking
  * whole-stage codegen at exactly the hottest spot of a similarity scan.
  * The fused expression compiles to a primitive loop inside the stage.
  * The rewrite is exact — same value, same NULL behavior, same fp
  * summation order (IEEE multiply is commutative, so matching x*y or
  * y*x is safe; Add order is required to be (acc, v)) — so the rule
  * needs no data statistics and fires anywhere the pattern appears,
  * including inside aggregates and window frames.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` (see
  * graft.GraftExtensions): users keep writing portable declarative SQL
  * and the session plans the fused kernel.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(m1, m2, _), Seq(x, y), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(s1, s2, _), Seq(acc, el), _),
          LambdaFunction(fin, Seq(fv), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          ((sameVar(m1, x) && sameVar(m2, y)) ||
            (sameVar(m1, y) && sameVar(m2, x))) &&
          sameVar(s1, acc) && sameVar(s2, el) &&
          sameVar(fin, fv) =>
      ArrayDotStrict(a, b)
  }
}
