package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayDotStrict, AsOfJoinStrategy, FuseDotProduct}

/** Session extension wiring — the `SparkSessionExtensions` entry point
  * for the engine's Catalyst additions:
  *
  *  - [[org.apache.spark.sql.graft.AsOfJoinStrategy]]: plans the native
  *    as-of join operator ([[org.apache.spark.sql.graft.AsOfJoinPlan]])
  *    into its merge exec.
  *  - [[org.apache.spark.sql.graft.FuseDotProduct]]: optimizer rule that
  *    fuses the declarative `aggregate(zip_with(...))` dot product into
  *    a codegen'd primitive loop.
  *
  * Installed by [[Session.builder]] via `.withExtensions`; an external
  * application can equally set
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => FuseDotProduct)
    // SQL-visible registration of the fused kernel (the third injection
    // surface): `SELECT graft_dot_strict(a, b)` plans the codegen'd loop
    // directly, without waiting for the rewrite rule to match.
    e.injectFunction((FunctionIdentifier("graft_dot_strict"),
      new ExpressionInfo(classOf[ArrayDotStrict].getName, "graft_dot_strict"),
      (children: Seq[Expression]) => {
        if (children.length != 2) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_dot_strict`",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        }
        ArrayDotStrict(children(0), children(1))
      }))
  }
}
