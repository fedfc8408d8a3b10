package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ArrayDotStrict, AsOfJoinExec, AsOfNative}
import graft.SparkSpec

/** The SparkSessionExtensions pack: native as-of join (logical node +
  * strategy + merge exec) and the fused-dot optimizer rule.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 100L, 10L, 1.0),
    (1L, 150L, 11L, 2.0),
    (1L, 250L, 12L, 3.0),
    (2L, 50L, 13L, 4.0))
    .toDF("user_id", "us", "event_id", "value")

  private def rightDf = Seq(
    (1L, 100L, 20L, 10.0),
    (1L, 200L, 21L, 20.0),
    (1L, 200L, 22L, 30.0), // duplicate ts: merge keeps the last → max tie
    (2L, 60L, 23L, 40.0))
    .toDF("user_id", "us", "event_id", "value")

  test("native as-of: equal-ts inclusive, max-tie, null on no match; plans AsOfJoinExec") {
    val out = AsOfNative.asofBackward(leftDf, rightDf, "user_id", "us",
      "event_id", rightPayload = Seq("event_id", "value"))
    val plan = out.queryExecution.executedPlan
    val hasExec = plan.exists {
      case _: AsOfJoinExec => true
      case a: AdaptiveSparkPlanExec => a.executedPlan.exists(_.isInstanceOf[AsOfJoinExec])
      case _ => false
    }
    assert(hasExec, s"expected AsOfJoinExec in:\n$plan")
    val got = out.orderBy("event_id").collect()
      .map(r => (r.getLong(2), Option(r.getAs[Any]("r_event_id")),
        r.getAs[Any]("r_value")))
    assert(got(0) == ((10L, Some(20L), 10.0)))
    assert(got(1) == ((11L, Some(20L), 10.0)))
    assert(got(2) == ((12L, Some(22L), 30.0)))
    assert(got(3)._1 == 13L && got(3)._2.isEmpty)
  }

  test("native as-of agrees with the window encoding on random data") {
    val rnd = new scala.util.Random(11)
    val ls = (1 to 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, i.toLong, rnd.nextDouble()))
      .toDF("user_id", "us", "event_id", "value")
    val rs = (1 to 300).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, (1000 + i).toLong, rnd.nextDouble()))
      .toDF("user_id", "us", "event_id", "value")
    val native = AsOfNative.asofBackward(ls, rs, "user_id", "us", "event_id",
        rightPayload = Seq("event_id", "value"))
      .select("event_id", "r_event_id", "r_value")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any](1)), Option(r.getAs[Any](2))))
    val windowed = AsOf.asofBackward(ls, rs, "user_id", "us", "event_id",
        leftPayload = Seq("value"), rightPayload = Seq("event_id", "value"))
      .select("event_id", "r_event_id", "r_value")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any](1)), Option(r.getAs[Any](2))))
    assert(native.toSeq == windowed.toSeq)
  }

  test("FuseDotProduct rewrites the declarative dot into ArrayDotStrict") {
    // spark.range (not a local Seq): ConvertToLocalRelation would
    // constant-fold a LocalRelation projection before user rules run.
    // Depend on `id` so neither ConvertToLocalRelation nor
    // ConstantFolding evaluates the expression before user rules run.
    val df = spark.range(1)
      .select(array(col("id").cast("double") + 1.0, lit(2.0), lit(3.0)).as("a"),
        array(lit(4.0), lit(5.0), lit(6.0)).as("b"))
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v) AS dot")
    val fused = df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[ArrayDotStrict]))
    assert(fused, s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
    assert(df.collect().head.getDouble(0) == 1.0 * 4 + 2 * 5 + 3 * 6)
  }

  test("graft_dot_strict is registered as a SQL function via injectFunction") {
    val r = spark.sql(
      "SELECT graft_dot_strict(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(r == 11.0)
    assert(spark.sql(
      "SELECT graft_dot_strict(array(1.0D), array(1.0D, 2.0D)) AS d")
      .head.isNullAt(0)) // length mismatch → NULL, same as the HOF chain
  }

  test("ArrayDotStrict preserves the declarative null semantics exactly") {
    val rows = Seq(
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)), // clean
      (Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0)), // length mismatch
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)), // null elem
      (null, Array[java.lang.Double](3.0, 4.0))) // null array
      .toDF("a", "b")
    val decl = "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
    val out = rows.selectExpr(s"$decl AS dot").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0) == Some(11.0))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }
}
