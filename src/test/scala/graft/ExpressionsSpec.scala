package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExpressions
import graft.SparkSpec

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("ArrayDot equals the HOF dot product, including length mismatch") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0, 2.0), Seq(10.0, 10.0, 99.0)), // extra elements ignored
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val out = df.select(
      GraftExpressions.arrayDot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(out(0).getDouble(0) == 32.0 && out(0).getDouble(1) == 32.0)
    assert(out(1).getDouble(0) == 30.0)
    assert(out(2).getDouble(0) == 0.0)
  }

  test("ArrayDot: null array yields null; works through SQL registration") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(GraftExpressions.arrayDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    GraftExpressions.register(spark)
    df.createOrReplaceTempView("ad_t")
    val viaSql = spark.sql("SELECT graft_dot(a, a) FROM ad_t").head().getDouble(0)
    assert(viaSql == 5.0)
  }

  test("ArrayDot participates in whole-stage codegen") {
    val df = spark.range(8).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), col("id").cast("double")).as("b"))
    val q = df.select(GraftExpressions.arrayDot(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(q.agg(sum("d")).head().getDouble(0) == (0 until 8).map(i => 3.0 * i + 2.0 * i).sum)
  }
}
