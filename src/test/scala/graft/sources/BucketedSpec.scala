package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed storage: the join of two tables bucketed on their join key
  * must plan WITHOUT a shuffle Exchange on either side — that is the
  * entire point of the layout at 100 TB.
  */
class BucketedSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-join-key tables sort-merge join with zero Exchange") {
    val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val lt = s"graft_t_li_$tag"; val ot = s"graft_t_or_$tag"
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // Force the SMJ path so the plan assert is about bucketing, not
      // about the sf0.001 side happening to fit a broadcast.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Bucketed.write(
        graft.Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_extendedprice"),
        lt, 4, "l_orderkey", Seq("l_orderkey"))
      Bucketed.write(
        graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
        ot, 4, "o_orderkey", Seq("o_orderkey"))

      val joined = Bucketed.read(spark, lt)
        .join(Bucketed.read(spark, ot), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)

      // And the result matches the plain (shuffled) join.
      val expected = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      Bucketed.drop(spark, lt); Bucketed.drop(spark, ot)
    }
  }

  test("drop removes both the catalog entry and the warehouse files") {
    val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    val t = s"graft_t_dr_$tag"
    Bucketed.write(graft.Tables.region(spark, sf), t, 2, "r_regionkey")
    assert(spark.catalog.tableExists(t))
    Bucketed.drop(spark, t)
    assert(!spark.catalog.tableExists(t))
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(wh, t)))
  }
}
