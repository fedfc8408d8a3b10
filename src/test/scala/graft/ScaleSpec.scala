package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // 90% of big rows share one key — the classic straggler shape.
    val big = (1 to 2000).map(i => (if (i <= 1800) 1L else (i % 50).toLong, i))
      .toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    val got = Scale.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val a = (1L to 500L).map(i => (i, i * 2)).toDF("k", "va")
    val b = (1L to 500L).map(i => (i, s"s$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "graft_bucketed_a", 4, Seq("k"))
    Scale.writeBucketed(b, "graft_bucketed_b", 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
