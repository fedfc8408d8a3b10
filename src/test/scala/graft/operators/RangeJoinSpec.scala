package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval is lossless and duplicate-free vs the naive join") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "p")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(800).toLong)
    }.toDF("iid", "lo", "hi")

    for (width <- Seq(1L, 100L, 350L, 20000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      val want = points.as[(Long, Long)].collect().flatMap { case (pid, p) =>
        intervals.as[(Long, Long, Long)].collect().collect {
          case (iid, lo, hi) if p >= lo && p <= hi => (pid, iid)
        }
      }.sorted
      assert(got.toSeq == want.toSeq, s"width=$width")
    }
  }

  test("pointInInterval joins on the bucket equi-key (no nested loop)") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
