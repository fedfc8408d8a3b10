package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (key, ts, tie, value)
    (1L, 100L, 10L, 1.0), // matches right @100 (equal ts is inclusive)
    (1L, 150L, 11L, 2.0), // matches right @100
    (1L, 250L, 12L, 3.0), // matches right @200 (the max-tie duplicate)
    (2L, 50L, 13L, 4.0)) // no right row at or before → null
    .toDF("user_id", "us", "event_id", "value")

  private val right = Seq(
    (1L, 100L, 20L, 10.0),
    (1L, 200L, 21L, 20.0),
    (1L, 200L, 22L, 30.0), // duplicate ts: keep max event_id (22)
    (2L, 60L, 23L, 40.0)) // after left@50 → not matched backward
    .toDF("user_id", "us", "event_id", "value")

  test("asofBackward: equal-ts inclusive, max-tie dedup, null when no match") {
    val out = AsOf.asofBackward(left, right, "user_id", "us", "event_id",
      leftPayload = Seq("value"), rightPayload = Seq("event_id", "value"))
      .orderBy("event_id")
      .collect()
    val got = out.map(r => (r.getLong(2), // left event_id
      Option(r.getAs[Any]("r_event_id")), r.getAs[Any]("r_value")))
    assert(got(0) == ((10L, Some(20L), 10.0)))
    assert(got(1) == ((11L, Some(20L), 10.0)))
    assert(got(2) == ((12L, Some(22L), 30.0)))
    assert(got(3)._1 == 13L && got(3)._2.isEmpty)
  }

  test("asofBackward matches a per-row loop oracle on random data") {
    val rnd = new scala.util.Random(7)
    val ls = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble()))
    val rs = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong, rnd.nextDouble()))
    val lDf = ls.toDF("user_id", "us", "event_id", "value")
    val rDf = rs.toDF("user_id", "us", "event_id", "value")
    val got = AsOf.asofBackward(lDf, rDf, "user_id", "us", "event_id",
      Seq("value"), Seq("event_id"))
      .select("event_id", "r_event_id").as[(Long, Option[Long])]
      .collect().toMap
    ls.foreach { case (k, ts, id, _) =>
      val cand = rs.filter(r => r._1 == k && r._2 <= ts)
      val want = if (cand.isEmpty) None
      else Some(cand.maxBy(r => (r._2, r._3))._3)
      assert(got(id) == want, s"left $id")
    }
  }

  test("sessionize: gap boundary is exclusive, ids are per-key running counts") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), // same session (gap 100 == gap → NOT new)
      (1L, 201L, 3L), // 101 > 100 → new session
      (2L, 0L, 4L)) // separate key restarts at 1
      .toDF("user_id", "us", "event_id")
    val out = AsOf.sessionize(df, "user_id", "us", "event_id", gap = 100L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}
