package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, us, type)
  private val events = Seq(
    // user 1 completes the whole funnel in order
    (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 30L, "click"),
    (1L, 40L, "purchase"),
    // user 2: purchase BEFORE click → funnel breaks at purchase
    (2L, 10L, "signup"), (2L, 20L, "view"), (2L, 40L, "click"),
    (2L, 30L, "purchase"),
    // user 3: view at the SAME instant as signup → strict > rejects it
    (3L, 10L, "signup"), (3L, 10L, "view"),
    // user 4 never signs up
    (4L, 5L, "view"), (4L, 6L, "click"),
    // user 5: repeated stages — earliest valid entry wins each stage
    (5L, 1L, "signup"), (5L, 2L, "view"), (5L, 3L, "view"),
    (5L, 4L, "click"), (5L, 2L, "click"))
    .toDF("user_id", "us", "event_type")

  private val stages = Seq("signup", "view", "click", "purchase")

  test("stageTimes: strict ordering, earliest entry, broken funnels") {
    val rows = Funnel.stageTimes(events, "user_id", "us", "event_type", stages)
      .orderBy("user_id").collect()
    def t(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      Option(r.getAs[Any](s"t$i")).map(_.asInstanceOf[Long])
    val byUser = rows.map(r => r.getLong(0) -> (0 to 3).map(t(r, _))).toMap
    assert(byUser(1L) == Seq(Some(10L), Some(20L), Some(30L), Some(40L)))
    // user 2: purchase@30 is before click@40 → t3 null
    assert(byUser(2L) == Seq(Some(10L), Some(20L), Some(40L), None))
    // user 3: same-instant view rejected by strict >
    assert(byUser(3L) == Seq(Some(10L), None, None, None))
    // user 4: no signup → everything null
    assert(byUser(4L) == Seq(None, None, None, None))
    // user 5: click@2 is before view@2..3; valid click is @4
    assert(byUser(5L) == Seq(Some(1L), Some(2L), Some(4L), None))
  }

  test("stageTimes plans a single exchange for all stages") {
    val plan = Funnel.stageTimes(events, "user_id", "us", "event_type", stages)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
  }
}
