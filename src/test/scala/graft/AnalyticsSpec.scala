package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Event-sequence analytics: ordered funnels and weekly retention cohorts. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, typ: String, t: String) =
    (user, typ, ts(t))

  private def events = Seq(
    // user 1: full funnel in order, inside the horizon
    ev(1L, "signup", "2024-01-01 10:00:00"),
    ev(1L, "view", "2024-01-02 10:00:00"),
    ev(1L, "purchase", "2024-01-03 10:00:00"),
    // user 2: purchase BEFORE view — stage 3 must not count the early purchase
    ev(2L, "signup", "2024-01-01 10:00:00"),
    ev(2L, "purchase", "2024-01-01 11:00:00"),
    ev(2L, "view", "2024-01-01 12:00:00"),
    // user 3: completes but the purchase lands past the 168 h horizon
    ev(3L, "signup", "2024-01-01 10:00:00"),
    ev(3L, "view", "2024-01-02 10:00:00"),
    ev(3L, "purchase", "2024-01-20 10:00:00"),
    // user 4: never signs up — not even stage 1
    ev(4L, "view", "2024-01-01 10:00:00"),
    ev(4L, "purchase", "2024-01-01 11:00:00")
  ).toDF("user_id", "event_type", "ts")

  test("funnel: order and horizon enforced, counts non-increasing") {
    val r = Analytics.funnel(events, Seq("signup", "view", "purchase"),
      maxSpanHours = 168).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2))).sortBy(_._1)
    assert(r === Seq((1, "signup", 3L), (2, "view", 3L), (3, "purchase", 1L)),
      s"got ${r.toSeq}")
  }

  test("funnel: same-timestamp stage events qualify (>= boundary)") {
    val df = Seq(
      ev(1L, "signup", "2024-01-01 10:00:00"),
      ev(1L, "view", "2024-01-01 10:00:00") // simultaneous: still stage 2
    ).toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel(df, Seq("signup", "view")).collect()
      .map(x => (x.getInt(0), x.getLong(2))).sortBy(_._1)
    assert(r === Seq((1, 1L), (2, 1L)))
  }

  test("retentionCohorts: offset 0 is cohort size; later weeks count distinct users") {
    // weeks start Monday: 2024-01-01 IS a Monday
    val df = Seq(
      ev(1L, "view", "2024-01-01 10:00:00"), // cohort w0
      ev(1L, "view", "2024-01-03 10:00:00"), // same week — no extra row
      ev(1L, "view", "2024-01-10 10:00:00"), // w0 + 1
      ev(2L, "view", "2024-01-02 10:00:00"), // cohort w0
      ev(3L, "view", "2024-01-09 10:00:00")  // cohort w1
    ).toDF("user_id", "event_type", "ts")
    val r = Analytics.retentionCohorts(df).collect()
      .map(x => (x.getTimestamp(0).toString.take(10), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set(("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)), s"got $r")
  }
}
