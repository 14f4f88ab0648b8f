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

  test("hourlyAnomalies: spike z-scored against trailing hours; warmup rows never flag") {
    val df = (Seq((1, 1), (2, 2), (3, 1), (4, 2)).flatMap { case (h, n) =>
      (1 to n).map(i => ev(i.toLong, "a", f"2024-01-01 $h%02d:${i}%02d:00"))
    } ++ (1 to 10).map(i => ev(i.toLong, "a", f"2024-01-01 05:${i}%02d:00")))
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.hourlyAnomalies(df, trailingHours = 24, zThreshold = 3.0)
      .collect().map(x => (x.getTimestamp(1).toString.take(13),
        x.getLong(2), Option(x.get(4)), x.getBoolean(5))).sortBy(_._1)
    // hour 1: no trailing history -> null z, not anomalous
    assert(r.head == ("2024-01-01 01", 1L, None, false), s"got ${r.head}")
    // hour 2: single trailing row -> sample stddev undefined -> null z
    assert(r(1)._3.isEmpty && !r(1)._4)
    // hour 5: counts (1,2,1,2) trail -> mu 1.5, sd ~0.577, z(10) ~ 14.7
    val spike = r.last
    assert(spike._1 == "2024-01-01 05" && spike._2 == 10L && spike._4,
      s"spike not flagged: $spike")
    assert(math.abs(spike._3.get.asInstanceOf[Double] - 14.722432) < 1e-5)
  }

  test("targetEncodeLoo: LOO means, singleton-null at zero smoothing, shrinkage") {
    val df = Seq((1L, "a", 1.00), (2L, "a", 2.00), (3L, "a", 3.00), (4L, "b", 5.00))
      .toDF("event_id", "key", "value")
    def te(sm: Double): Map[Long, Option[Double]] =
      Analytics.targetEncodeLoo(df, "key", "value", sm).collect()
        .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    val raw = te(0.0)
    assert(raw(1L) === Some(2.5) && raw(2L) === Some(2.0) && raw(3L) === Some(1.5))
    assert(raw(4L).isEmpty, "singleton key with no smoothing must be null")
    // smoothing 1: global mean 2.75 shrinks everything; singleton gets exactly gm
    val sm = te(1.0)
    assert(sm(4L) === Some(2.75))
    assert(sm(1L) === Some(BigDecimal((2.0 + 3.0 + 2.75) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
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
