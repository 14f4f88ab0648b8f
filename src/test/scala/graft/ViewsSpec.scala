package graft

import org.apache.spark.sql.functions._
import graft.operators.Views

class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    TestEvent(1, 10, "signup",   ts("2024-01-01 10:15:00"), 1.0, "{}"),
    TestEvent(2, 10, "purchase", ts("2024-01-01 10:45:00"), 9.0, "{}"),
    TestEvent(3, 20, "signup",   ts("2024-01-01 11:05:00"), 2.0, "{}"),
    TestEvent(4, 20, "signup",   ts("2024-01-02 09:00:00"), 3.0, "{}"),
    TestEvent(5, 30, "purchase", ts("2024-01-01 10:59:59"), 4.0, "{}")
  ).toDF()

  test("latestInfo: one row per user, latest event") {
    val r = rowSet(Views.latestInfo(events).select("user_id", "event_id"))
    assert(r === Set(Seq(10L, 2L), Seq(20L, 4L), Seq(30L, 5L)))
  }

  test("recentTopN: global recency order with id tie-break") {
    val r = rowList(Views.recentTopN(events, 3).select("event_id")).flatten
    assert(r === Seq(4L, 3L, 5L))
  }

  test("hourCounts: tumbling hour buckets by type") {
    val r = rowSet(Views.hourCounts(events))
    assert(r === Set(
      Seq("2024010110", "signup", 1L), Seq("2024010110", "purchase", 2L),
      Seq("2024010111", "signup", 1L), Seq("2024010209", "signup", 1L)))
  }

  test("hourTotals: second-level aggregation over hourCounts") {
    val r = rowSet(Views.hourTotals(events))
    assert(r === Set(Seq("2024010110", 3L), Seq("2024010111", 1L),
      Seq("2024010209", 1L)))
  }

  test("trendsTopNPerGroup: per-type recency rank") {
    val r = rowSet(Views.trendsTopNPerGroup(events, 1).select("event_type", "event_id"))
    assert(r === Set(Seq("signup", 4L), Seq("purchase", 5L)))
  }

  test("counterLookup: present bucket count and absent-bucket zero default") {
    val hit = Views.counterLookup(events, "hourly", "hourly:2024010110").head()
    assert(hit.getLong(0) === 3L)
    val miss = Views.counterLookup(events, "hourly", "hourly:1999010100").head()
    assert(miss.getLong(0) === 0L)
  }
}
