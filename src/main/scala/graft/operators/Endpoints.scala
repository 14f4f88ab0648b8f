package graft.operators

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference API's five read endpoints (`realtime_api.py:82-322`) as
  * parameterized query functions over the event table — capability parity for a
  * user switching off the reference: every REST question it answers has a
  * function here with the same parameters and defaults.
  *
  * Deliberate divergences (SURVEY.md §7.4):
  *  - P11 input validation becomes `require(...)` BEFORE plan construction
  *    (reference: HTTP 400 paths, `realtime_api.py:137, 243-253, 274`);
  *  - the reference reads its clock inside the request (`realtime_api.py:66-78`,
  *    untestable); here "now" is an explicit parameter;
  *  - timezone is UTC end-to-end (reference: local time).
  */
object Endpoints {

  /** `GET /customers/latest_info/<key>` (`realtime_api.py:82-127`): point read of
    * the LWW latest-profile view. */
  def customerLatest(events: DataFrame, key: Long): DataFrame =
    Views.latestInfo(events).filter(col("user_id") === key)

  /** `GET /customers/global_recent?limit=N` (`realtime_api.py:129-184`;
    * default 10 at `:136`). */
  def globalRecent(events: DataFrame, limit: Int = 10): DataFrame = {
    require(limit > 0, s"limit must be positive, got $limit") // `realtime_api.py:137`
    Views.recentTopN(events, limit)
  }

  /** `GET /analytics/geo_distribution_hourly_by_country?hour=H&country=C`
    * (`realtime_api.py:186-228`): the PER-CITY rows for one (hour, country)
    * partition (`:210-217`, the `distribution_by_city` payload) with the
    * client-side total (`:218`) carried as a window-sum column on every row —
    * one partition-pruned scan, no second pass. Row shape:
    * (hour_bucket, country, city, new_customers_count, total_in_hour_for_country).
    * A caller wanting only the scalar total sums the per-city rows (A3), which
    * is exactly what the reference's Python loop does. */
  def geoDistributionHourly(events: DataFrame, hourBucket: String,
                            group: String): DataFrame = {
    require(hourBucket.matches("\\d{10}"), s"hour bucket must be yyyyMMddHH, got $hourBucket")
    import org.apache.spark.sql.expressions.Window
    Views.geoCounts(events)
      .filter(col("hour_bucket") === hourBucket && col("country") === group)
      .withColumn("total_in_hour_for_country",
        sum(col("new_customers_count"))
          .over(Window.partitionBy("hour_bucket", "country")))
  }

  private val validPeriods = Map(
    "hourly" -> DateTimeFormatter.ofPattern("yyyyMMddHH"),
    "daily"  -> DateTimeFormatter.ofPattern("yyyyMMdd"))

  /** Bucket string for `now` at a granularity — the query-side clone of the write
    * path's bucketing (`realtime_api.py:66-78`), UTC, clock passed in. */
  def bucketFor(period: String, now: Instant): String = {
    val utc = now.atOffset(ZoneOffset.UTC)
    period match {
      case "5min" =>
        val floored = utc.withMinute(utc.getMinute / 5 * 5)
        DateTimeFormatter.ofPattern("yyyyMMddHHmm").format(floored)
      case p => validPeriods(p).format(utc)
    }
  }

  /** `GET /products/new_count?period=hourly|daily|5min` (`realtime_api.py:230-266`):
    * counter point-read for the CURRENT bucket of the given clock, 0 when absent
    * (P12, `:260`). */
  def newProductsCount(events: DataFrame, period: String, now: Instant): DataFrame = {
    require(validPeriods.contains(period) || period == "5min",
      s"period must be one of hourly|daily|5min, got $period") // `realtime_api.py:243-253`
    Views.counterLookup(events, period, s"$period:${bucketFor(period, now)}")
  }

  /** `GET /products/category_trends/<category>` (`realtime_api.py:268-322`):
    * 10 most recent within one group, clustering-order tie-break. */
  def categoryTrends(events: DataFrame, category: String, n: Int = 10): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    Views.trendsTopNPerGroup(events, n).filter(col("event_type") === category)
  }
}
