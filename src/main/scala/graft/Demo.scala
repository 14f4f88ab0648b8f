package graft

import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Endpoints, Similarity}
import graft.sources.Tables

/** Switching guide as runnable code: every REST question the reference answers
  * (`realtime_api.py:82-322`), asked through this library, plus the
  * training-pipeline layer — what a user of the reference runs on day one
  * after switching. `sbt "runMain graft.Demo [sf-dir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.events(spark, d)

    println("== GET /customers/latest_info/11  (LWW latest profile)")
    Endpoints.customerLatest(events, 11).show(3, truncate = false)

    println("== GET /customers/global_recent?limit=5")
    Endpoints.globalRecent(events, 5).show(truncate = false)

    println("== GET /analytics/geo_distribution_hourly_by_country  (per-city rows + total)")
    Endpoints.geoDistributionHourly(events, "2024010712", "purchase").show(truncate = false)

    println("== GET /products/new_count?period=hourly  (explicit clock)")
    Endpoints.newProductsCount(events, "hourly",
      Instant.parse("2024-01-01T10:30:00Z")).show()

    println("== GET /products/category_trends/view  (top-5)")
    Endpoints.categoryTrends(events, "view", 5).show(truncate = false)

    println("== Training-data layer: curated corpus (lang=en, quality-gated, deduped)")
    Curation.curateCorpus(Tables.documents(spark, d)).orderBy("doc_id").show(5)

    println("== Training-data layer: ANN top-3 neighbors of vec 0 (trained IVF)")
    Similarity.ivfTopK(Tables.embeddings(spark, d),
      Tables.embeddings(spark, d).filter(col("vec_id") === 0), 3,
      nlist = 8, nprobe = 5).show()

    println("== Ad-hoc SQL over the registered views")
    graft.sources.Lake.registerAll(spark, d)
    spark.sql("""SELECT event_type, count(*) AS n FROM events
                 GROUP BY event_type ORDER BY n DESC""").show()

    spark.stop()
  }
}
