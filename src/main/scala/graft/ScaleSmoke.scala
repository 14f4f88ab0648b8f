package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ops

/** Scale stress harness: 10M synthetic events (100x the sf0.1 bench volume)
  * with a deliberately HOT key (~20% of all rows on one user) — the shape that
  * breaks naive plans at cluster scale. Exercises the operators whose scale
  * behavior the library claims, and prints per-operator wall times; anything
  * super-linear or skew-bound shows up here long before a real cluster run.
  * Run: `sbt "runMain graft.ScaleSmoke [rows]"`. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic stream: 30 days of events, zipf-ish keys with a
    // planted hot user (id 0 takes ~20% of traffic)
    val events = spark.range(rows).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(5)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(100003L))).as("user_id"),
      element_at(array(lit("signup"), lit("purchase"), lit("view")),
        (pmod(xxhash64(col("id"), lit(1)), lit(3)) + 1).cast("int")).as("event_type"),
      timestamp_micros(lit(1704067200000000L) + pmod(xxhash64(col("id"), lit(2)),
        lit(30L * 24 * 3600 * 1000000L))).as("ts"),
      (pmod(xxhash64(col("id"), lit(3)), lit(10000L)) / 100.0).as("value"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    events.count() // materialization warmup
    time(s"baseline scan+count ($rows rows)") { events.count() }
    time("hourCounts (A1)") {
      graft.operators.Views.hourCounts(events).count()
    }
    time("bucketCounts 3-granularity (A2)") {
      Ops.bucketCounts(events, "ts").count()
    }
    time("latestPerKeyAgg max_by (hot key)") {
      Ops.latestPerKeyAgg(events, Seq("user_id"), Seq(col("ts"), col("event_id"))).count()
    }
    time("latestPerKey window (hot key)") {
      Ops.latestPerKey(events, Seq("user_id"), Seq(col("ts").desc, col("event_id").desc)).count()
    }
    time("topN 100 (TakeOrdered)") {
      Ops.topN(events, 100, Seq(col("ts").desc, col("event_id").asc)).count()
    }
    time("topNPerGroup 10 by type") {
      Ops.topNPerGroup(events, Seq("event_type"),
        Seq(col("ts").desc, col("event_id").asc), 10).count()
    }
    time("distinctCountSkewSafe") {
      Ops.distinctCountSkewSafe(events, "event_type", "user_id").count()
    }
    time("countDistinct one-stage") {
      events.groupBy("event_type").agg(countDistinct(col("user_id"))).count()
    }
    time("rangeSelfJoinBucketed 60s (hot key)") {
      Ops.rangeSelfJoinBucketed(
        events.filter(pmod(col("event_id"), lit(100)) === 0) // 1% sample: pairs stay countable
          .select("user_id", "ts", "event_id"),
        Seq("user_id"), "ts", "event_id", bandSeconds = 60L).count()
    }
    spark.stop()
  }
}
