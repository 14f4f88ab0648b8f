package graft.sources

import org.apache.spark.sql.SparkSession

/** The one place the library's session defaults live — every entry point
  * (driver mains, demos, dev harnesses, the test suite) builds from here, so a
  * session-level tuning is one edit, not one per main.
  *
  * The defaults and why:
  *  - UTC session timezone: every DuckDB oracle compares naive timestamps;
  *  - ANSI off: the oracles pin pre-ANSI arithmetic/cast semantics;
  *  - nanosAsLong: `events.ts` is ns-precision parquet Spark 4 otherwise
  *    refuses ([[Tables.events]] truncates to µs);
  *  - objectHashAggregate fallback threshold 4M: the native aggregates here
  *    ([[graft.functions.ArgMaxAgg]], [[graft.functions.TopKByScoreAgg]],
  *    [[graft.functions.MinHashSigAgg]]) keep constant-size buffers, while
  *    the 128-key default is sized for giant collect_list state — at the
  *    default, a 100k-key LWW silently degrades to sort-based aggregation;
  *  - no UI: these are batch/test processes.
  */
object Sessions {
  /** One `cores` knob drives both the local master and the shuffle-partition
    * count — a pair like ("local[32]", 4) would silently skew every measured
    * number, so the API makes it unrepresentable. */
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
}
