package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout helpers — the piece of the 100 TB design that lives at WRITE
  * time. The reference bakes its read performance into Cassandra primary keys
  * (`/root/reference/README.md:135-141`); the Spark-native equivalent is
  * directory partitioning (coarse pruning key) + many parquet files per
  * partition (parallelism), so time-ranged queries prune whole directories
  * before any I/O (PlanSpec asserts the `PartitionFilters`).
  */
object Lake {

  /** Write the event table date-partitioned: `path/event_date=YYYY-MM-DD/...`.
    * Daily granularity keeps partition count ~365/year (catalog-friendly) while
    * letting every hour/day-bucketed view prune to the days it touches. */
  def writeEventsPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Read back with the partition column available for pruning. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed layout: hash-cluster a table on its join/agg key at WRITE time, so
    * every future equi-join or aggregation on that key reads co-located buckets
    * and skips the shuffle entirely (Spark plans SortMergeJoin with NO Exchange
    * when both sides are bucketed by the join key into the same bucket count).
    * This is the Spark-native analog of the reference keeping each Cassandra
    * table pre-partitioned by its query key (`README.md:135-141`) — pay the
    * shuffle once at ingest, amortize it over every read. Bucket count is a
    * layout constant: pick ~(table size / target partition size) and keep it
    * stable across tables that join together. */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** APPEND a delta to an existing bucketed table — the build-once /
    * append-often half of the bucketed-layout lifecycle: the delta pays its
    * bucketing shuffle once at write (new bucket files land beside the old
    * ones; nothing is rewritten), and every co-located read keeps working
    * because the bucket spec (column + count) must match the existing
    * table's — Spark refuses a mismatched append, which is exactly the
    * layout-drift guard a persisted index needs. */
  def appendBucketed(df: DataFrame, path: String, table: String,
                     bucketCol: String, buckets: Int): Unit =
    df.write.mode("append")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Z-order (Morton) interleave key over numeric columns: each column
    * quantizes to `bits` bits against its [min, max] range, then the bits
    * interleave (column j contributes bit i at position i·ncols + j, so all
    * columns share the high-order positions equally). Rows close in EVERY
    * dimension get close keys — range-partitioning and sorting by this key
    * clusters multi-dimensional boxes into few files/row groups, which is what
    * parquet min-max statistics can then skip. A single-column sort layout
    * only ever prunes predicates on that column; Z-order trades a little
    * per-column locality for pruning on ALL the interleaved columns.
    * Pure column expression tree (constant size: ncols · bits terms) — no UDF,
    * stays inside whole-stage codegen. */
  def zorderKey(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
                bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.length == mins.length && cols.length == maxs.length,
      "one (min, max) per z-order column")
    val nc = cols.length
    require(nc * bits <= 63, s"ncols * bits must fit a long, got $nc x $bits")
    val maxQ = (1L << bits) - 1
    val quantized = cols.zipWithIndex.map { case (c, j) =>
      val span = math.max(maxs(j) - mins(j), Double.MinPositiveValue)
      least(greatest(
          ((c.cast("double") - mins(j)) / span * maxQ).cast("long"), lit(0L)),
        lit(maxQ))
    }
    (for (i <- 0 until bits; j <- 0 until nc) yield
      shiftleft(shiftright(quantized(j), i).bitwiseAND(lit(1L)), i * nc + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the Z-order of `zCols`: range-partition into
    * `numFiles` files by the interleave key and sort within each file, so both
    * file-level and row-group-level min-max stats become selective for
    * multi-column range predicates. Column ranges are computed in one tiny
    * aggregate pass (at 100 TB: use known domain bounds or a sample instead —
    * quantization only needs approximate ranges; clamping handles outliers). */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    val aggs = zCols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zCols.indices.map(i => stats.getDouble(2 * i))
    val maxs = zCols.indices.map(i => stats.getDouble(2 * i + 1))
    df.withColumn("__z", zorderKey(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the maintenance job every streaming lake needs:
    * micro-batch sinks (e.g. [[graft.streaming.StreamingViews.maintainViews]]'s
    * per-batch paths) accrete files far below the efficient scan size, and at
    * 100 TB the file-open + footer cost of millions of small files dominates
    * reads. Rewrites `inPath` into ceil(bytes / targetFileBytes) files (floor 1)
    * at `outPath`, preserving rows exactly; the file count derives from the
    * ACTUAL on-disk byte size, not a row-count guess, so it tracks schema width
    * and compression. Write-then-swap (never in place): readers keep a
    * consistent view of `inPath` until the atomic directory swap a deployment's
    * catalog/manifest layer performs. Optional `sortCols` re-sorts within
    * output files so min-max stats stay selective after compaction. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): Long = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = ((bytes + BigInt(targetFileBytes) - 1) / targetFileBytes).toInt.max(1)
    val repartitioned =
      if (sortCols.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    repartitioned.write.mode("overwrite").parquet(outPath)
    files.toLong
  }

  /** Interchange formats: the engine is parquet-first (columnar, statistics,
    * pushdown), but ingest pipelines land CSV/JSONL too. Explicit schema on
    * read — never inferSchema (a full extra pass over 100 TB). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC: the other columnar interchange format (schema travels in the file,
    * same pushdown/pruning machinery as parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Register every testdata table plus derived views as temp views so the whole
    * engine surface is reachable from `spark.sql(...)` — the general query
    * interface the reference lacks (its five endpoints are hardcoded). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.operators.Views.latestInfo(Tables.events(spark, dir))
      .createOrReplaceTempView("customer_latest_info")
    graft.operators.Views.hourCounts(Tables.events(spark, dir))
      .createOrReplaceTempView("geo_counts_by_hour")
    graft.operators.Views.multiGranularityCounts(Tables.events(spark, dir))
      .createOrReplaceTempView("counts_by_time")
  }
}
