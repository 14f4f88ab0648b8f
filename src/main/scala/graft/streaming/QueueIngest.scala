package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Message-queue ingest, the reference's actual S1 source shape: a RabbitMQ
  * consumer decoding JSON bodies plus AMQP frame properties
  * (`cassandra_subscriber.py:102-113` — `json.loads(body)`, `properties
  * .timestamp`, `properties.message_id`; consumer setup `:237-285`).
  *
  * No queue connector jar exists in this offline container, so the TRANSPORT is
  * modeled as the industry-standard kafka frame relation —
  * `(key BINARY, value BINARY, topic, partition, offset, timestamp)` — which is
  * also exactly what `spark.readStream.format("kafka")` yields: a deployment
  * swaps [[encodeFrames]]' synthetic frames for the connector's and keeps
  * [[decodeFrames]] and every downstream view unchanged. StreamingSpec proves
  * the path over a MemoryStream of frames (stream ≡ batch parity), and the
  * `s_queue_decode` query entry hash-checks the full decode round-trip against
  * the raw event table.
  *
  * Scale notes: decode is a stateless map-only projection (one codegen
  * `from_json` per row — no UDF, no shuffle); `partition` is derived from the
  * key exactly like a queue's keyed partitioner, so per-key ORDER survives the
  * transport the same way it does on a real broker.
  */
object QueueIngest {

  /** JSON timestamp format carrying full µs precision through the payload —
    * the default JSON format is ms-truncating, which would silently corrupt
    * event time on 999/1000 of the fixture rows. */
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val JsonOpts = Map("timestampNTZFormat" -> TsFormat, "timestampFormat" -> TsFormat)

  /** The nested payload schema — `json.loads(body)` with every field typed
    * (full-schema decode; the reference reads fields ad hoc per message type). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampNTZType),
    StructField("value", DoubleType),
    StructField("props", StructType(Seq(StructField("k", LongType))))))

  /** The transport frame relation (kafka wire shape). */
  val frameSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType)))

  /** Events → queue frames: the PUBLISHER side (what the reference's upstream
    * producer does), used to stage fixtures and parity tests. Key = the
    * partition key (user_id) so per-user order is preserved per partition;
    * frame timestamp plays AMQP `properties.timestamp`. */
  def encodeFrames(events: DataFrame, topic: String = "graft_events",
                   partitions: Int = 32): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(
        col("event_id"), col("user_id"), col("event_type"),
        // ntz in the payload regardless of input flavor (UTC session): the
        // decode side declares ntz, and µs precision survives via TsFormat
        col("ts").cast("timestamp_ntz").as("ts"), col("value"),
        from_json(col("props"), payloadSchema("props").dataType).as("props")),
        JsonOpts).cast("binary").as("value"),
      lit(topic).as("topic"),
      pmod(xxhash64(col("user_id")), lit(partitions)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").cast("timestamp").as("timestamp"))

  /** Queue frames → typed events: full-schema `from_json` over the body
    * (`cassandra_subscriber.py:103`), event time from the payload with the
    * frame timestamp as fallback (`:113` uses `properties.timestamp`), and the
    * transport coordinates (partition, offset) retained for exactly-once
    * bookkeeping. Works identically on a batch frame table and a streaming
    * frame source — the parity StreamingSpec drives BOTH through the same
    * views. */
  def decodeFrames(frames: DataFrame): DataFrame =
    frames
      .select(
        from_json(col("value").cast("string"), payloadSchema, JsonOpts).as("e"),
        col("timestamp").as("frame_ts"),
        col("partition"), col("offset"))
      .select(
        col("e.event_id").as("event_id"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        coalesce(col("e.ts"), col("frame_ts").cast("timestamp_ntz")).as("ts"),
        col("e.value").as("value"),
        col("e.props").as("props"),
        col("partition"), col("offset"))

  /** [[decodeFrames]] with dead-letter routing — a 100 TB ingest never drops a
    * corrupt body silently (the reference would crash its consumer on one:
    * `json.loads` at `cassandra_subscriber.py:103` is un-guarded and the nack
    * loop at `:109` would redeliver it forever). Corruption is detected via
    * the parser's corrupt-record channel — PERMISSIVE parsing SALVAGES every
    * field before the first syntax error, so "required fields non-null" alone
    * misses most truncated bodies (measured: 1 of 10 planted truncations).
    * A frame is valid when the body parsed without error AND the required
    * fields are present; invalid frames keep the raw body + transport
    * coordinates so a dead-letter sink can persist and replay them. Split
    * with [[validEvents]] / [[deadLetters]] — both sides of one map-only
    * projection, no UDF, no second parse. */
  def decodeFramesWithDlq(frames: DataFrame): DataFrame = {
    val dlqSchema = StructType(payloadSchema.fields :+ StructField("_corrupt", StringType))
    val opts = JsonOpts + ("columnNameOfCorruptRecord" -> "_corrupt")
    frames
      .select(
        col("value").cast("string").as("raw"),
        from_json(col("value").cast("string"), dlqSchema, opts).as("e"),
        col("timestamp").as("frame_ts"),
        col("partition"), col("offset"))
      .select(
        col("e.event_id").as("event_id"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        coalesce(col("e.ts"), col("frame_ts").cast("timestamp_ntz")).as("ts"),
        col("e.value").as("value"),
        col("e.props").as("props"),
        col("partition"), col("offset"), col("raw"),
        // ts is NOT required: a body without it is valid with the frame
        // timestamp as event time — the same fallback decodeFrames applies
        // (properties.timestamp semantics, cassandra_subscriber.py:113)
        (col("e").isNotNull && col("e._corrupt").isNull &&
          col("e.event_id").isNotNull && col("e.user_id").isNotNull &&
          col("e.event_type").isNotNull).as("is_valid"))
  }

  /** The decoded good side of [[decodeFramesWithDlq]] (same shape as
    * [[decodeFrames]]'s output). */
  def validEvents(decoded: DataFrame): DataFrame =
    decoded.filter(col("is_valid")).drop("raw", "is_valid")

  /** The dead-letter side: raw body + transport coordinates, ready for a
    * replayable DLQ sink. */
  def deadLetters(decoded: DataFrame): DataFrame =
    decoded.filter(!col("is_valid")).select("raw", "partition", "offset")
}
