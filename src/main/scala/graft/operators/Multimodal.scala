package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary` columns
  * with typed metadata. The image/audio codec libraries are not in this container,
  * so the DECODE step is a clearly-marked deterministic stub — but everything
  * Spark-side (schema, partition-preserving mapPartitions, batch shape, explode
  * for frame sampling) is real and tested.
  *
  * Scale notes: binary payloads ride the scan; feature extraction is
  * mapPartitions (one decoder init per partition, not per row — the pattern a real
  * JNI/FFI decoder needs); frame sampling is a generator (posexplode), never a
  * driver-side loop.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; `width`/`height` come from the (stubbed) decode. */
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Int,
                           width: Int, height: Int, checksum: Long)

  /** Adapt the `documents` table into a media table (text payload as bytes) — the
    * container has no image fixtures, so documents act as the binary carrier. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  /** DECODE STUB — a real implementation would hand `payload` to an image/audio
    * codec here (initialized once per partition). The stub derives deterministic
    * fake dimensions from the first payload bytes so tests are exact. */
  private def decodeStub(payload: Array[Byte]): (Int, Int) = {
    def b(i: Int): Int = if (i < payload.length) payload(i) & 0xff else 0
    (b(0) * 256 + b(1), b(2) * 256 + b(3)) // ??? real codec goes here
  }

  /** Feature extraction over the media table: typed mapPartitions with per-partition
    * decoder setup — the real pipeline shape with a stubbed codec core. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // per-partition decoder/codec initialization would happen HERE, once.
      val crc = new java.util.zip.CRC32()
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        crc.reset(); crc.update(r.payload)
        MediaFeatures(r.media_id, r.media_type, r.payload.length, w, h, crc.getValue)
      }
    }
  }

  /** Frame/sample extraction: emit the byte at each requested offset (stand-in for
    * video frame sampling / audio windowing). Pure generator — posexplode, no state. */
  def sampleOffsets(media: DataFrame, offsets: Seq[Int]): DataFrame =
    media
      .withColumn("pos", explode(array(offsets.map(lit): _*)))
      .filter(col("pos") <= octet_length(col("payload")))
      .select(col("media_id"), col("pos"),
        hex(expr("substring(payload, pos, 1)")).as("sample_hex"))
}
