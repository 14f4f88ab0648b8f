package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "ABCD some payload text"),
    (2L, "xy")
  ).toDF("doc_id", "text").transform(Multimodal.mediaFromDocuments)

  // ---- hand-built files per public format spec ------------------------------

  /** Minimal PNG: 8-byte signature + IHDR chunk (len, "IHDR", w, h, bit fields). */
  private def handPng(w: Int, h: Int): Array[Byte] = {
    def be(v: Int) = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be(13) ++ "IHDR".getBytes ++ be(w) ++ be(h) ++
      Array[Byte](8, 2, 0, 0, 0) ++ be(0) // bit depth/color/crc placeholder
  }

  /** Minimal GIF89a: magic + LE logical screen width/height + flags. */
  private def handGif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array[Byte](
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 0, 0, 0)

  /** Minimal JPEG: SOI, an APP0 segment to skip, then SOF0 with h/w, then EOI. */
  private def handJpeg(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++
      (Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14)) ++
      (Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
        be16(h) ++ be16(w) ++ Array[Byte](3, 0, 0x11, 0)) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  test("decodeHeader parses hand-built PNG / GIF / JPEG and encodeBmp round-trips") {
    assert(Multimodal.decodeHeader(handPng(640, 480)) === (("png", 640, 480)))
    assert(Multimodal.decodeHeader(handGif(320, 200)) === (("gif", 320, 200)))
    assert(Multimodal.decodeHeader(handJpeg(1024, 768)) === (("jpeg", 1024, 768)))
    val bmp = Multimodal.encodeBmp(17, 9, seed = 7L)
    assert(Multimodal.decodeHeader(bmp) === (("bmp", 17, 9)))
    // spec'd byte length: 54-byte headers + padded BGR rows (rowSize = ceil(3w/4)*4)
    assert(bmp.length === 54 + ((3 * 17 + 3) / 4) * 4 * 9)
    assert(Multimodal.decodeHeader("not an image".getBytes) === (("unknown", 0, 0)))
    assert(Multimodal.decodeHeader(Array[Byte]()) === (("unknown", 0, 0)))
    // truncated PNG (signature only, no IHDR yet) must not crash or misreport
    assert(Multimodal.decodeHeader(handPng(640, 480).take(12)) === (("unknown", 0, 0)))
  }

  test("extractFeatures: real header parse + real byte length and checksum") {
    val imgs = Seq(
      Multimodal.MediaRecord(1L, "image/png", handPng(99, 44)),
      Multimodal.MediaRecord(2L, "image/bmp", Multimodal.encodeBmp(5, 3, seed = 2L)),
      Multimodal.MediaRecord(3L, "text/plain", "just text".getBytes)
    ).toDS()
    val r = Multimodal.extractFeatures(spark, imgs.toDF()).collect()
      .map(f => f.media_id -> f).toMap
    assert((r(1L).format, r(1L).width, r(1L).height) === (("png", 99, 44)))
    assert((r(2L).format, r(2L).width, r(2L).height) === (("bmp", 5, 3)))
    assert(r(2L).byte_len === 54 + ((3 * 5 + 3) / 4) * 4 * 3)
    assert((r(3L).format, r(3L).width, r(3L).height) === (("unknown", 0, 0)))
    val crc = new java.util.zip.CRC32()
    crc.update("just text".getBytes)
    assert(r(3L).checksum === crc.getValue)
  }

  test("syntheticImagesFromDocuments: genuine BMPs whose dims derive from doc_id") {
    val docs = Seq((0L, "a"), (17L, "b"), (40L, "c")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.syntheticImagesFromDocuments(spark, docs).toDF()).collect()
      .map(f => f.media_id -> f).toMap
    Seq(0L, 17L, 40L).foreach { id =>
      val (w, h) = ((id % 16).toInt + 1, (id % 12).toInt + 1)
      assert((feats(id).format, feats(id).width, feats(id).height) === (("bmp", w, h)))
      assert(feats(id).byte_len === 54 + ((3 * w + 3) / 4) * 4 * h)
    }
  }

  test("sampleOffsets: generator emits in-range offsets only") {
    val r = rowSet(Multimodal.sampleOffsets(media, Seq(1, 3, 100))
      .select("media_id", "pos", "sample_hex"))
    assert(r === Set(
      Seq(1L, 1, "41"), Seq(1L, 3, "43"),   // 'A', 'C'
      Seq(2L, 1, "78")))                     // 'x'; offsets 3/100 out of range
  }

  /** Hand-built w x h 24-bit BMP whose pixel (x, y) is the BGR triple
    * (x, y, 0xAA) — every pixel identifies its own coordinates. */
  private def coordBmp(w: Int, h: Int): Array[Byte] = {
    val base = Multimodal.encodeBmp(w, h, seed = 0L)
    val rowSize = ((3 * w + 3) / 4) * 4
    for (y <- 0 until h; x <- 0 until w) {
      val i = 54 + y * rowSize + x * 3
      base(i) = x.toByte; base(i + 1) = y.toByte; base(i + 2) = 0xAA.toByte
    }
    // zero the row-padding bytes the LCG filled, so byte equality is exact
    for (y <- 0 until h; p <- 3 * w until rowSize) base(54 + y * rowSize + p) = 0
    base
  }

  private def pixel(b: Array[Byte], w: Int, x: Int, y: Int): (Int, Int, Int) = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val i = 54 + y * rowSize + x * 3
    ((b(i) & 0xff), (b(i + 1) & 0xff), (b(i + 2) & 0xff))
  }

  test("resizeBmp: nearest-neighbor sampling exact on coordinate-tagged pixels") {
    // upscale 2x2 -> 4x4: each src pixel replicates into a 2x2 block
    val up = Multimodal.resizeBmp(coordBmp(2, 2), 4, 4).get
    assert(Multimodal.decodeHeader(up) === ("bmp", 4, 4))
    for (y <- 0 until 4; x <- 0 until 4)
      assert(pixel(up, 4, x, y) === (x / 2, y / 2, 0xAA), s"up($x,$y)")
    // downscale 4x4 -> 2x2: picks src (0,0), (2,0), (0,2), (2,2)
    val down = Multimodal.resizeBmp(coordBmp(4, 4), 2, 2).get
    for (y <- 0 until 2; x <- 0 until 2)
      assert(pixel(down, 2, x, y) === (2 * x, 2 * y, 0xAA), s"down($x,$y)")
    // 1x1 collapses to src (0,0); identity resize is byte-identical
    assert(pixel(Multimodal.resizeBmp(coordBmp(3, 3), 1, 1).get, 1, 0, 0) === (0, 0, 0xAA))
    assert(Multimodal.resizeBmp(coordBmp(3, 2), 3, 2).get.toSeq === coordBmp(3, 2).toSeq)
    // non-BMP and truncated payloads refuse instead of mis-parsing
    assert(Multimodal.resizeBmp("not an image".getBytes, 2, 2).isEmpty)
    assert(Multimodal.resizeBmp(coordBmp(4, 4).take(60), 2, 2).isEmpty)
  }

  test("resizeImages: BMPs resize, non-BMP rows pass through unchanged") {
    import spark.implicits._
    val mixed = Seq(
      Multimodal.MediaRecord(1L, "image/bmp", Multimodal.encodeBmp(5, 3, seed = 7L)),
      Multimodal.MediaRecord(2L, "text/plain", "just text".getBytes)
    ).toDS().toDF()
    val out = Multimodal.resizeImages(spark, mixed, 8, 8).collect()
      .map(r => r.media_id -> r).toMap
    assert(Multimodal.decodeHeader(out(1L).payload) === ("bmp", 8, 8))
    assert(out(2L).payload.toSeq === "just text".getBytes.toSeq)
  }
}
