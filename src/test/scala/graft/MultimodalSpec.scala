package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "ABCD some payload text"),
    (2L, "xy")
  ).toDF("doc_id", "text").transform(Multimodal.mediaFromDocuments)

  test("extractFeatures: stubbed decode dims + real byte length and checksum") {
    val r = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    assert(r(1L).byte_len === 22)
    assert(r(1L).width === 'A' * 256 + 'B')
    assert(r(1L).height === 'C' * 256 + 'D')
    assert(r(2L).width === 'x' * 256 + 'y')
    assert(r(2L).height === 0)    // out-of-range bytes default to 0
    val crc = new java.util.zip.CRC32()
    crc.update("ABCD some payload text".getBytes)
    assert(r(1L).checksum === crc.getValue)
  }

  test("sampleOffsets: generator emits in-range offsets only") {
    val r = rowSet(Multimodal.sampleOffsets(media, Seq(1, 3, 100))
      .select("media_id", "pos", "sample_hex"))
    assert(r === Set(
      Seq(1L, 1, "41"), Seq(1L, 3, "43"),   // 'A', 'C'
      Seq(2L, 1, "78")))                     // 'x'; offsets 3/100 out of range
  }
}
