package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("payload is the utf-8 bytes; metadata is derived from them") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.attachPayload(docs)).head()
    assert(meta.doc_id == 7L)
    assert(meta.n_bytes == 11L)
    assert(meta.width == 64L + 11L % 512)
    assert(meta.height == 64L + 'h'.toLong)
    assert(meta.channels == 3)
    assert(meta.format == "webp") // 11 % 3 == 2
  }

  test("tileGrid gathers the exact bytes of each grid tile") {
    // 20-char payload, 8-byte row stride, 4-byte tiles:
    // raster rows "abcdefgh" / "ijklmnop" / "qrst" (short tail)
    // → 3 raster rows → 1 tile row (ceil(3/4)), 2 tile cols.
    // tile (0,0) = rows' [0,4) slices: "abcd"+"ijkl"+"qrst"
    // tile (0,1) = rows' [4,8) slices: "efgh"+"mnop" (tail row is short)
    val docs = Seq((1L, "abcdefghijklmnopqrst")).toDF("doc_id", "text")
    val tiles = Multimodal.tileGrid(
        Multimodal.attachPayload(docs), rowStride = 8, tile = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getString(4))).toMap
    def m(s: String) = {
      val hex = s.getBytes("UTF-8").map("%02X".format(_)).mkString
      java.security.MessageDigest.getInstance("MD5").digest(hex.getBytes)
        .map("%02x".format(_)).mkString
    }
    assert(tiles.keySet == Set((0L, 0L), (0L, 1L)))
    assert(tiles((0L, 0L)) == (12L, m("abcdijklqrst")))
    assert(tiles((0L, 1L)) == (8L, m("efghmnop")))
  }

  test("binary schema survives the round trip") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val payload = Multimodal.attachPayload(docs)
    assert(payload.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(payload.head().getAs[Array[Byte]]("payload").sameElements("x".getBytes))
  }
}
