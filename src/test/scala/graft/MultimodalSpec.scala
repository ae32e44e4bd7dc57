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

  test("sceneCuts: repeated frames are no cut, a changed frame is") {
    // 4-byte frames: "aaaa" | "aaaa" | "bbbb" | "bbba" | "cc" (short tail)
    // f0: first frame → cut. f1: identical → 0 diffs, no cut.
    // f2: all 4 bytes differ → cut. f3: 1 of 4 differs (0.25 ≤ 0.5) → no
    // cut. f4: short tail vs "bbba": 2 compared bytes differ ('c'≠'b')
    // + 2 excess = 4 > 0.5·2 → cut.
    val docs = Seq((1L, "aaaaaaaabbbbbbbacc")).toDF("doc_id", "text")
    val out = Multimodal.sceneCuts(
        Multimodal.attachPayload(docs), frameBytes = 4, threshold = 0.5)
      .orderBy(col("frame_idx")).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (0L, -1L, true), (1L, 0L, false), (2L, 4L, true),
      (3L, 1L, false), (4L, 4L, true)))
  }

  test("energySegments finds byte-exact active islands") {
    // 2-byte frames, threshold avg > 96: "zz" (244) and "ZZ" (180) frames —
    // actives are frames 0,1 ('zz','zz') and 3 ('zz') around the quiet
    // 'ZZ' frame 2 → two segments, energies 488 and 244
    val docs = Seq((1L, "zzzzZZzz")).toDF("doc_id", "text")
    val out = Multimodal.energySegments(
      Multimodal.attachPayload(docs), frameBytes = 2, minAvgByte = 96)
      .orderBy("seg_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 0L, 1L, 2L, 488L), (2L, 3L, 3L, 1L, 244L)))
  }

  test("binary schema survives the round trip") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val payload = Multimodal.attachPayload(docs)
    assert(payload.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(payload.head().getAs[Array[Byte]]("payload").sameElements("x".getBytes))
  }

  test("blobChunkPairs: identical payloads pair at containment 1, " +
    "unrelated blobs never pair") {
    import spark.implicits._
    val body = (1 to 12).map(i =>
      s"paragraph $i with enough repeated filler bytes to cut chunks")
      .mkString(" ")
    val other = (1 to 12).map(i =>
      s"completely different content block $i nothing shared here at all")
      .mkString(" ")
    val docs = Seq((1L, body), (2L, body), (3L, other))
      .toDF("doc_id", "text")
    val got = Multimodal.blobChunkPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.contains((1L, 2L)), "identical blobs must pair")
    val p = got((1L, 2L))
    assert(p.getLong(2) == p.getLong(3) && p.getLong(3) == p.getLong(4))
    assert(p.getDouble(5) == 1.0)
    assert(!got.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      "an unrelated blob shares no chunks")
  }
}
