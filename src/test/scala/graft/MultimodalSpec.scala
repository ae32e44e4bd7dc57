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

  test("binary schema survives the round trip") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val payload = Multimodal.attachPayload(docs)
    assert(payload.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(payload.head().getAs[Array[Byte]]("payload").sameElements("x".getBytes))
  }
}
