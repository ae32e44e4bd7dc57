package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Raw media payload row: opaque bytes + id. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Typed metadata extracted from a media payload. */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    channels: Int,
    format: String)

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata.
  *
  * The Spark-side plumbing is real — binary schema, typed Dataset, batched
  * `mapPartitions` (the shape a vectorized codec wants: amortize codec init
  * per batch, not per row). The codec itself is a STUB: no image/audio
  * libraries ship in this container, so `fakeDecode` derives deterministic
  * metadata from the bytes. Swap `fakeDecode` for a real decoder without
  * touching any plumbing.
  */
object Multimodal {

  /** Attach the opaque binary payload column (here: utf-8 bytes stand in for
    * an image blob fetched from object storage).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Batched metadata extraction over the binary column. */
  def decodeMeta(spark: SparkSession, withPayload: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "codec" invocation per batch — this is where a real
          // vectorized decode (libjpeg/ffmpeg/...) would run
          batch.iterator.map(fakeDecode)
        }
      }
  }

  /** Audio-style overlapping byte windows over the binary payload: frame i
    * covers `[i·hop, i·hop + win)`, tail frames run short — the framing
    * every audio featurizer (STFT, wav2vec-style encoders) applies before
    * the model. One explode, frame rows scale out with the corpus; the
    * per-frame DSP/encode hangs off the emitted (payload-slice) rows the
    * same way the image decode hangs off [[decodeMeta]]'s batches.
    */
  def frameWindows(
      withPayload: DataFrame,
      win: Int = 256,
      hop: Int = 128): DataFrame = {
    require(win >= 1 && hop >= 1, "window and hop must be positive")
    withPayload
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(length(col("payload")) - 1, lit(0)), lit(hop)))
          .as(Seq("frame_idx", "off")),
        col("payload"))
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, off + 1, $win)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(hex(col("frame"))).as("frame_md5"))
  }

  /** Frame sampling over video-ish payloads: every `step`-th frame becomes a
    * row with its offset metadata. The explode is the Spark-idiomatic shape
    * (frame rows scale out; no per-doc driver loop); the frame *count* comes
    * from the STUB container parse (bytes/`bytesPerFrame`) — a real
    * implementation reads the container index here, and the per-frame
    * decode hangs off the emitted (payload, frame_idx) rows.
    */
  def sampleFrames(
      withPayload: DataFrame,
      step: Int = 4,
      bytesPerFrame: Int = 100): DataFrame = {
    val nFrames = expr(s"octet_length(payload) div $bytesPerFrame")
    withPayload
      .withColumn("n_frames", nFrames)
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * bytesPerFrame)
  }

  /** STUB decode: deterministic fake metadata derived from the payload bytes
    * (media codecs are not available in this environment). A real
    * implementation parses the container header here.
    */
  private def fakeDecode(r: MediaRecord): MediaMeta = {
    val n = r.payload.length.toLong
    val first = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else 0L
    val format = (n % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    MediaMeta(r.doc_id, n, 64L + n % 512, 64L + first % 512, 3, format)
  }
}
