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

  /** Image-style fixed-grid tiling over the binary payload: the payload is
    * treated as a rowStride-bytes-per-row raster (the STUB geometry — a
    * real implementation reads width × bytes-per-pixel from the container
    * header) and cut into `tile` × `tile`-byte tiles. Tile (r, c) gathers,
    * for every raster row it spans, the `tile`-byte slice starting at
    * column c·tile — the patch layout every vision pipeline (ViT
    * patchification, tile-based thumbnailing) applies before the model.
    *
    * Shape at scale: the (r, c) grid explodes to tile ROWS (tiles scale
    * out with the corpus, like [[frameWindows]] frames); each tile's bytes
    * are assembled by a per-row `aggregate` fold over its raster rows —
    * local arithmetic on the exploded row, no shuffle, no driver loop. The
    * per-tile decode/encode hangs off the emitted tile rows exactly like
    * the frame decode hangs off [[sampleFrames]]'s.
    */
  def tileGrid(
      withPayload: DataFrame,
      rowStride: Int = 64,
      tile: Int = 16): DataFrame = {
    require(rowStride >= 1 && tile >= 1 && tile <= rowStride,
      "tile must fit within the row stride")
    // raster rows, then the bounding tile grid (short tails keep partial
    // tiles — the standard edge-padding decision is the model's, not the
    // tiler's). Integer div only: ANSI mode, and fractional arithmetic
    // would not replay exactly in the oracle.
    val W = rowStride
    val T = tile
    withPayload
      .filter(length(col("payload")) > 0)
      .withColumn("n_rows", expr(s"(octet_length(payload) + ${W - 1}) div $W"))
      .select(col("doc_id"), col("payload"), col("n_rows"),
        explode(sequence(lit(0),
          expr(s"(n_rows + ${T - 1}) div $T") - 1)).as("tile_r"))
      .select(col("doc_id"), col("payload"), col("n_rows"), col("tile_r"),
        explode(sequence(lit(0),
          expr(s"(least(octet_length(payload), $W) + ${T - 1}) div $T") - 1))
          .as("tile_c"))
      // assemble the tile: one slice per raster row it spans, folded
      // locally (referenced ONCE — HOF re-inlining is a measured trap)
      .withColumn("tile_bytes", expr(
        s"""aggregate(
           |  sequence(tile_r * $T, least((tile_r + 1) * $T, n_rows) - 1),
           |  cast(X'' as binary),
           |  (acc, y) -> concat(acc, substring(payload, cast(y * $W + tile_c * $T + 1 as int), $T)))
           |""".stripMargin))
      .filter(length(col("tile_bytes")) > 0)
      .select(col("doc_id"),
        col("tile_r").cast("long").as("tile_r"),
        col("tile_c").cast("long").as("tile_c"),
        length(col("tile_bytes")).cast("long").as("tile_len"),
        md5(hex(col("tile_bytes"))).as("tile_md5"))
  }

  /** Scene-cut detection over video-ish payloads: the payload is cut into
    * consecutive `frameBytes`-byte frames (the STUB container geometry,
    * like [[sampleFrames]]), and each frame is compared BYTE-FOR-BYTE
    * against its predecessor; a frame opening a new scene is one whose
    * changed-byte ratio exceeds `threshold` (the classic pixel-difference
    * shot-boundary heuristic — a real pipeline runs it on decoded luma
    * planes; the frame alignment, lag comparison and ratio logic here are
    * exactly that pipeline's shape). The first frame of every payload is
    * a cut by definition.
    *
    * Scale shape: one explode to frame rows, one per-doc lag window —
    * frames scale out with the corpus, the byte compare is per-row local
    * arithmetic (hex space, so the oracle replays it character-pair by
    * character-pair).
    */
  def sceneCuts(
      withPayload: DataFrame,
      frameBytes: Int = 256,
      threshold: Double = 0.5): DataFrame = {
    require(frameBytes >= 1)
    val frames = withPayload
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(length(col("payload")) - 1, lit(0)), lit(frameBytes)))
          .as(Seq("frame_idx", "off")),
        col("payload"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        hex(expr(s"substring(payload, off + 1, $frameBytes)")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("hp", lag(col("h"), 1).over(w))
      // changed bytes vs the previous frame: hex character pairs compared
      // positionally; a length difference counts its excess bytes as
      // changed. Referenced once (HOF re-inlining trap).
      .withColumn("diff_bytes", when(col("hp").isNotNull, expr(
        """aggregate(
          |  sequence(0, int(least(length(h), length(hp)) div 2 - 1)),
          |  0L,
          |  (acc, i3) -> acc + IF(substring(h, i3 * 2 + 1, 2) = substring(hp, i3 * 2 + 1, 2), 0L, 1L))
          |+ abs(length(h) - length(hp)) div 2""".stripMargin)))
      .select(col("doc_id"), col("frame_idx"),
        expr("cast(length(h) div 2 as bigint)").as("frame_len"),
        col("diff_bytes"),
        (col("hp").isNull ||
          col("diff_bytes") > lit(threshold) * (length(col("h")) / lit(2.0)))
          .as("is_cut"))
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

  /** VAD-style activity segmentation over audio-ish payloads: the payload
    * splits into fixed-size frames, each frame's "energy" is the exact
    * integer sum of its byte values, frames above `minAvgByte × frame_len`
    * are active, and runs of consecutive active frames merge into
    * segments (gaps-and-islands) — the voice-activity pass that turns a
    * raw audio blob into trainable utterance spans, with byte sums
    * standing in for the stubbed DSP (same posture as [[sceneCuts]]).
    *
    * All arithmetic is integer-exact (no float thresholds), so the oracle
    * replays it byte-for-byte in hex space. Frame rows scale out through
    * one explode; the island numbering is a per-doc window.
    */
  def energySegments(
      withPayload: DataFrame,
      frameBytes: Int = 256,
      minAvgByte: Int = 96): DataFrame = {
    require(frameBytes >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    withPayload
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"),
        posexplode(sequence(lit(0),
          greatest(length(col("payload")) - 1, lit(0)), lit(frameBytes)))
          .as(Seq("frame_idx", "off")),
        col("payload"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(payload, off + 1, $frameBytes)").as("fr"))
      .withColumn("flen", length(col("fr")).cast("long"))
      // exact integer frame energy: one codegen'd byte scan
      // (graft.plans.ByteCellSums, n=1 ≡ whole-frame unsigned-byte sum).
      // The previous hex + aggregate/conv(substring) walk evaluated an
      // interpreted lambda per byte — the q237/q378 trap.
      .withColumn("energy",
        element_at(graft.plans.BytesExpressions.byteCellSums(
          col("fr"), lit(1)), 1))
      .filter(col("energy") > lit(minAvgByte.toLong) * col("flen"))
      .withColumn("__new",
        when(lag(col("frame_idx"), 1).over(w) === col("frame_idx") - 1, 0L)
          .otherwise(1L))
      .withColumn("seg_idx",
        sum(col("__new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("doc_id"), col("seg_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("seg_energy"))
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

  /** BLOB NEAR-DUP PAIRS via content-defined BYTE chunks — the binary
    * column's answer to "these two assets are mostly the same file":
    * re-encoded, header-patched or appended-to blobs share most of
    * their CDC chunks even though whole-payload hashes (q237's pHash
    * is perceptual, q21's md5 is exact) see different objects. The
    * payload hexifies (2 chars/byte, engine-portable) and runs the
    * q179 rolling-hash cut machinery (codegen `XsWindowCuts`); each
    * blob collapses to its DISTINCT chunk-hash set; pairs form ONLY
    * inside a shared chunk hash (bucketed, never all-pairs), with a
    * document-frequency cap dropping boilerplate chunks (a chunk in >
    * `maxDf` blobs is shared STRUCTURE, not shared identity — the
    * stop-chunk filter, same reasoning as stopword removal). Emits
    * pairs with `minShared`+ shared chunks and containment
    * (shared / smaller set) ≥ `minContainment`.
    */
  def blobChunkPairs(
      docs: DataFrame,
      minShared: Int = 2,
      minContainment: Double = 0.5,
      maxDf: Int = 50): DataFrame = {
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val hexed = attachPayload(docs)
      .select(col("doc_id"), hex(col("payload")).as("bh"))
    val ch = Dedup.contentChunks(hexed, "doc_id", "bh",
        w = 16, modulus = 64)
      .select(col("doc_id"), col("chunk_hash")).distinct()
    val dfreq = ch.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("nd"))
    val kept = ch.join(dfreq, Seq("chunk_hash"))
      .filter(col("nd") <= maxDf)
      .select(col("doc_id"), col("chunk_hash"))
      .localCheckpoint(true) // sizes + the pair join read it
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
    val pairs = kept
      .join(kept.select(col("doc_id").as("id_b"), col("chunk_hash")),
        Seq("chunk_hash"))
      .filter(col("doc_id") < col("id_b"))
      .groupBy(col("doc_id").as("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_chunks"))
    val cont = dbl(col("shared_chunks")) /
      dbl(least(col("n_a"), col("n_b")))
    // sizes is blob-count-sized (data, not parameters) — shuffle joins,
    // never a broadcast
    pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("nc").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("nc").as("n_b")),
        Seq("id_b"))
      .filter(col("shared_chunks") >= minShared &&
        cont >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared_chunks"),
        col("n_a"), col("n_b"), round(cont, 6).as("containment"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
