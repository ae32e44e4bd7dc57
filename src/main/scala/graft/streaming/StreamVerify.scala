package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Batch-verifiable Structured Streaming runs.
  *
  * Each helper starts a REAL streaming query over the events parquet with
  * `Trigger.AvailableNow`, drains it, and returns the result as a plain
  * DataFrame so the driver's DuckDB oracle can hash-compare it against the
  * equivalent batch SQL. This closes the gap where streaming operators were
  * only ScalaTest-covered: the same correctness gate now exercises the
  * streaming engine.
  *
  * Scale notes: the memory-sink Complete-mode shape is the VERIFICATION
  * harness — production deployments pair the same aggregations with
  * append-mode watermarked sinks (EventsStream.toLake). Complete mode is
  * used here because append mode only emits windows the watermark has
  * passed, which would make the result depend on micro-batch boundaries
  * rather than on the data.
  */
object StreamVerify {

  private val n = new AtomicLong(0)

  /** Post-drain quiescence: assert the drain really terminated its query,
    * then unload every loaded state-store provider and stop the
    * maintenance task. Terminated queries otherwise leave their providers
    * loaded, and the background maintenance thread pool keeps waking up to
    * snapshot/clean them — measured as 2–7× timing noise on whatever
    * innocent query the bench happens to run next (r3 verdict: q70 logged
    * 2.64s vs 0.37s isolated). The next streaming query lazily restarts
    * maintenance, so this is free for correctness.
    */
  private def settle(spark: SparkSession): Unit = {
    require(spark.streams.active.isEmpty,
      s"streaming queries still active after drain: " +
        spark.streams.active.map(_.name).mkString(", "))
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  /** Drain a memory-sink streaming query and return its table.
    *
    * Stateful operators keep one state store per shuffle partition; at the
    * verification data volume 32 stores are pure overhead (measured ~2×
    * on the stream-stream join), so the drain runs with 8 and restores the
    * session setting after. A production deployment sizes this to state
    * volume, not to this harness. The checkpoint is fresh per drain, so
    * the state partitioning is free to differ between runs.
    */
  private def drain(spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_sv_${n.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // detach the result from the memory sink before the sink table is
      // dropped below
      spark.table(name).localCheckpoint(true)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      // drop unconditionally — a failed drain would otherwise leave the
      // sink table (and any partial results) pinned in driver memory for
      // the session's lifetime
      spark.catalog.dropTempView(name)
      settle(spark)
    }
  }

  /** Hourly tumbling-window aggregation, streamed. Exact-decimal sums keep
    * the result hash-identical to the batch q14 aggregation.
    */
  def hourly(spark: SparkSession, eventsPath: String): DataFrame = {
    val agg = EventsStream.readEvents(spark, eventsPath)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    drain(spark, agg, "complete")
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Gap-based sessionization via the built-in `session_window` aggregation
    * (30-minute gap), streamed. Session merging is INCLUSIVE at the gap
    * boundary — an event exactly `gap` after the previous one EXTENDS the
    * session (its interval touches the session end) — identical to the
    * batch q15 `diff > gap` new-session rule.
    */
  def sessions(spark: SparkSession, eventsPath: String): DataFrame = {
    val agg = EventsStream.readEvents(spark, eventsPath)
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
    drain(spark, agg, "complete")
      .select(col("user_id"), col("start_sec"), col("end_sec"), col("n_events"))
  }

  /** Built-in `session_window` aggregation in APPEND mode: a session is
    * emitted exactly once, when the event-time watermark passes its close
    * (end + gap). Completes the session-mode matrix next to the
    * complete-mode drain ([[sessions]], q54) and the custom-state
    * update-mode path ([[sessionsUpdateMode]], q135). Needs
    * sentinel-staged input: the far-future sentinel rows advance the
    * watermark past every real session's close; their own sessions can
    * never close (the watermark trails their event time) so they are
    * never emitted — the id filter is defensive only.
    */
  def sessionsAppendMode(spark: SparkSession, eventsPath: String): DataFrame = {
    val agg = EventsStream.readEvents(spark, eventsPath)
      .withWatermark("ts", "2 hours")
      .withColumn("sec", unix_timestamp(col("ts")))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"))
    drain(spark, agg, "append")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("start_sec"), col("end_sec"),
        col("n_events"))
  }

  /** Streaming exact dedup: first occurrence of each (user_id, event_type)
    * is emitted as it streams past; state is bounded by the watermark. The
    * projection keeps ONLY the key columns, so the result equals batch
    * DISTINCT regardless of which physical row won the race per key.
    */
  def dedupPairs(spark: SparkSession, eventsPath: String): DataFrame = {
    val distinctPairs = EventsStream.readEvents(spark, eventsPath)
      .select(col("ts"), col("user_id"), col("event_type"))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    // final key distinct: with multiple micro-batches the 2-hour watermark
    // can evict state between batches and re-emit a key recurring later, so
    // the drained stream equals batch DISTINCT only after collapsing those
    // re-emissions — this keeps the result batch-equivalent regardless of
    // how the source files were batched
    drain(spark, distinctPairs, "append").distinct()
  }

  /** Stream-static join: the event stream enriched against a static
    * dimension DataFrame (re-read per micro-batch by the engine; the dim
    * broadcast-joins under the session threshold), then aggregated.
    */
  def staticJoin(spark: SparkSession, eventsPath: String, dim: DataFrame, dimKey: String): DataFrame = {
    val agg = EventsStream.readEvents(spark, eventsPath)
      .join(dim, col("user_id") === col(dimKey))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    drain(spark, agg, "complete")
  }

  /** Stream-stream inner join with an event-time interval condition:
    * purchases matched to same-user clicks in the preceding hour. Both
    * sides carry watermarks (bounding join state); inner-join matches emit
    * as soon as both rows arrive, so an AvailableNow drain yields exactly
    * the batch join result.
    */
  def streamStreamJoin(spark: SparkSession, eventsPath: String): DataFrame = {
    val purchases = EventsStream.readEvents(spark, eventsPath)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = EventsStream.readEvents(spark, eventsPath)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= expr("p_ts - INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
    drain(spark, joined, "append")
  }

  /** Stream-stream LEFT OUTER interval join: every purchase, joined to
    * same-user clicks in the preceding hour; purchases with no qualifying
    * click emit with a NULL click id.
    *
    * Outer-null emission is WATERMARK-DRIVEN: an unmatched left row is held
    * in state until the watermark passes the end of its join window, so for
    * the trailing watermark-delay of a bounded directory a plain drain
    * would silently drop the tail's unmatched rows. The caller therefore
    * stages one far-future SENTINEL row per side, with DISTINCT out-of-band
    * user ids so the two sentinels cannot join each other. The sentinels
    * flow through the watermark operators, advancing the global watermark
    * past every real row's window, and are never emitted themselves: the
    * watermark always lags max event time by the 2-hour delay, so it never
    * passes the sentinels' own timestamps and they simply age in state
    * until the drain ends. (Filtering them out between the watermark and
    * the join does NOT work — the optimizer pushes the filter below the
    * watermark operator, hiding the sentinel from the watermark stats.)
    * The engine's trailing no-data micro-batch evicts and emits the held
    * unmatched real rows, making the drain batch-left-join-equivalent.
    */
  def streamStreamOuterJoin(spark: SparkSession, eventsPath: String): DataFrame = {
    val ev = EventsStream.readEvents(spark, eventsPath)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= expr("p_ts - INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("p_id"), col("c_id"))
    drain(spark, joined, "append")
  }

  /** Stream-stream FULL OUTER interval join — completes the join matrix
    * (inner q77 / left q92 / full here): matched purchase–click pairs
    * emit normally; purchases without a qualifying click AND clicks that
    * matched no purchase each emit exactly once, null-padded, when the
    * watermark passes their join window. Both sides' state is
    * watermark-bounded; the caller stages the q92 sentinels so every
    * real row's window closes inside the drain.
    */
  def streamStreamFullOuterJoin(spark: SparkSession, eventsPath: String): DataFrame = {
    val ev = EventsStream.readEvents(spark, eventsPath)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= expr("p_ts - INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "full_outer")
      .select(col("p_id"), col("c_id"))
    // the far-future sentinel rows themselves surface as unmatched once
    // their own window closes against the other sentinel's watermark —
    // filter them by their out-of-band negative event ids
    drain(spark, joined, "append")
      .filter((col("p_id").isNull || col("p_id") >= 0) &&
        (col("c_id").isNull || col("c_id") >= 0))
  }

  /** The flatMapGroupsWithState sessionizer ([[EventsStream.sessionize]])
    * drained through the oracle gate. Append-mode custom state only emits
    * a session when the event-time watermark passes its close, so the
    * input must be sentinel-staged (see the q92 staging): the far-future
    * sentinel advances the watermark past every real session's timeout and
    * Spark's AvailableNow runs the extra state-flush batch. The sentinel
    * users' own sessions can never flush (the watermark always lags their
    * event time) and are additionally filtered by their out-of-band ids.
    */
  def customStateSessions(spark: SparkSession, eventsPath: String): DataFrame = {
    val sessions = EventsStream
      .sessionize(spark, EventsStream.readEvents(spark, eventsPath))
      .toDF()
    drain(spark, sessions, "append").filter(col("user_id") >= 0)
  }

  /** Update-mode sessionization ([[EventsStream.sessionizeUpdates]])
    * drained through `foreachBatch`: a session whose events span
    * micro-batches is emitted several times — each emission the CURRENT
    * merged state, superseding the last. The drain tags every emission
    * with its batchId and keeps exactly the rows no LATER batch
    * superseded: an emission is superseded iff the same user gets an
    * overlapping session in a later batch (extension and gap-bridging
    * merges both overlap what they replace, since merging only ever
    * widens a session over its events). The surviving set must equal
    * batch sessionization — that equality IS the update-mode emission
    * contract, and the oracle hashes it.
    *
    * The caller stages the input as multiple files and the source reads
    * with maxFilesPerTrigger=1, so cross-batch session growth genuinely
    * happens. The supersede pruning equi-joins on user_id; per-user
    * session counts are small, so the quadratic term is per-key bounded.
    */
  def sessionsUpdateMode(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val sessions = EventsStream.sessionizeUpdates(spark,
      EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)))
      .toDF()
    val outDir = s"$scratchDir/updates"
    val q = sessions.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val ups = spark.read.parquet(outDir).localCheckpoint(true)
    val later = ups.select(col("user_id").as("u2"),
      col("start_sec").as("s2"), col("end_sec").as("e2"),
      col("batch_id").as("b2"))
    ups.join(later,
        col("user_id") === col("u2") && col("b2") > col("batch_id") &&
          col("s2") <= col("end_sec") && col("e2") >= col("start_sec"),
        "left_anti")
      .select(col("user_id"), col("start_sec"), col("end_sec"),
        col("n_events").cast("long").as("n_events"))
  }

  /** Per-key alerting against a trailing baseline, on FINALIZED windows
    * only: hourly counts per event_type aggregated in APPEND mode — a
    * window emits exactly once, when the event-time watermark passes its
    * end (sentinel-staged input advances the watermark past every real
    * window; the sentinels' own far-future windows can never finalize, so
    * they are never emitted and need no filtering) — then each finalized
    * hour is compared to the mean of its key's previous 24 finalized
    * hours. This is the production alerting shape: alerts fire on CLOSED
    * windows, never on partial counts that a complete-mode drain (q53)
    * would still be updating; the trailing baseline is a per-key rows
    * window over the emitted stream, metadata-sized state per key.
    */
  def hourlyAlerts(spark: SparkSession, eventsPath: String): DataFrame = {
    val hourly = EventsStream.readEvents(spark, eventsPath)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val finalized = drain(spark, hourly, "append")
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    finalized
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("baseline", avg(col("n")).over(w))
      .select(col("hour"), col("event_type"), col("n"), col("n_prior"),
        round(col("baseline"), 6).as("baseline"),
        (col("n_prior") >= 3 &&
          col("n").cast("double") > col("baseline") * 2.0)
          .cast("int").as("alert"))
  }

  /** Exactly-once streaming sink: every micro-batch commits into the
    * transaction-log lake with its batchId as the idempotency tag, so a
    * re-delivered batch (engine restart replays the last uncommitted
    * epoch) lands exactly once. After the drain a deliberate duplicate
    * "batch-0" commit is attempted with a poison frame — if the tag logic
    * ever regressed, the poison rows would double the counts and the
    * oracle hash would catch it.
    */
  def exactlyOnceLake(
      spark: SparkSession,
      eventsPath: String,
      lakePath: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(lakePath)
    val ev = EventsStream.readEvents(spark, eventsPath)
      .select(col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd").as("date_id"))
    val q = ev.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lakePath, batch, tag = s"batch-$id")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val poison = spark.range(1).selectExpr("id AS event_id",
      "'poison' AS event_type", "0.0 AS value", "'1970-01-01' AS date_id")
    graft.sources.TxLake.commit(spark, lakePath, poison, tag = "batch-0")
    graft.sources.TxLake.readSnapshot(spark, lakePath)
  }

  /** Continuous bronze load drained end-to-end: micro-batches land in a
    * `date_id/batch_id`-partitioned lake via idempotent delete-insert, then
    * the lake is read back and aggregated. The lake and checkpoint are
    * per-invocation scratch so re-runs verify the full pipeline, not
    * leftovers (replay idempotency itself is covered in StreamingSpec).
    */
  /** Checkpointed incremental resume across two `Trigger.AvailableNow`
    * runs — the modern batch-cadence streaming posture (a daily job that
    * is a stream under the hood): run 1 sees only `firstFile`, drains and
    * stops; `secondFile` arrives; run 2 starts from the SAME checkpoint
    * and must process only the new file. The returned lake aggregate is
    * oracle-checked against the batch answer over BOTH halves, which
    * proves exactly-once resume by construction: re-reading the first
    * half would double its rows, dropping it would lose them — either
    * corrupts the hash.
    */
  def incrementalResume(
      spark: SparkSession,
      firstFile: String,
      secondFile: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val stage = java.nio.file.Paths.get(scratchDir, "stage")
    java.nio.file.Files.createDirectories(stage)
    val lake = s"$scratchDir/lake"
    def run(): Unit = {
      val q = EventsStream.toLake(EventsStream.readEvents(spark, stage.toString), lake)
        .option("checkpointLocation", s"$scratchDir/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(firstFile), stage.resolve("a.parquet"))
    run()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(secondFile), stage.resolve("b.parquet"))
    run()
    settle(spark)
    graft.sources.PartitionedLake.read(spark, lake)
      .groupBy(col("date_id").cast("string").as("date_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
  }

  /** Streaming maintenance of a Count-Min sketch store: each micro-batch
    * computes its own (row, bucket) cell increments and lands them as an
    * exactly-once tagged TxLake commit; the standing store is merge-on-
    * read (cells are additive, so summing per (row, bucket) across batch
    * files IS the whole-stream sketch — the same union-addability as
    * q169's batch merge, now maintained incrementally by a stream). The
    * final probe compares top-k exact counts against the sketch estimate;
    * because addition commutes, the result is INDEPENDENT of micro-batch
    * boundaries, which is what makes it oracle-checkable.
    */
  def cmsMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      depth: Int = 4,
      width: Int = 256,
      k: Int = 20): DataFrame = {
    import graft.plans.TextHashExpressions.xsMix
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/cells"
    def cellsOf(df: DataFrame): DataFrame = df
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("row_i"),
          xsMix(col("user_id"), lit(i.toLong))
            .bitwiseAND(lit((width - 1).toLong)).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .agg(sum(col("n")).as("cell_n"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          cellsOf(batch).coalesce(1), tag = s"cms-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cell_n")).as("cell_n"))
    val exact = spark.read.parquet(eventsPath)
      .groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
    val top = exact.orderBy(col("true_n").desc, col("user_id")).limit(k)
    top.select(col("user_id"), col("true_n"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("row_i"),
          xsMix(col("user_id"), lit(i.toLong))
            .bitwiseAND(lit((width - 1).toLong)).as("bucket"))): _*)).as("rb"))
      .select(col("user_id"), col("true_n"),
        col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .join(merged, Seq("row_i", "bucket"))
      .groupBy(col("user_id"), col("true_n"))
      .agg(min(col("cell_n")).as("cms_est"))
      .orderBy(col("true_n").desc, col("user_id"))
  }

  /** STREAMING HyperLogLog maintenance: each micro-batch lands its
    * register MAXes (graft.operators.Sketches.hllRegisters — ≤ 256 rows
    * per group per batch) as an exactly-once tagged lake commit; the
    * standing register table is merge-on-read MAX per (group, bucket).
    * MAX commutes and is idempotent, so batch boundaries are invisible
    * and the drained estimate replays as the WHOLE-CORPUS sketch in the
    * oracle — q379's exact SQL, now fed by a stream. This is the
    * streaming-ingest shape of a distinct-count stats surface: registers
    * maintain themselves as a side effect of ingestion and the estimate
    * reads only the (groups × 256)-row store.
    */
  def hllMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/regs"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("user_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          graft.operators.Sketches
            .hllRegisters(batch, "event_type", "user_id").coalesce(1),
          tag = s"hll-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val regs = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("g"), col("j")).agg(max(col("m")).as("m"))
    val merged = regs.groupBy(col("j")).agg(max(col("m")).as("m"))
      .withColumn("g", lit("(all)")).select("g", "j", "m")
    val est = graft.operators.Sketches.hllEstimate(regs.unionByName(merged))
    val ev = spark.read.parquet(eventsPath)
    val exact = ev.groupBy(col("event_type").as("g"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
      .unionByName(ev.agg(count_distinct(col("user_id")).as("n_exact"))
        .withColumn("g", lit("(all)")).select("g", "n_exact"))
    est.join(exact, "g")
      .withColumn("rel_error",
        round((col("estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6))
      .orderBy(col("g"))
  }

  /** STREAMING MERKLE-LEAF maintenance: each micro-batch lands its
    * partial leaf census (XOR fingerprint + count per content-addressed
    * bucket) as an exactly-once lake commit; XOR and count both merge
    * across arbitrary row slices, so the merge-on-read store equals the
    * WHOLE-CORPUS census no matter how ingestion was batched — the
    * anti-entropy surface (q401) maintained as a side effect of
    * ingestion, ready to reconcile against any other system's copy
    * with two longs. Oracle = the batch leaf census of all events.
    */
  def merkleMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      buckets: Int = 1024): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/leaves"
    def prep(df: DataFrame): DataFrame = df.select(col("event_id"),
      col("user_id"), col("event_type"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
        .as("cents"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          graft.operators.Reconcile.merkleLeaves(prep(batch),
            Seq("event_id", "user_id", "event_type", "cents"), buckets)
            .coalesce(1),
          tag = s"merkle-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("leaf"))
      .agg(sum(col("n")).as("n_rows"), expr("bit_xor(fp)").as("fp"))
      .orderBy(col("leaf"))
  }

  /** STREAMING SLIDING-HLL maintenance: micro-batches land
    * (bucket, ρ, max-ts) cell increments (Sketches.slidingHllCells —
    * ≤ 256·45 rows per batch) as exactly-once commits; MAX over ts
    * commutes, so the merged cell store answers distinct counts for ANY
    * suffix window at any moment — q399's two-window report, fed by a
    * stream, gated by q399's identical oracle (batch boundaries must be
    * invisible).
    */
  def slidingHllMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/cells"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("ts").cast("long").as("t"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          graft.operators.Sketches.slidingHllCells(
            batch.withColumn("g", lit("all")), "g", "user_id", "t")
            .coalesce(1),
          tag = s"shll-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val cells = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("j"), col("rho")).agg(max(col("max_ts")).as("max_ts"))
    // the staged stream files carry NTZ storage timestamps; floor to the
    // same epoch-second axis the streaming cells use (readEvents floors
    // to seconds)
    val ev = spark.read.parquet(eventsPath)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000").as("t"))
    val mm = ev.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
    val withMm = cells.crossJoin(broadcast(mm))
      .withColumn("mid", expr("(tmin + tmax) div 2"))
    val winCells = withMm
      .select(col("j"), col("rho"), col("max_ts"), lit("w_all").as("g"),
        col("tmin").as("cut"))
      .unionByName(withMm.select(col("j"), col("rho"), col("max_ts"),
        lit("w_recent").as("g"), (col("mid") + 1L).as("cut")))
    val regs = winCells.filter(col("max_ts") >= col("cut"))
      .groupBy(col("g"), col("j")).agg(max(col("rho")).as("m"))
    val est = graft.operators.Sketches.hllEstimate(regs)
    val evm = ev.crossJoin(broadcast(mm))
      .withColumn("mid", expr("(tmin + tmax) div 2"))
    val exact = evm.filter(col("t") >= col("tmin"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
      .withColumn("g", lit("w_all")).select("g", "n_exact")
      .unionByName(evm.filter(col("t") >= col("mid") + 1L)
        .agg(count_distinct(col("user_id")).as("n_exact"))
        .withColumn("g", lit("w_recent")).select("g", "n_exact"))
    est.join(exact, "g")
      .withColumn("rel_error",
        round((col("estimate") - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 6))
      .orderBy(col("g"))
  }

  /** STREAMING SRM maintenance: the experiment-health surface (q390's
    * sample-ratio-mismatch gate) maintained as an ingestion side effect.
    * Each micro-batch lands its DISTINCT (arm, unit) assignments — the
    * arm from the same salted md5 bucket hash [[graft.operators.Drift
    * .srmCheck]] uses — as an exactly-once tagged lake commit.
    * Distinct-union is idempotent and commutative, so the merge-on-read
    * store holds exactly the corpus's assigned-unit sets however
    * ingestion was batched, and the drained χ² readout is bit-equal to
    * the batch gate (the oracle runs q390's SQL). The store is
    * unit-domain-sized (one row per distinct unit) — the same posture
    * as the hour-set and components stores, and the price of an EXACT
    * distinct count per arm; q381's HLL store is the sketched
    * alternative when units outgrow it.
    */
  def srmMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/assign"
    val arms = Seq(("control", 2), ("t1", 1), ("t2", 1))
    val w = arms.map(_._2.toLong).sum
    val bounds = arms.scanLeft(0L)(_ + _._2).tail
    def armOf(df: DataFrame): DataFrame = {
      val h = conv(substring(md5(concat(lit("exp42:"),
        col("user_id").cast("string")).cast("binary")), 1, 13), 16, 10)
        .cast("long")
      val bucket = pmod(h, lit(w))
      val arm = arms.zip(bounds).foldRight(lit(arms.last._1)) {
        case (((name, _), hi), rest) => when(bucket < hi, lit(name))
          .otherwise(rest)
      }
      df.select(arm.as("arm"), col("user_id")).distinct()
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          armOf(batch).coalesce(1), tag = s"srm-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val store = graft.sources.TxLake.readSnapshot(spark, lake).distinct()
    graft.operators.Drift.srmCheck(store, "user_id", arms, "exp42", 9.21034)
      .orderBy(col("arm"))
  }

  /** STREAMING CONFORMAL maintenance: the split-conformal calibration
    * surface (q397) maintained as an ingestion side effect. Each
    * micro-batch lands its partial (group, split, value) CENSUS — the
    * sufficient statistic of split conformal — as an exactly-once lake
    * commit; censuses merge by ADDING counts, so the merge-on-read
    * store equals the whole-corpus census however ingestion was
    * batched, and the drained interval report
    * ([[graft.operators.Features.conformalFromCensus]]) is bit-equal to
    * the batch q397 (same oracle SQL). The second experimentation-stack
    * self-maintaining surface beside the SRM store: assignment health
    * and calibrated uncertainty both stay current with zero recompute.
    */
  def conformalMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/census"
    def censusOf(df: DataFrame): DataFrame = {
      val h = conv(substring(md5(concat(lit("conf:"),
        col("event_id").cast("string")).cast("binary")), 1, 13), 16, 10)
        .cast("long")
      df.select(col("event_type").as("g"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("y"),
          (pmod(h, lit(2L)) === 0L).as("train"))
        .groupBy(col("g"), col("train"), col("y"))
        .agg(count(lit(1)).as("t"))
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"conf-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("g"), col("train"), col("y"))
      .agg(sum(col("t")).as("t"))
    graft.operators.Features.conformalFromCensus(merged, alphaBp = 1000)
      .orderBy(col("g"))
  }

  /** STREAMING WELCH-t maintenance: the two-sample mean test (q362)
    * maintained as an ingestion side effect — each micro-batch lands its
    * partial (isa, n, Σx, Σx²) MOMENT census as an exactly-once lake
    * commit. Moments ADD (integer/decimal sums are associative), so the
    * merge-on-read store equals the whole-corpus moments however
    * ingestion was batched, and the drained test
    * ([[graft.operators.Drift.welchFromMoments]]) is bit-equal to the
    * batch q362 — same oracle SQL. Third self-maintaining
    * experimentation surface beside the SRM (q417) and conformal (q422)
    * stores: assignment health, calibrated uncertainty, and now the
    * treatment-effect readout all stay current with zero recompute, each
    * store bounded by its sufficient statistic (here: 2 rows per batch),
    * never the event volume.
    */
  def welchMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/moments"
    val d38 = DecimalType(38, 0)
    def momentsOf(df: DataFrame): DataFrame =
      df.filter(col("event_type").isin("view", "click"))
        .select(
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("cents"),
          (col("event_type") === "view").as("isa"))
        .groupBy(col("isa"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents").cast(d38)).as("s"),
          sum(col("cents").cast(d38) * col("cents").cast(d38)).as("ss"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          momentsOf(batch).coalesce(1), tag = s"welch-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.welchFromMoments(
      graft.sources.TxLake.readSnapshot(spark, lake))
  }

  /** STREAMING MANN–KENDALL maintenance: the monotone-trend screen
    * (q421) maintained as an ingestion side effect — each micro-batch
    * lands its partial (event_type, day, cnt) DAILY census as an
    * exactly-once lake commit. Counts ADD, so the merged census equals
    * the whole-corpus daily census however ingestion was batched, and
    * the drained trend test ([[graft.operators.Trend.mannKendall]] over
    * the merge-on-read store) is bit-equal to batch q421 — same oracle
    * SQL. Fourth self-maintaining surface (q417 SRM, q422 conformal,
    * q433 Welch): the store is day-domain-sized per key, never event
    * volume, and the quadratic pair census runs only at READ time over
    * that bounded domain.
    */
  def mannKendallMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/daily"
    def censusOf(df: DataFrame): DataFrame =
      df.select(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("ts"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"mk-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cnt")).as("cnt"))
    graft.operators.Trend.mannKendall(merged, "event_type", "day", "cnt")
      .select(col("k").as("event_type"), col("n"), col("s"),
        col("var_s"), col("z"))
      .orderBy(col("event_type"))
  }

  /** STREAMING XmR maintenance: the control chart (q446) maintained as
    * an ingestion side effect — each micro-batch lands its partial
    * (event_type, hid, cents) HOURLY census as an exactly-once commit;
    * cents sums ADD, so the merged census equals the whole-corpus hourly
    * series however ingestion was batched, and the drained chart
    * ([[graft.operators.Trend.xmrChart]] over the merge-on-read store)
    * is bit-equal to batch q446 — same oracle SQL. Fifth
    * self-maintaining surface: the store is hour-domain-sized per key,
    * and the moving-range pass runs only at READ time over that bounded
    * series.
    */
  def xmrMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/hourly"
    def censusOf(df: DataFrame): DataFrame =
      df.select(col("event_type"),
          expr("unix_timestamp(ts) div 3600").as("hid"),
          col("value"))
        .groupBy(col("event_type"), col("hid"))
        .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("ts"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"xmr-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type"), col("hid"))
      .agg(sum(col("cents")).as("cents"))
    graft.operators.Trend.xmrChart(merged, "event_type", "hid", "cents")
      .orderBy(col("event_type"))
  }

  /** STREAMING DISTRIBUTION-PROFILE maintenance: the pairwise JSD matrix
    * (q455) kept current as an ingestion side effect — each micro-batch
    * lands its partial (event_type, hour-of-day, n) census exactly-once;
    * counts ADD, so the drained matrix over the merge-on-read store is
    * bit-equal to batch q455 — same oracle SQL. Sixth self-maintaining
    * surface: distribution drift between every pair of types stays
    * current, the store bounded by types × 24 bins; the drained matrix
    * reads through [[graft.operators.Drift.jsdMatrixFromCensus]] — the
    * k²·support work runs only at READ time over the merged census,
    * never over rows.
    */
  def jsdMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/profile"
    def censusOf(df: DataFrame): DataFrame =
      df.select(col("event_type"),
          pmod(expr("unix_timestamp(ts) div 3600"), lit(24L)).as("hod"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("ts"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"jsd-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type").cast("string").as("k"),
        col("hod").cast("long").as("b"))
      .agg(sum(col("n")).as("n"))
    graft.operators.Drift.jsdMatrixFromCensus(merged)
      .orderBy(col("ka"), col("kb"))
  }

  /** STREAMING PSI maintenance — q109's population-stability report as
    * an ingestion side effect (the SEVENTH self-maintaining surface):
    * bin edges and the actual-slice cutoff are PINNED from a reference
    * scan up front (the only global facts the binning needs — exactly
    * what a production drift monitor freezes from its reference period),
    * then each micro-batch commits its (bin, n_act, n_ref) census
    * partial exactly-once. Counts ADD, so the drained store re-aggregates
    * and reads through [[graft.operators.Drift.psiFromCensus]] —
    * bit-identical to the one-pass batch q109, which is why both share
    * the oracle verbatim and why batch boundaries are invisible.
    */
  def psiMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      bins: Int = 10): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/psi"
    // pinned reference facts: global value range + newest date slice
    val ref = spark.read.parquet(eventsPath)
      .select(col("value").cast("double").as("v"),
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd").as("d"))
    val pin = ref.agg(min(col("v")), max(col("v")), max(col("d"))).head()
    val (mn, mx, maxDate) = (pin.getDouble(0), pin.getDouble(1), pin.getString(2))
    require(mx > mn, s"degenerate value range [$mn, $mx]")
    def censusOf(batch: DataFrame): DataFrame = {
      val v = col("value").cast("double")
      // the q109 bin expression verbatim: driver-side (mx - mn) literal,
      // fixed-order (v - mn) * k / range, top edge in the last bin
      val bin = least(
        floor((v - lit(mn)) * lit(bins.toDouble) / lit(mx - mn)),
        lit(bins - 1L)).cast("long")
      batch
        .select(v.as("value"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .groupBy(bin.as("bin"))
        .agg(sum(when(col("d") === maxDate, 1L).otherwise(0L)).as("n_act"),
          sum(when(col("d") === maxDate, 0L).otherwise(1L)).as("n_ref"))
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("value"), col("ts"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"psi-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(sum(col("n_act")).as("n_act"), sum(col("n_ref")).as("n_ref"))
    graft.operators.Drift.psiFromCensus(merged, bins)
      .orderBy(col("bin"))
  }

  /** STREAMING BENFORD maintenance — q291's leading-digit forensic kept
    * current as an ingestion side effect (the EIGHTH self-maintaining
    * surface): each micro-batch commits its (digit, n) census partial
    * exactly-once — a ≤9-row commit whatever the batch size, the
    * smallest sufficient statistic on the board. Counts ADD, so the
    * drained store re-aggregates and reads through
    * [[graft.operators.Profiling.benfordFromCensus]] — bit-identical to
    * the one-pass batch audit over the same rows, which is why batch
    * boundaries are invisible and the oracle replays the batch shape
    * verbatim.
    */
  def benfordMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/benford"
    def censusOf(batch: DataFrame): DataFrame = {
      // the q291 digit expression verbatim: integer part's first digit,
      // rows below 1 excluded (no leading digit in 10^0..)
      val v = col("value").cast("double")
      batch.filter(v >= 1.0)
        .select(substring(floor(v).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"benford-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Profiling.benfordFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("digit").cast("int").as("digit"),
          col("n").cast("long").as("n")))
      .orderBy(col("digit"))
  }

  /** STREAMING TOP-MOVERS maintenance — q491's period-over-period
    * "heavy changers" monitor as an ingestion side effect (the NINTH
    * self-maintaining surface): the period cutoff is PINNED from a
    * reference scan up front (what a production monitor freezes when the
    * comparison window is declared), each micro-batch commits its
    * (key, n_prev, n_curr) census partial exactly-once, counts ADD, and
    * the drained store reads through
    * [[graft.operators.Drift.topMoversFromCensus]] — bit-identical to
    * the one-pass batch q491, whose oracle it shares verbatim. The
    * store is user-domain-sized, never event-volume-sized.
    */
  def topMoversMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      k: Int = 10): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/movers"
    val ref = spark.read.parquet(eventsPath)
      .select(expr("unix_timestamp(ts)").as("sec"))
    val pin = ref.agg(min(col("sec")), max(col("sec"))).head()
    val cutoff = (pin.getLong(0) + pin.getLong(1)) / 2
    def censusOf(batch: DataFrame): DataFrame = {
      val isCurr = expr("unix_timestamp(ts)") >= cutoff
      batch.groupBy(col("user_id").cast("long").as("key"))
        .agg(sum(when(isCurr, 0L).otherwise(1L)).as("n_prev"),
          sum(when(isCurr, 1L).otherwise(0L)).as("n_curr"))
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("ts"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"movers-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.topMoversFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("key").cast("long").as("key"),
          col("n_prev").cast("long").as("n_prev"),
          col("n_curr").cast("long").as("n_curr")), k)
      .orderBy(col("rank"))
  }

  /** STREAMING SEASONAL-BAND maintenance — q504's per-slot envelope
    * monitor as an ingestion side effect (the TENTH self-maintaining
    * surface): each micro-batch commits its (key, day, slot,
    * partial-cents) SUM census exactly-once; sums ADD, so the drained
    * store re-aggregates into the exact per-(key, day, slot) value table
    * and reads through [[graft.operators.Trend.seasonalBandPerKey]] —
    * bit-identical to the one-pass batch q504, whose oracle it shares
    * verbatim. Store is (keys × days × slots)-sized, never event volume.
    */
  def seasonalBandMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/band"
    def censusOf(batch: DataFrame): DataFrame =
      batch.groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("d"),
        pmod(expr("unix_timestamp(ts) div 3600"), lit(24L)).as("hod"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("part"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("ts"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"band-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val slots = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type"), col("d").cast("string").as("d"),
        col("hod").cast("long").as("hod"))
      .agg((sum(col("part").cast(DecimalType(18, 2))) * 100).cast("long")
        .as("cents"))
    graft.operators.Trend.seasonalBandPerKey(
        slots, "event_type", "d", "hod", "cents")
      .orderBy(col("k"), col("slot"))
  }

  /** STREAMING ESS maintenance — the Kish effective-sample-size
    * diagnostic (q508) kept current as an ingestion side effect (the
    * ELEVENTH self-maintaining surface): each micro-batch commits its
    * per-group (n, Σw, Σw²) weight-moment partial exactly-once; moments
    * ADD, so the drained store reads through
    * [[graft.operators.Sampling.essFromMoments]] bit-identically to the
    * one-pass batch readout over the same rows. The store is
    * group-domain-sized (3 longs per group per batch), never row volume
    * — the cheapest sufficient statistic after q486's digit census.
    */
  def essMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/ess"
    def censusOf(batch: DataFrame): DataFrame = {
      val w = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
        .cast(DecimalType(38, 0))
      batch.groupBy(col("event_type").as("g"))
        .agg(count(lit(1)).as("n"), sum(w).as("sw"), sum(w * w).as("sww"))
    }
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"ess-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Sampling.essFromMoments(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("g").cast("string").as("g"), col("n").cast("long").as("n"),
          col("sw"), col("sww")))
      .orderBy(col("g"))
  }

  /** STREAMING FUNNEL maintenance — q509's Wilson-interval funnel as an
    * ingestion side effect (the TWELFTH self-maintaining surface): each
    * micro-batch commits its per-user step-flag partials exactly-once;
    * boolean OR is associative, commutative AND idempotent, so the
    * drained store's OR-merge equals the batch per-user flags however
    * events were batched (even under replays), and the funnel readout is
    * bit-equal to batch q509 — whose oracle it shares verbatim. Store is
    * user-domain-sized.
    */
  def funnelMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/funnel"
    def flagsOf(batch: DataFrame): DataFrame =
      batch.groupBy(col("user_id"))
        .agg(max(col("event_type") === "view").as("view"),
          max(col("event_type") === "click").as("click"),
          max(col("event_type") === "purchase").as("purchase"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("event_type"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          flagsOf(batch).coalesce(1), tag = s"funnel-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val merged = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("user_id"))
      .agg(max(col("view")).as("view"), max(col("click")).as("click"),
        max(col("purchase")).as("purchase"))
    graft.operators.Drift.funnelWilson(
        merged, Seq("view", "click", "purchase"))
      .orderBy(col("step"))
  }

  /** STREAMING VOCAB-COVERAGE maintenance — q510's coverage curve as an
    * ingestion side effect (the THIRTEENTH self-maintaining surface):
    * each micro-batch commits its (token, n) census partial
    * exactly-once; counts ADD, so the drained store reads through
    * [[graft.operators.TextPipeline.vocabCoverageFromCensus]]
    * bit-identically to the one-pass batch curve — whose oracle it
    * shares verbatim. Store is token-domain-sized (the vocabulary a
    * tokenizer team maintains anyway), never corpus volume.
    */
  def vocabCoverageMaintenance(
      spark: SparkSession,
      docsPath: String,
      scratchDir: String,
      ks: Seq[Int]): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/vocab"
    def censusOf(batch: DataFrame): DataFrame =
      batch.select(explode(
        graft.functions.TextFunctions.words(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val q = spark.readStream
      .schema(spark.read.parquet(docsPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsPath)
      .select(col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"vocab-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.TextPipeline.vocabCoverageFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("w").cast("string").as("w"), col("n").cast("long").as("n")),
      ks)
      .orderBy(col("k"))
  }

  /** STREAMING QTE maintenance — q523's quantile-treatment-effect table
    * as an ingestion side effect (the FOURTEENTH self-maintaining
    * surface): each micro-batch commits its per-arm (isa, v, t) value
    * census exactly-once; counts ADD, so the drained store reads
    * through [[graft.operators.Drift.qteFromCensus]] bit-identically to
    * batch q523, whose oracle it shares verbatim. The distributional
    * experiment readout stays current at ingest cadence; store is
    * arm×value-domain-sized.
    */
  def qteMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/qte"
    def censusOf(batch: DataFrame): DataFrame =
      batch.select(
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("v"),
        (pmod(conv(substring(md5(concat(lit("qte1:"),
          col("user_id").cast("string"))), 1, 13), 16, 10).cast("long"),
          lit(2)) === 0).as("isa"))
        .groupBy(col("isa"), col("v")).agg(count(lit(1)).as("t"))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          censusOf(batch).coalesce(1), tag = s"qte-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.qteFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("isa").cast("boolean").as("isa"),
          col("v").cast("long").as("v"), col("t").cast("long").as("t")))
  }

  /** STREAMING SLO burn-rate alerting on FINALIZED hours — q346's
    * multiwindow rule (page only when the 1h AND trailing-6h burns both
    * exceed) computed the way production alerting must: each hour's
    * error share emits exactly once, at event-time watermark passage
    * (append mode, sentinel-staged input — the q136 pattern), and the
    * trailing baseline runs over the emitted finalized stream, never
    * over partial counts a complete-mode drain would still be updating.
    */
  def sloBurnStream(spark: SparkSession, eventsPath: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = EventsStream.readEvents(spark, eventsPath)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"))
    val fin = drain(spark, hourly, "append")
      .select(expr("unix_timestamp(window.start) div 3600").as("hid"),
        col("total"), col("errs"))
    val w6 = Window.orderBy(col("hid")).rowsBetween(-5, Window.currentRow)
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val b1 = dbl(col("errs")) / dbl(col("total")) / 0.01
    val b6 = dbl(col("errs6")) / dbl(col("total6")) / 0.01
    fin
      .withColumn("errs6", sum(col("errs")).over(w6))
      .withColumn("total6", sum(col("total")).over(w6))
      .select(col("hid"), col("total"), col("errs"),
        round(b1, 6).as("burn_1h"), round(b6, 6).as("burn_6h"),
        (b1 > 14.4 && b6 > 6.0).cast("int").as("page"))
  }

  /** DYNAMIC-GAP streaming sessionization: the built-in `session_window`
    * with a PER-EVENT gap column (purchases hold a session open 60
    * minutes, everything else 30) — the q223 batch semantics on the
    * streaming engine, completing the session matrix's last cell (q54
    * fixed-gap complete, q142 append, q135 update, q345 dynamic).
    * Sessions merge exactly when an event's [ts, ts+gap) window touches
    * the running session end, so the batch oracle is the variable-end
    * interval-union sweep.
    */
  def dynamicSessionsStream(spark: SparkSession, eventsPath: String): DataFrame = {
    // make_interval (CalendarIntervalType) — the ANSI INTERVAL literal is
    // DayTimeIntervalType, which session_window's gap column rejects
    val gap = when(col("event_type") === "purchase",
        expr("make_interval(0, 0, 0, 0, 0, 60, 0)"))
      .otherwise(expr("make_interval(0, 0, 0, 0, 0, 30, 0)"))
    val agg = EventsStream.readEvents(spark, eventsPath)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    drain(spark, agg, "complete")
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        unix_timestamp(col("session_window.end")).as("end_sec"),
        col("n_events"))
  }

  /** Streaming INTERVAL-UNION (uptime) maintenance: each micro-batch
    * reduces to ITS merged activity spans (weight = source-interval
    * count) and lands as an exactly-once TxLake delta commit; interval
    * union is associative, so the store read back and re-swept — weights
    * summing through — must equal the one-shot batch union (q334) row
    * for row. O(batch + standing-answer) per batch; events never
    * re-stream.
    */
  def intervalUnionMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      spanSec: Long): DataFrame = {
    import graft.operators.Relational
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/spans"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), unix_timestamp(col("ts")).as("s0"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spans = Relational.intervalUnion(
          batch.withColumn("e0", col("s0") + spanSec),
          "user_id", "s0", "e0")
        graft.sources.TxLake.commit(spark, lake, spans.coalesce(1),
          tag = s"spans-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    Relational.intervalUnion(
      graft.sources.TxLake.readSnapshot(spark, lake),
      "user_id", "span_start", "span_end", weightCol = Some("n_merged"))
  }

  /** Streaming SKETCH-STORE maintenance — the LOG-RESIDENT per-file
    * sketches (q356's `TxLake.SketchSpec`) fed by a stream: each
    * micro-batch lands its RAW rows as an exactly-once tagged commit
    * that carries the sketch spec, so the stats surface maintains
    * itself as a SIDE EFFECT of ingestion — no separate sample table
    * (contrast [[quantileSketchMaintenance]], which maintains one) —
    * and the percentile dashboard reads ONLY the log at any moment.
    * Bottom-k merges exactly across batch boundaries, so the metadata
    * answer equals the whole-corpus sketch however the stream sliced
    * it.
    */
  def sketchStoreMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/events_lake"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_id"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.localCheckpoint(true).coalesce(1),
          tag = s"sks-$id",
          sketch = Some(graft.sources.TxLake.SketchSpec("event_id", "value", k)))
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.sketchQuantiles(spark, lake, "value", qs)
  }

  /** Streaming QUANTILE-SKETCH maintenance — the mergeable bottom-k
    * sample (q316) kept current per micro-batch: each batch reduces to
    * ITS bottom-k (h, id, v) rows + one count row, landed as exactly-once
    * tagged TxLake commits (O(batch + k) per batch, the stream is never
    * re-read). Because bottom-k merge = union + re-take-k = EXACTLY the
    * global bottom-k, the standing store read back and merged must equal
    * the one-shot batch sketch over the whole corpus — however the
    * batches sliced it. p50/p90/p99 then come from the store alone.
    */
  def quantileSketchMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    import graft.operators.Sketches
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val sampleLake = s"$scratchDir/samples"
    val countLake = s"$scratchDir/counts"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_id"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val pinned = batch.localCheckpoint(true)
        graft.sources.TxLake.commit(spark, sampleLake,
          Sketches.bottomKLarge(
            Sketches.hashedSample(pinned, "event_id", "value"), k).coalesce(1),
          tag = s"qsk-$id")
        graft.sources.TxLake.commit(spark, countLake,
          spark.range(1).select(lit(id).as("batch_id"),
            lit(pinned.count()).as("n")).coalesce(1),
          tag = s"qskn-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val samples = graft.sources.TxLake.readSnapshot(spark, sampleLake)
    val tot = graft.sources.TxLake.readSnapshot(spark, countLake)
      .agg(sum(col("n")).as("n_total"))
    Sketches.quantileEstimate(Sketches.bottomKSmall(samples, k), tot, qs)
  }

  /** Streaming SLIDING BITMAP-STORE maintenance — the exact-distinct
    * counterpart of [[cmsMaintenance]]: each micro-batch reduces to its
    * per-(event_type, hour) bitmap words and lands as an exactly-once
    * tagged TxLake commit. `bit_or` commutes and is idempotent per set
    * bit, so the batch-boundary-split store merged on read equals the
    * whole-corpus bitmap table — and the standing cells then answer the
    * trailing-6h distinct-users dashboard (q189's sliding merge) without
    * ever re-touching the event stream.
    */
  def bitmapMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/cells"
    def cellsOf(df: DataFrame): DataFrame =
      graft.operators.Sketches.bitmapWords(
        df.select(col("event_type"), col("user_id"),
          expr("unix_seconds(ts) div 3600").as("hour_id")),
        Seq("event_type", "hour_id"), "user_id")
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"), col("user_id"), col("ts"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          cellsOf(batch).coalesce(1), tag = s"bm-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Sketches.trailingBitmapDistinct(
      graft.sources.TxLake.readSnapshot(spark, lake),
      Seq("event_type"), "hour_id", 6)
      .orderBy(col("event_type"), col("hour_id"))
  }

  /** Streaming ERASURE-REQUEST application via deletion vectors: a
    * standing customer table absorbs a stream of delete requests (here:
    * error-event user ids), each micro-batch landing as one
    * merge-on-read DV commit — O(requests) bytes written per batch, no
    * data file ever rewritten (asserted). Naturally idempotent under
    * checkpoint-recovery redelivery: a re-applied batch finds its rows
    * already masked, marks nothing, and commits nothing — the DV
    * counterpart of the tagged exactly-once sink.
    */
  def dvErasureStream(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      customers: DataFrame): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/table"
    graft.sources.TxLake.commit(spark, lake,
      customers.repartition(2, col("c_custkey")))
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .filter(col("event_type") === "error")
      .select(col("user_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // an erasure batch is a handful of subject keys by nature —
        // collecting it is the metadata-sized step of the flow
        val keys = batch.distinct().collect().map(_.getLong(0))
        if (keys.nonEmpty)
          graft.sources.TxLake.deleteWhereDv(spark, lake,
            col("c_custkey").isin(keys.map(x => x: Any): _*))
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    require(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$lake/data/v2")),
      "DV erasure must never write data files")
    require(graft.sources.TxLake.dvFiles(lake).nonEmpty,
      "the stream must have landed deletion vectors")
    graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(DecimalType(12, 2))).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** STREAMING incremental connected-components maintenance: edge batches
    * arrive as a stream, and each micro-batch folds into the standing
    * cluster assignment via [[graft.operators.Dedup.updateClustersDelta]]
    * — propagation runs only over the batch's contracted root graph,
    * never the accumulated edge history, and ONLY the rows the batch
    * changed (new nodes + members of merged clusters) land, through one
    * tagged exactly-once merge-on-read commit
    * ([[graft.sources.TxLake.upsertKeysDv]]: delta rows append, the
    * superseded rows mask via deletion vectors in the same atomic entry
    * — no data file rewritten, no full-snapshot overwrite). Per-batch
    * commit cost is O(batch + touched-cluster members), never O(state):
    * the posture that keeps near-dup cluster maintenance at ingest
    * cadence on a standing 100 TB corpus. Because union-find merging is
    * order-insensitive, the batch-split assignment equals the one-shot
    * recompute over all edges — which is exactly what the gate proves
    * (the oracle is the full recursive-CTE components).
    */
  def componentsMaintenance(
      spark: SparkSession,
      pairs: DataFrame,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val src = s"$scratchDir/pairs"
    val lake = s"$scratchDir/comp"
    // stage deterministic edge batches: 3 hash-splits, one file each, so
    // maxFilesPerTrigger=1 yields 3 real micro-batches
    val staged = pairs
      .withColumn("__b", pmod(xxhash64(col("id_a"), col("id_b")), lit(3)))
      .localCheckpoint(true)
    (0 until 3).foreach { b =>
      staged.filter(col("__b") === b).drop("__b")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val q = spark.readStream
      .schema(staged.drop("__b").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val edges = batch.localCheckpoint(true)
        val comp =
          if (graft.sources.TxLake.latestVersion(lake) == 0L)
            edges.select(col("id_a").as("node"),
              col("id_a").as("cluster_rep")).limit(0)
          else graft.sources.TxLake.readSnapshot(spark, lake)
        val delta = graft.operators.Dedup
          .updateClustersDelta(comp, edges, maxIter = 30)
          .localCheckpoint(true)
        // an empty delta (re-delivered batch, or all edges intra-cluster)
        // commits nothing — the standing state already answers it
        if (!delta.isEmpty)
          graft.sources.TxLake.upsertKeysDv(spark, lake, delta, "node",
            tag = s"cc-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
  }

  /** STREAMING SHINGLE-INDEX maintenance — substring dedup (q527) at
    * ingest cadence: each micro-batch of documents APPENDS its
    * (doc_id, pos, shingle-hash) rows to a standing index, one
    * exactly-once append commit per batch at O(batch tokens) — the index
    * is never rebuilt, because a document's shingle rows are a pure
    * function of the document ([[graft.operators.Dedup.shinglePositions]]).
    * The drained readout runs the census + island merge
    * ([[graft.operators.Dedup.spansFromShingles]]) over the store, which
    * equals the one-shot batch q527 verbatim — its oracle is shared. The
    * 100 TB story: the corpus-wide repeated-span audit stops being a
    * re-tokenize-everything job and becomes one census over an index the
    * ingest already paid for.
    */
  def repeatedSpansMaintenance(
      spark: SparkSession,
      docsPath: String,
      scratchDir: String,
      k: Int,
      minOcc: Int): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/shingles"
    val q = spark.readStream
      .schema(spark.read.parquet(docsPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsPath)
      .select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          graft.operators.Dedup.shinglePositions(batch, "doc_id", "text", k),
          tag = s"sh-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Dedup.spansFromShingles(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("sh")),
      "doc_id", k, minOcc)
  }

  /** STREAMING SURVIVAL maintenance — per-user lifetime bounds are
    * MERGEABLE (min of firsts, max of lasts), so each micro-batch reduces
    * to its per-user (first, last) and folds into a standing lifetime
    * store via the merge-on-read upsert
    * ([[graft.sources.TxLake.upsertKeysDv]]): commit cost O(batch users),
    * state O(users), no file rewritten — the first streaming consumer of
    * the atomic delta-MERGE beside the components store. min/max merging
    * commutes and is idempotent, so the drained lifetimes equal the
    * one-pass reduce whatever the batch split, and the log-rank readout
    * over them shares batch q520's oracle verbatim. The censor cutoff is
    * PINNED from a reference scan up front (the q497 pattern — the
    * horizon a production monitor declares when the study starts).
    */
  def survivalMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lives"
    val ref = spark.read.parquet(eventsPath)
      .select(expr("unix_timestamp(ts)").as("sec"))
    val pin = ref.agg(min(col("sec")), max(col("sec"))).head()
    val cutoff = pin.getLong(0) + 2L * (pin.getLong(1) - pin.getLong(0)) / 3L
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val bounds = batch.groupBy(col("user_id"))
          .agg(min(col("sec")).as("first"), max(col("sec")).as("last"))
          .localCheckpoint(true)
        if (graft.sources.TxLake.latestVersion(lake) == 0L)
          graft.sources.TxLake.commit(spark, lake, bounds, tag = s"km-$id")
        else {
          // widen against the standing bounds of only the BATCH's users,
          // then land the merged rows as one atomic delta commit
          val existing = graft.sources.TxLake.readSnapshot(spark, lake)
            .join(bounds.select(col("user_id")), Seq("user_id"), "left_semi")
          val merged = existing.unionByName(bounds)
            .groupBy(col("user_id"))
            .agg(min(col("first")).as("first"), max(col("last")).as("last"))
          graft.sources.TxLake.upsertKeysDv(spark, lake, merged, "user_id",
            tag = s"km-$id")
        }
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    // two rows per user (first, last) recover exactly the min/max the
    // batch operator reduces from raw events — logRank sees the same
    // lifetimes it would over the full stream history
    val lives = graft.sources.TxLake.readSnapshot(spark, lake)
    val asEvents = lives.select(col("user_id"), col("first").as("sec"))
      .unionByName(lives.select(col("user_id"), col("last").as("sec")))
    graft.operators.Trend.logRank(asEvents, "user_id", "sec", cutoff,
      pmod(conv(substring(md5(concat(lit("lr1:"),
        col("user_id").cast("string"))), 1, 13), 16, 10).cast("long"),
        lit(2L)) === 0L)
  }

  /** STREAMING JAMES–STEIN maintenance — the shrinkage leaderboard
    * (q538) kept current as an ingestion side effect: each micro-batch
    * commits its per-group (n, Σv, Σv²) moment partials exactly-once;
    * moments ADD, so the drained census finishes through
    * [[graft.operators.Drift.jamesSteinFromCensus]] bit-identical to the
    * one-pass batch q538, whose oracle it shares verbatim. State is
    * O(groups) rows per batch — the sufficient-statistic posture.
    */
  def jamesSteinMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/js"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val d38 = DecimalType(38, 0)
        val v = col("cents").cast(d38)
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("g"))
            .agg(count(lit(1)).as("n_g"), sum(v).as("s_g"),
              sum(v * v).as("ss_g"))
            .coalesce(1),
          tag = s"js-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.jamesSteinFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("g"), col("n_g").cast("long").as("n_g"),
          col("s_g"), col("ss_g")))
  }

  /** STREAMING K-ANONYMITY maintenance — the privacy posture monitored
    * AT INGEST CADENCE: each micro-batch commits its per-QI-class count
    * partials exactly-once, counts ADD (ingestion can only GROW classes,
    * so the suppressed share is monotone non-increasing), and the
    * drained sweep goes through
    * [[graft.operators.Privacy.kAnonSweepFromCounts]] — bit-identical to
    * batch q557, whose oracle it shares verbatim. This is the monitor
    * that catches a NEW data source re-fragmenting the equivalence
    * classes before the next anonymized release ships.
    */
  def kanonMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String,
      qiCols: Seq[String],
      ks: Seq[Int]): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/kanon"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n"))
            .coalesce(1),
          tag = s"ka-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Privacy.kAnonSweepFromCounts(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(qiCols.map(col) :+ col("n").cast("long").as("n"): _*),
      qiCols, ks)
  }

  /** STREAMING TREND maintenance — q147's per-key OLS slopes as an
    * ingestion side effect: each micro-batch commits its (key, hour,
    * count) census partial exactly-once; hourly counts ADD, so the
    * drained census feeds [[graft.operators.Trend.olsPerKey]]
    * bit-identical to the one-pass batch q147 (oracle shared verbatim).
    * State is O(keys × observed hours) — time-growing by design (a
    * production dashboard bounds it with a trailing-window cut; the
    * census stays mergeable either way).
    */
  def trendOlsMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/trend"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("hour_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("event_type"), col("hour_id"))
            .agg(count(lit(1)).as("n"))
            .coalesce(1),
          tag = s"tr-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val census = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type"), col("hour_id"))
      .agg(sum(col("n")).as("n"))
    graft.operators.Trend.olsPerKey(census, "event_type", "hour_id", "n")
  }

  /** STREAMING AR-MODEL maintenance — q657's Yule–Walker AR(2) fit as an
    * ingestion side effect: each micro-batch commits its (key, hour,
    * count) census partial exactly-once; hourly counts ADD, the drained
    * census rebuilds the SAME dense zero-filled spine the batch path
    * uses (global hour bounds come from the census itself — observed
    * rows bound the range identically), and
    * [[graft.operators.Trend.yuleWalkerAr2]] reads bit-identical to
    * batch q657 (oracle shared verbatim). State is O(keys × observed
    * hours), mergeable under count addition.
    */
  def yuleWalkerMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame =
    graft.operators.Trend.yuleWalkerAr2(
      denseHourlyDrain(spark, eventsPath, scratchDir, "yw"),
      "event_type", "hour_id", "n")

  /** STREAMING MA(1) maintenance — q671's moving-average fit as an
    * ingestion side effect, the MA twin of [[yuleWalkerMaintenance]]:
    * hour-partitioned count PARTIALS commit exactly-once per
    * micro-batch, counts ADD, and the drained re-census feeds
    * [[graft.operators.Trend.ma1Fit]] over the re-derived dense spine —
    * bit-identical to the one-pass batch q671, whose oracle it shares
    * verbatim. State O(types × hours), calendar-bounded.
    */
  def ma1Maintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame =
    graft.operators.Trend.ma1Fit(
      denseHourlyDrain(spark, eventsPath, scratchDir, "ma1"),
      "event_type", "hour_id", "n")

  /** STREAMING STAFFING maintenance — q682's Erlang-C prescription kept
    * live at ingestion: the same exactly-once hourly count partials as
    * the AR/MA stores ([[denseHourlyDrain]]), re-priced through
    * [[graft.operators.Relational.erlangStaffing]] on drain —
    * bit-identical to the one-pass batch q682, whose oracle it shares
    * verbatim. The operations loop this closes: arrivals stream in,
    * the staffing table is always current. State O(types × hours).
    */
  def erlangMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame =
    graft.operators.Relational.erlangStaffing(
      denseHourlyDrain(spark, eventsPath, scratchDir, "erl"),
      "event_type", "n", serviceTimeSec = 300.0, targetWait = 0.2)

  /** Shared drain for the time-series model maintenance stores: stream
    * the event slices, commit per-batch (type, hour) count partials to
    * a TxLake exactly-once, then re-census the snapshot and densify the
    * hour spine. Counts ADD across batches, so the drained census
    * equals the one-pass batch census row for row — the property every
    * downstream fit relies on. */
  private def denseHourlyDrain(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      tagPrefix: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/$tagPrefix"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_type"),
        expr("CAST(ts AS LONG) div 3600").as("hour_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("event_type"), col("hour_id"))
            .agg(count(lit(1)).as("n"))
            .coalesce(1),
          tag = s"$tagPrefix-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val census = graft.sources.TxLake.readSnapshot(spark, lake)
      .groupBy(col("event_type"), col("hour_id"))
      .agg(sum(col("n")).as("n"))
      .localCheckpoint(true) // bounds + types + the spine join read it
    val hours = census.agg(min(col("hour_id")).as("lo"),
        max(col("hour_id")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("hour_id"))
    val types = census.select(col("event_type")).distinct()
    types.crossJoin(hours)
      .join(census, Seq("event_type", "hour_id"), "left")
      .select(col("event_type"), col("hour_id"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** STREAMING STRATIFIED-ATT maintenance — q551's causal readout as an
    * ingestion side effect: per-batch per-stratum conditional moment
    * partials land exactly-once (arm assignment is a pure hash of the
    * order key, so each batch censuses itself), moments ADD, and the
    * drained readout goes through
    * [[graft.operators.Drift.strataAttFromCensus]] — bit-identical to
    * the one-pass batch q551, whose oracle it shares verbatim. State is
    * O(strata) rows per batch.
    */
  def strataAttMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/att"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val d38 = DecimalType(38, 0)
        val v = col("cents").cast(d38)
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("s"))
            .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("n1"),
              sum(when(!col("isa"), 1L).otherwise(0L)).as("n0"),
              sum(when(col("isa"), v).otherwise(lit(0).cast(d38))).as("s1"),
              sum(when(!col("isa"), v).otherwise(lit(0).cast(d38))).as("s0"),
              sum(when(col("isa"), v * v).otherwise(lit(0).cast(d38)))
                .as("ss1"),
              sum(when(!col("isa"), v * v).otherwise(lit(0).cast(d38)))
                .as("ss0"))
            .coalesce(1),
          tag = s"att-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.strataAttFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("s"), col("n1").cast("long").as("n1"),
          col("n0").cast("long").as("n0"), col("s1"), col("s0"),
          col("ss1"), col("ss0")))
  }

  /** STREAMING HODGES–LEHMANN maintenance — q548's robust shift estimate
    * as an ingestion side effect: per-batch (value, arm) censuses land
    * exactly-once, counts ADD, and the drained readout goes through
    * [[graft.operators.Drift.hlFromCensus]] — bit-identical to the
    * one-pass batch q548 (oracle shared verbatim). State O(value domain).
    */
  def hlMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/hl"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("v"))
            .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("ta"),
              sum(when(!col("isa"), 1L).otherwise(0L)).as("tb"))
            .coalesce(1),
          tag = s"hl-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.hlFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("v").cast("long").as("v"),
          col("ta").cast("long").as("ta"), col("tb").cast("long").as("tb")))
  }

  /** STREAMING CUPED maintenance — the "how much less traffic does the
    * next test need" readout (q395) kept current at ingest cadence: the
    * sufficient statistic is the PER-USER (pre, post) cents totals, and
    * sums ADD — so each micro-batch reduces to its per-user partials and
    * folds into a standing user-totals store via the merge-on-read
    * upsert (read standing rows for the BATCH's users, add, land the
    * merged rows as one atomic delta commit — O(batch users) per batch,
    * the q531 shape with addition instead of min/max). Unlike min/max
    * merging, ADDITION IS NOT REPLAY-IDEMPOTENT: the exactly-once tag on
    * the commit is load-bearing here, not belt-and-braces. The pre/post
    * cutoff and arm assignment are pure functions of (ts, user_id), so
    * the drained per-user totals equal the one-pass reduce and the CUPED
    * finish shares batch q395's oracle verbatim.
    */
  def cupedMaintenance(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/cuped"
    // the batch operator (q395) splits pre/post on the NANOS midpoint of
    // the canonical epoch-nanos ts; events carry sub-second precision, so
    // the store must read raw micros (NOT the second-floored readEvents
    // surface) or boundary events would classify differently
    val nanos = expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000")
    val ref = spark.read.parquet(eventsPath).select(nanos.as("t"))
    val pin = ref.agg(min(col("t")), max(col("t"))).head()
    val cutoff = (pin.getLong(0) + pin.getLong(1)) / 2L
    val q = spark.readStream
      .schema(spark.read.parquet(eventsPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(eventsPath)
      .select(col("user_id"), nanos.as("t"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("cents"))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val part = batch
          .groupBy(col("user_id"))
          .agg(sum(when(col("t") <= cutoff, col("cents")).otherwise(0L))
            .as("x"),
            sum(when(col("t") > cutoff, col("cents")).otherwise(0L))
              .as("y"))
          .localCheckpoint(true)
        if (graft.sources.TxLake.latestVersion(lake) == 0L)
          graft.sources.TxLake.commit(spark, lake, part, tag = s"cu-$id")
        else {
          val existing = graft.sources.TxLake.readSnapshot(spark, lake)
            .join(part.select(col("user_id")), Seq("user_id"), "left_semi")
          val merged = existing.unionByName(part)
            .groupBy(col("user_id"))
            .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
          graft.sources.TxLake.upsertKeysDv(spark, lake, merged, "user_id",
            tag = s"cu-$id")
        }
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    val per = graft.sources.TxLake.readSnapshot(spark, lake)
      .withColumn("arm", when(pmod(conv(substring(md5(concat(
        lit("cuped:"), col("user_id").cast("string")).cast("binary")),
        1, 13), 16, 10).cast("long"), lit(2L)) === 0L,
        lit("control")).otherwise(lit("treatment")))
    graft.operators.Features.cuped(per, "arm", "x", "y")
  }

  /** STREAMING THEIL'S-U maintenance — q544's directional association
    * kept current as an ingestion side effect: per-batch JOINT (x, y)
    * censuses land exactly-once, cell counts ADD and both marginals
    * derive from the joint, so the drained readout goes through
    * [[graft.operators.Drift.theilsUFromCensus]] bit-identical to the
    * one-pass batch q544 (oracle shared verbatim). State is O(cells).
    */
  def theilsUMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/tu"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
            .coalesce(1),
          tag = s"tu-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.theilsUFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("x"), col("y"), col("n_xy").cast("long").as("n_xy")))
  }

  /** STREAMING WASSERSTEIN-1 maintenance — q541's transport effect size
    * as an ingestion side effect: per-batch (value, arm) censuses land
    * exactly-once, counts ADD, the drained readout goes through
    * [[graft.operators.Drift.w1FromCensus]] — bit-identical to the
    * one-pass batch answer, oracle shared verbatim. State is
    * O(value domain) rows per batch.
    */
  def w1Maintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/w1"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("v"))
            .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("ta"),
              sum(when(!col("isa"), 1L).otherwise(0L)).as("tb"))
            .coalesce(1),
          tag = s"w1-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.w1FromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("v").cast("long").as("v"),
          col("ta").cast("long").as("ta"), col("tb").cast("long").as("tb")))
  }

  /** Streaming per-group top-k maintenance: each micro-batch's candidate
    * top-k merges into a k-rows-per-group state table committed
    * exactly-once per batch. Top-k is a mergeable summary —
    * `topk(topk(S) ∪ topk(B)) = topk(S ∪ B)` under the total order
    * (value DESC, id) — so the batch-split maintenance equals the
    * one-shot ranking over all events, which is exactly what the oracle
    * computes. State stays k×|groups| rows however long the stream runs.
    */
  def topkMaintenance(
      spark: SparkSession,
      events: DataFrame,
      scratchDir: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val src = s"$scratchDir/ev"
    val lake = s"$scratchDir/topk"
    val staged = events
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("__b", pmod(col("event_id"), lit(3)))
      .localCheckpoint(true)
    (0 until 3).foreach { b =>
      staged.filter(col("__b") === b).drop("__b")
        .coalesce(1).write.mode("append").parquet(src)
    }
    def topk(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      df.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= k).drop("__r")
    }
    val q = spark.readStream
      .schema(staged.drop("__b").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val cand = topk(batch.localCheckpoint(true))
        val state =
          if (graft.sources.TxLake.latestVersion(lake) == 0L) cand.limit(0)
          else graft.sources.TxLake.readSnapshot(spark, lake)
        graft.sources.TxLake.commit(spark, lake,
          topk(state.unionByName(cand)).coalesce(1),
          overwrite = true, tag = s"topk-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
  }

  def lakeRoundTrip(spark: SparkSession, eventsPath: String, scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lake"
    val q = EventsStream.toLake(EventsStream.readEvents(spark, eventsPath), lake)
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.PartitionedLake.read(spark, lake)
      .groupBy(col("date_id").cast("string").as("date_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
  }

  /** Streaming CDC apply into a TxLake table: each micro-batch reduces to
    * its newest row per user, then lands via the RECENCY-conditional merge
    * ([[graft.sources.TxLake.mergeByKeyNewest]]). Because that merge is
    * commutative across batches, the final table equals the global
    * latest-event-per-user regardless of how the source splits the input
    * into batches or which batch a user's newest event happens to ride —
    * the property a plain last-write-wins upsert cannot give an
    * out-of-order CDC feed. The caller stages the input as multiple files
    * and the read runs with maxFilesPerTrigger=1, so multi-batch
    * application is real, not simulated.
    */
  def cdcApply(spark: SparkSession, eventsPath: String, scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lake"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("sec").desc, col("event_id").desc)
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("sec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newest = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        if (graft.sources.TxLake.latestVersion(lake) == 0L)
          graft.sources.TxLake.commit(spark, lake, newest)
        else
          graft.sources.TxLake.mergeByKeyNewest(
            spark, lake, newest, "user_id", Seq("sec", "event_id"))
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("sec"))
  }

  /** Streaming CDC apply WITH DELETES ([[graft.sources.TxLake.mergeCdc]]):
    * each micro-batch reduces to the newest row per key, rows whose
    * terminal action is `tombstone` become matched-DELETE clauses, the
    * rest upsert — the full three-clause CDC stream (q165 without deletes
    * was the two-clause half). Requires TIME-SLICED source files (the
    * q259 staging contract: file k holds strictly earlier floored-seconds
    * than file k+1, mtime-ordered), so the sequential per-batch merges
    * converge to the global newest state; for arbitrary file order use
    * [[cdcApply]]'s recency merge instead, which is commutative but
    * cannot express deletes. State cost per batch: only files containing
    * batch keys are rewritten (the mergeCdc contract), so a micro-batch
    * costs O(touched files), never O(table).
    */
  def cdcApplyDeletes(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      tombstone: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lake"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("sec").desc, col("event_id").desc)
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("sec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val newest = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .withColumn("__del", col("event_type") === tombstone)
        if (graft.sources.TxLake.latestVersion(lake) == 0L)
          graft.sources.TxLake.commit(spark, lake,
            newest.filter(!col("__del")).drop("__del"))
        else
          graft.sources.TxLake.mergeCdc(spark, lake, newest, "user_id", "__del")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("sec"))
  }

  /** Streaming ingest with TTL retention: each micro-batch commits into
    * the lake with logged per-file `sec` stats; after the drain the
    * expired span drops via the metadata-only
    * [[graft.sources.TxLake.dropWhereExpired]] — continuous ingest plus
    * periodic expiry, the production retention cadence, with the expiry
    * costing one log entry and zero data I/O however much history
    * accumulated. Requires time-sliced source files (the q259 staging
    * contract) so every batch's files sit entirely on one side of any
    * slice-boundary cutoff.
    */
  def ingestWithRetention(
      spark: SparkSession,
      eventsPath: String,
      scratchDir: String,
      cutoffSec: Long): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lake"
    val q = EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts").cast("long").as("sec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.TxLake.commit(spark, lake, batch, statsCols = Seq("sec"))
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.dropWhereExpired(lake, "sec", cutoffSec)
    graft.sources.TxLake.readSnapshot(spark, lake)
  }

  /** Streaming maintenance of a per-type OBSERVED-HOUR store — the standing
    * state a freshness/completeness monitor keeps (O(active hours), never
    * the events): each micro-batch folds its distinct (type, hour) pairs
    * into a TxLake snapshot via exactly-once tagged commits. Union is
    * commutative and idempotent, so the batch-split store equals the
    * batch-built one regardless of how the engine slices micro-batches —
    * the drained store feeds the same gap-island computation the batch
    * audit (q233) runs, against the same oracle.
    *
    * Scope note: each commit rewrites the whole hour store — O(state)
    * I/O per batch, which is the right trade ONLY because this store is
    * O(active hours) (thousands of rows, one file). Reusing this pattern
    * for state that grows with data requires append-style commits plus
    * periodic compaction, or a keyed merge ([[TxLake.mergeByKeyNewest]])
    * so a batch touches only the partitions it changes.
    */
  def hourSetMaintenance(
      spark: SparkSession,
      events: DataFrame,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val src = s"$scratchDir/ev"
    val lake = s"$scratchDir/hours"
    val staged = events
      .select(col("event_type"), expr("(ts div 1000000000) div 3600").as("h"))
      .withColumn("__b", pmod(col("h"), lit(3)))
      .localCheckpoint(true)
    (0 until 3).foreach { b =>
      staged.filter(col("__b") === b).drop("__b")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val q = spark.readStream
      .schema(staged.drop("__b").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val hrs = batch.select(col("event_type"), col("h"))
          .distinct().localCheckpoint(true)
        val state =
          if (graft.sources.TxLake.latestVersion(lake) == 0L) hrs.limit(0)
          else graft.sources.TxLake.readSnapshot(spark, lake)
        graft.sources.TxLake.commit(spark, lake,
          state.unionByName(hrs).distinct().coalesce(1),
          overwrite = true, tag = s"hours-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.sources.TxLake.readSnapshot(spark, lake)
  }

  /** The streaming debounce ([[EventsStream.debounce]]) drained through
    * the oracle gate: time-sliced input files (the q259 staging contract,
    * maxFilesPerTrigger=1) exercise REAL cross-batch state carry — a kept
    * event in batch 0 suppresses a batch-1 event inside the gap — and the
    * update-mode emissions are final, so the drained union must equal the
    * batch per-key greedy fold exactly.
    */
  def debounceStream(
      spark: SparkSession, eventsPath: String, gapSec: Long): DataFrame = {
    val kept = EventsStream.debounce(spark,
      EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)),
      gapSec)
    drain(spark, kept, "update")
  }

  /** The streaming z-score monitor ([[EventsStream.zscoreAlerts]])
    * drained through the oracle gate: time-sliced files (the q259
    * contract) carry REAL per-key (n, Σ, Σ²) state across batches — an
    * alert's baseline spans every earlier slice — and the update-mode
    * emissions are final, so the drained union must equal the batch
    * exclusive-prefix-window replay exactly.
    */
  def zscoreStream(
      spark: SparkSession, eventsPath: String, minN: Int, z: Int): DataFrame = {
    val alerts = EventsStream.zscoreAlerts(spark,
      EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)),
      minN, z)
    drain(spark, alerts, "update")
  }

  /** The transformWithState profile ([[EventsStream.twsProfile]]) drained
    * through the oracle gate. The arbitrary-state v2 operator requires
    * the RocksDB state store — set for this query only and restored
    * after (every other streaming query keeps the default HDFS-backed
    * store, so the engine exercises BOTH providers under the gate).
    * Emissions are cumulative per key, so the drained union reduces to
    * the per-key max — which must equal the batch sessionization count.
    */
  def twsProfileStream(
      spark: SparkSession, eventsPath: String, gapSec: Long): DataFrame =
    withRocksDb(spark) {
      drain(spark, EventsStream.twsProfile(spark,
        EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)),
        gapSec), "update")
    }

  /** Drain for PROCESSING-TIME-mode stateful queries: in that mode
    * `shouldRunAnotherBatch` is unconditionally true (wall-clock always
    * advances for TTL/timers), so the trigger loop never reaches the
    * "no new data" state — `Trigger.AvailableNow` never terminates AND
    * `processAllAvailable()` parks forever while empty no-data batches
    * spin. The deterministic drain: count processed input rows through a
    * StreamingQueryListener and stop the query once every expected row
    * has been committed (listener fires AFTER a batch's sink commit, so
    * the memory table already holds that batch's emissions).
    */
  private def drainProcessingTime(
      spark: SparkSession, df: DataFrame, mode: String,
      expectedInputRows: Long): DataFrame = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val name = s"graft_sv_${n.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val done = new java.util.concurrent.CountDownLatch(1)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.name == name &&
            seen.addAndGet(e.progress.numInputRows) >= expectedInputRows) {
          done.countDown()
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
      try {
        require(done.await(300, java.util.concurrent.TimeUnit.SECONDS),
          s"drainProcessingTime: only ${seen.get()} of $expectedInputRows " +
            "input rows processed before timeout")
      } finally q.stop()
      q.awaitTermination()
      spark.table(name).localCheckpoint(true)
    } finally {
      spark.streams.removeListener(listener)
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.catalog.dropTempView(name)
      settle(spark)
    }
  }

  /** transformWithState requires the RocksDB state store provider — set
    * for the body and restored after, so every other streaming query
    * keeps the default HDFS-backed store and the suite exercises BOTH
    * providers under the gate.
    */
  private def withRocksDb(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Event-time TIMER sessionization ([[EventsStream.twsSessionTimers]])
    * drained through the oracle gate: time-sliced files carry open
    * sessions across batches; the far-future sentinel (latest mtime, so
    * processed last) advances the watermark past every real session's
    * close and every registered timer fires — append-mode emissions are
    * final and must equal batch q15 sessionization row for row. The
    * sentinel key's own timer can never fire (the watermark trails its
    * event time), so the id filter is defensive only.
    */
  def twsSessionTimersStream(
      spark: SparkSession, eventsPath: String, gapSec: Long): DataFrame =
    withRocksDb(spark) {
      drain(spark, EventsStream.twsSessionTimers(spark,
        EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)),
        gapSec), "append")
        .filter(col("user_id") >= 0)
    }

  /** TTL'd first-seen dedup ([[EventsStream.twsFirstSeenTtl]]) drained
    * through the oracle gate with a TTL far above the drain's wall-clock:
    * nothing expires mid-run, so cross-batch suppression is REAL (a key
    * first seen in batch 0 must stay silent in batch 2) and the drained
    * union equals exact batch first-per-key. StreamingSpec separately
    * proves expiry with a short TTL across checkpoint-resumed runs.
    */
  def twsFirstSeenTtlStream(
      spark: SparkSession, eventsPath: String,
      ttl: java.time.Duration): DataFrame =
    withRocksDb(spark) {
      val expected = spark.read
        .schema(EventsStream.rawEventsSchema).parquet(eventsPath).count()
      drainProcessingTime(spark, EventsStream.twsFirstSeenTtl(spark,
        EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1)),
        ttl), "update", expected)
    }

  /** Seeded lifetime profile ([[EventsStream.twsProfileSeeded]]) drained
    * through the oracle gate: only events STRICTLY AFTER `cutoffSec`
    * stream; everything at or before it arrives solely through the
    * batch-computed initial state — so the drained totals equal the
    * full-history aggregate only if `handleInitialState` installed the
    * seed.
    */
  def twsProfileSeededStream(
      spark: SparkSession, eventsPath: String, initial: DataFrame,
      cutoffSec: Long): DataFrame =
    withRocksDb(spark) {
      drain(spark, EventsStream.twsProfileSeeded(spark,
        EventsStream.readEvents(spark, eventsPath, maxFilesPerTrigger = Some(1))
          .filter(unix_timestamp(col("ts")) > cutoffSec),
        initial), "update")
    }

  /** STREAMING 2×2 EFFECT-SIZE maintenance — q563's proportion-effect
    * readout as an ingestion side effect: each micro-batch commits its
    * FOUR exact 2×2 cells (one row: n_a/n_b/conv_a/conv_b partials,
    * which ADD), the drained readout goes through
    * [[graft.operators.Drift.propEffectsFromCells]] — bit-identical to
    * the one-pass batch answer, oracle shared verbatim. The
    * experiment's effect sizes and CIs stay current at ingest cadence
    * with O(1) state per batch — the cheapest store on the shelf.
    * Input rows carry (arm ∈ {0,1}, conv ∈ {0,1}).
    */
  def propEffectsMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/pe"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.agg(
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") =!= 0L, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("arm") === 0L, col("conv")).otherwise(0L))
              .as("conv_a"),
            sum(when(col("arm") =!= 0L, col("conv")).otherwise(0L))
              .as("conv_b"))
            .coalesce(1),
          tag = s"pe-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.propEffectsFromCells(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"),
          col("conv_a").cast("long").as("conv_a"),
          col("conv_b").cast("long").as("conv_b")))
  }

  /** STREAMING EQUIVALENCE-GATE maintenance — q600's TOST verdict as
    * an ingestion side effect: the same O(1) 2×2 cell partials as
    * [[propEffectsMaintenance]] (they ADD), drained through
    * [[graft.operators.Drift.tostFromCells]] — the no-regression
    * release gate stays current at ingest cadence, oracle shared
    * verbatim with batch q600.
    */
  def tostMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String,
      delta: Double): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/te"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.agg(
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") =!= 0L, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("arm") === 0L, col("conv")).otherwise(0L))
              .as("conv_a"),
            sum(when(col("arm") =!= 0L, col("conv")).otherwise(0L))
              .as("conv_b"))
            .coalesce(1),
          tag = s"te-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.tostFromCells(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("n_a").cast("long").as("n_a"),
          col("n_b").cast("long").as("n_b"),
          col("conv_a").cast("long").as("conv_a"),
          col("conv_b").cast("long").as("conv_b")), delta)
  }

  /** STREAMING p-CHART maintenance — q592's attribute control chart
    * as an ingestion side effect: per-batch (day, n, x) subgroup
    * partials land exactly-once and ADD, the drained chart goes
    * through [[graft.operators.Drift.pChartFromCensus]] — center line,
    * per-day limits and OOC verdicts bit-identical to the one-pass
    * batch answer, oracle shared verbatim. State is O(days) rows —
    * calendar-bounded, the SPC monitor at ingest cadence.
    */
  def pChartMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/pc"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("b"))
            .agg(count(lit(1)).as("n"), sum(col("x")).as("x"))
            .coalesce(1),
          tag = s"pc-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.pChartFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("b").cast("long").as("b"),
          col("n").cast("long").as("n"), col("x").cast("long").as("x")))
  }

  /** STREAMING CIRCULAR-RHYTHM maintenance — q602's time-of-day
    * statistics as an ingestion side effect: per-batch (key, slot)
    * censuses land exactly-once and ADD, the drained mean
    * direction/resultant/Rayleigh go through
    * [[graft.operators.Trend.circularFromCensus]] — bit-identical to
    * the one-pass batch answer, oracle shared verbatim. State is
    * O(keys × slots) rows, slot-domain-bounded.
    */
  def circularMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/ci"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("k"), col("s")).agg(count(lit(1)).as("c"))
            .coalesce(1),
          tag = s"ci-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Trend.circularFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("k").cast("string").as("k"),
          col("s").cast("long").as("s"), col("c").cast("long").as("c")))
  }

  /** STREAMING LEADERBOARD-CONCORDANCE maintenance — q618's Kendall W
    * as an ingestion side effect: per-batch (rater, item) score
    * partials land exactly-once and ADD, the drained concordance goes
    * through [[graft.operators.Drift.kendallWFromCensus]] —
    * bit-identical to the one-pass batch answer, oracle shared
    * verbatim. State is O(raters × items) rows, calendar × domain
    * bounded.
    */
  def kendallWMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/kw"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("r"), col("it")).agg(count(lit(1)).as("s"))
            .coalesce(1),
          tag = s"kw-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.kendallWFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("r").cast("string").as("r"),
          col("it").cast("string").as("it"), col("s").cast("long").as("s")))
  }

  /** STREAMING DISPROPORTIONALITY maintenance — q621's PRR/ROR screen
    * as an ingestion side effect: per-batch (segment, outcome) cell
    * partials land exactly-once and ADD, the drained screen goes
    * through [[graft.operators.Drift.disproportionalityFromCensus]] —
    * every cell's signal verdict bit-identical to the one-pass batch
    * answer, oracle shared verbatim. State is O(segments × outcomes)
    * rows — the safety-signal monitor at ingest cadence.
    */
  def disproMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/dp"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("seg"), col("out")).agg(count(lit(1)).as("a"))
            .coalesce(1),
          tag = s"dp-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.disproportionalityFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("seg").cast("string").as("seg"),
          col("out").cast("string").as("out"),
          col("a").cast("long").as("a")))
  }

  /** STREAMING ORDINAL-ASSOCIATION maintenance — q566's
    * gamma/Somers'-D family as an ingestion side effect: per-batch
    * (x, y) censuses land exactly-once, cell counts ADD (concordance,
    * discordance and every tie mass are census-grid functionals), the
    * drained readout goes through
    * [[graft.operators.Relational.gkGammaFromCensus]] — bit-identical
    * to the one-pass batch answer, oracle shared verbatim. State is
    * O(ordinal domain²) rows per batch, bounded however large the
    * corpus.
    */
  /** STREAMING DIVERSITY maintenance — q568's Hill-number profile as
    * an ingestion side effect: per-batch (group, unit) censuses land
    * exactly-once, unit counts ADD (richness, Shannon and Σc² are all
    * census functionals), the drained readout goes through
    * [[graft.operators.Profiling.hillNumbersFromCensus]] —
    * bit-identical to the one-pass batch answer, oracle shared
    * verbatim. State is O(groups × units) rows, the audience-census
    * bound.
    */
  def hillMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String,
      groupCol: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/hn"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("g"), col("u")).agg(count(lit(1)).as("c"))
            .coalesce(1),
          tag = s"hn-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Profiling.hillNumbersFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("g").cast("string").as("g"),
          col("u").cast("string").as("u"),
          col("c").cast("long").as("c")), groupCol)
  }

  /** STREAMING LORENZ/INEQUALITY maintenance — q626's decile table as
    * an ingestion side effect: per-batch (group, value) censuses commit
    * exactly-once and simply ADD (a value census is a pure count
    * functional), so the drained decile sweep through
    * [[graft.operators.Relational.lorenzFromCensus]] is bit-identical
    * to the one-pass batch answer — oracle shared verbatim. State is
    * value-domain-sized per group per batch; the decile bracket join
    * runs only at READ time over the merged census.
    */
  def lorenzMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/lz"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
            .coalesce(1),
          tag = s"lz-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Relational.lorenzFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("g").cast("string").as("g"),
          col("x").cast("long").as("x"), col("t").cast("long").as("t")))
  }

  /** STREAMING CONCURRENCY maintenance — q635's sweep as an ingestion
    * side effect: each batch commits its interval-total partials and
    * boundary deltas (both pure SUMS/MIN/MAX — they add across batches),
    * so the drained readout through
    * [[graft.operators.Relational.concurrencyFromCensus]] is
    * bit-identical to the one-pass batch sweep — oracle shared verbatim.
    * Committed state is boundary-domain-sized per batch, never
    * interval-row-sized standing state.
    */
  def concurrencyMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lakeT = s"$scratchDir/cct"
    val lakeB = s"$scratchDir/ccb"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.types.DecimalType
        val d38 = DecimalType(38, 0)
        graft.sources.TxLake.commit(spark, lakeT,
          batch.agg(count(lit(1)).as("cnt"), min(col("s")).as("s"),
            max(col("e")).as("e"),
            sum((col("e") - col("s")).cast(d38)).as("dur")).coalesce(1),
          tag = s"cct-$id")
        graft.sources.TxLake.commit(spark, lakeB,
          batch.select(col("s").as("sec"), lit(1L).as("d"))
            .unionByName(batch.select(col("e").as("sec"),
              lit(-1L).as("d")))
            .groupBy(col("sec")).agg(sum(col("d")).as("d")).coalesce(1),
          tag = s"ccb-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Relational.concurrencyFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lakeT)
        .select(col("cnt").cast("long").as("cnt"),
          col("s").cast("long").as("s"), col("e").cast("long").as("e"),
          col("dur")),
      graft.sources.TxLake.readSnapshot(spark, lakeB)
        .select(col("sec").cast("long").as("sec"),
          col("d").cast("long").as("d")))
  }

  /** STREAMING LTV maintenance — q642's payback curves as an ingestion
    * side effect. Staging contract: ENTITY-PARTITIONED batches (each
    * unit's whole history lands in ONE batch — a unit's first-activity
    * date is not mergeable across batches; partitioned, the per-batch
    * (cohort, age_week) activity/revenue censuses and cohort sizes
    * simply ADD). Drained through
    * [[graft.operators.Relational.ltvFromCensus]] — bit-identical to
    * the one-pass batch answer, oracle shared verbatim. State is
    * (cohort × week)-domain-sized per batch.
    */
  def ltvMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lakeC = s"$scratchDir/ltc"
    val lakeS = s"$scratchDir/lts"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch
          .withColumn("f", min(col("d")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("u"))))
          .select(col("u"), year(col("f")).cast("long").as("cohort"),
            expr("CAST(datediff(d, f) AS BIGINT) div 7").as("age_week"),
            col("v"))
        graft.sources.TxLake.commit(spark, lakeC,
          b.groupBy(col("cohort"), col("age_week"))
            .agg(count_distinct(col("u")).as("act"),
              sum(col("v")).as("rev")).coalesce(1),
          tag = s"ltc-$id")
        graft.sources.TxLake.commit(spark, lakeS,
          b.groupBy(col("cohort"))
            .agg(count_distinct(col("u")).as("sz")).coalesce(1),
          tag = s"lts-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Relational.ltvFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lakeC)
        .select(col("cohort").cast("long").as("cohort"),
          col("age_week").cast("long").as("age_week"),
          col("act").cast("long").as("act"),
          col("rev").cast("long").as("rev")),
      graft.sources.TxLake.readSnapshot(spark, lakeS)
        .select(col("cohort").cast("long").as("cohort"),
          col("sz").cast("long").as("sz")))
  }

  /** STREAMING MCF maintenance — q646's recurrent-event curve as an
    * ingestion side effect. Staging contract: ENTITY-PARTITIONED
    * batches (a unit's own first/last anchor is not mergeable across
    * batches; partitioned, each batch's event-age census and lifespan
    * census simply ADD). Drained through
    * [[graft.operators.Trend.mcfFromCensus]] — bit-identical to the
    * one-pass batch answer, oracle shared verbatim. State is
    * age-domain-sized per batch.
    */
  def mcfMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String,
      bucketSec: Long = 3600L): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lakeD = s"$scratchDir/mcd"
    val lakeL = s"$scratchDir/mcl"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("u"))
        val b = batch
          .withColumn("first", min(col("sec")).over(w))
          .withColumn("last", max(col("sec")).over(w))
        graft.sources.TxLake.commit(spark, lakeD,
          b.select(((col("sec") - col("first")) / bucketSec)
              .cast("long").as("a"))
            .groupBy(col("a")).agg(count(lit(1)).as("d")).coalesce(1),
          tag = s"mcd-$id")
        graft.sources.TxLake.commit(spark, lakeL,
          b.select(col("u"), ((col("last") - col("first")) / bucketSec)
              .cast("long").as("l")).distinct()
            .groupBy(col("l")).agg(count(lit(1)).as("w")).coalesce(1),
          tag = s"mcl-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Trend.mcfFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lakeD)
        .select(col("a").cast("long").as("a"),
          col("d").cast("long").as("d")),
      graft.sources.TxLake.readSnapshot(spark, lakeL)
        .select(col("l").cast("long").as("l"),
          col("w").cast("long").as("w")))
  }

  /** STREAMING IV maintenance — q650's Wald estimate as an ingestion
    * side effect: per-batch (z, x) cell censuses (units are one row
    * each, so any batching adds); drained estimate ≡ batch q650 through
    * [[graft.operators.Drift.ivWaldFromCensus]] — oracle shared
    * verbatim. State is four cells per batch.
    */
  def ivMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/iv"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("z"), col("x"))
            .agg(count(lit(1)).as("n"), sum(col("y")).as("e"))
            .coalesce(1),
          tag = s"iv-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.ivWaldFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("z").cast("boolean").as("z"),
          col("x").cast("long").as("x"), col("n").cast("long").as("n"),
          col("e").cast("long").as("e")))
  }

  /** STREAMING PAIRED-FLOW maintenance — q580's Bowker symmetry test
    * as an ingestion side effect. The staging contract is
    * ENTITY-PARTITIONED batches: each user's whole event history lands
    * in ONE batch (first/last within a user is NOT mergeable across
    * batches — split a user and the pair census lies; partitioned, the
    * per-batch paired censuses simply ADD). Each batch folds its own
    * users to (first, last) pairs and commits the (b, a) census
    * exactly-once; the drained test goes through
    * [[graft.operators.Drift.bowkerFromCensus]] — bit-identical to the
    * one-pass batch answer, oracle shared verbatim. State is O(k²)
    * census rows per batch.
    */
  def bowkerMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/bw"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fl = batch.groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
            .as("f"),
            max(struct(col("ts"), col("event_id"), col("event_type")))
              .as("l"))
          .select(col("f.event_type").as("b"), col("l.event_type").as("a"))
        graft.sources.TxLake.commit(spark, lake,
          fl.groupBy(col("b"), col("a")).agg(count(lit(1)).as("n"))
            .coalesce(1),
          tag = s"bw-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Drift.bowkerFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("b").cast("string").as("b"),
          col("a").cast("string").as("a"), col("n").cast("long").as("n")))
  }

  /** STREAMING EXTREME-VALUE maintenance — q589's Gumbel return
    * levels as an ingestion side effect. Staging contract:
    * entity-partitioned batches own WHOLE base buckets (hours), so
    * each batch's hourly counts are final and its per-block maxima
    * are true partials — MAX merges, the drained re-max equals the
    * one-pass block census and the fit goes through
    * [[graft.operators.Trend.gumbelFromBlockMaxima]] (oracle shared
    * verbatim). State is O(keys × blocks) rows — calendar-bounded.
    * Input rows carry (g, hour_id).
    */
  def gumbelMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String,
      blockSize: Int = 24): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/gm"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("g"), col("hour_id"))
            .agg(count(lit(1)).as("n"))
            .groupBy(col("g"),
              (col("hour_id") / blockSize).cast("long").as("blk"))
            .agg(max(col("n")).as("m"))
            .coalesce(1),
          tag = s"gm-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Trend.gumbelFromBlockMaxima(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("g").cast("string").as("g"),
          col("blk").cast("long").as("blk"), col("m").cast("long").as("m")),
      "event_type")
  }

  def gkGammaMaintenance(
      spark: SparkSession,
      srcPath: String,
      scratchDir: String): DataFrame = {
    graft.sources.LocalFs.deleteRecursively(scratchDir)
    val lake = s"$scratchDir/gk"
    val q = spark.readStream
      .schema(spark.read.parquet(srcPath).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.sources.TxLake.commit(spark, lake,
          batch.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
            .coalesce(1),
          tag = s"gk-$id")
        ()
      }
      .option("checkpointLocation", s"$scratchDir/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    settle(spark)
    graft.operators.Relational.gkGammaFromCensus(
      graft.sources.TxLake.readSnapshot(spark, lake)
        .select(col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), col("c").cast("long").as("c")))
  }
}
