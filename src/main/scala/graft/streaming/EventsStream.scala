package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

case class StreamEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double) {
  def sec: Long = ts.getTime / 1000
}

case class SessionBuf(start: Long, end: Long, n: Int)

/** Update-mode sessionizer state: ALL of a user's sessions so far (the
  * bounded-run verification shape; production pairs this with timeout
  * eviction of watermark-closed sessions).
  */
case class SessionSetBuf(sessions: Seq[SessionBuf])

case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long, n_events: Int)

/** Structured Streaming variants of the batch event operators.
  *
  * `readStream` → watermark → windowed agg / stateful sessionization →
  * `writeStream`. The batch equivalents (SparkEntry q14/q15) share the same
  * aggregation logic — including the exact-decimal money-sum pattern — which
  * is the Spark-native way to keep batch and streaming consistent.
  */
object EventsStream {

  /** Raw schema as stored: the events lake stores parquet TIMESTAMP(MICROS)
    * without UTC adjustment, which Spark surfaces as TIMESTAMP_NTZ. The
    * stream declares exactly the storage schema so the lake is consumed in
    * place — no rewrite-staging pass, which matters when the directory being
    * streamed is the 100 TB lake itself. Staged side-inputs (sentinels,
    * parity halves, test fixtures) must be written with this same schema.
    */
  val rawEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Build the NTZ wall-clock value for a given epoch second — the writer
    * dual of [[readEvents]]'s UTC interpretation (GraftSession pins the
    * session timezone to UTC, so NTZ wall-clock == UTC instant).
    */
  def ntzOfEpochSec(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  /** File-source stream over a directory of event parquet files, surfaced
    * with a proper second-floored TimestampType `ts` (matching the batch
    * operators' time arithmetic).
    *
    * `maxFilesPerTrigger` / `maxBytesPerTrigger` bound each micro-batch —
    * the production knob that keeps a backlogged directory (or a bulk
    * backfill) from turning the first trigger into one giant batch that
    * overwhelms state stores and sinks. Unset = drain everything available
    * per trigger (the verification default).
    */
  def readEvents(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Option[Int] = None,
      maxBytesPerTrigger: Option[String] = None): DataFrame = {
    val reader = spark.readStream.schema(rawEventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    maxBytesPerTrigger.foreach(b => reader.option("maxBytesPerTrigger", b))
    reader.parquet(dir)
      // NTZ wall-clock read as UTC (session tz is pinned UTC), floored to
      // the second — the same integer arithmetic as the batch operators
      .withColumn("ts",
        timestamp_seconds(expr("unix_micros(cast(ts as timestamp)) div 1000000")))
  }

  /** Tumbling 1-hour windowed counts per event type with a 2-hour watermark.
    * Money sums use the same exact-decimal accumulation as batch q14 —
    * a raw double sum would drift from the batch result run-to-run.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))

  /** Continuous bronze load: micro-batches append under
    * `date_id/batch_id=<id>` partitions with dynamic overwrite — a REPLAYED
    * batch id replaces exactly its own partition (idempotent under
    * checkpoint recovery) while different batches of the same day coexist.
    * Overwriting bare `date_id` per batch would delete earlier batches of
    * the same day.
    */
  def toLake(events: DataFrame, path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .withColumn("date_id", date_format(col("ts"), "yyyy-MM-dd"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.PartitionedLake.deleteInsert(
          batch.withColumn("batch_id", lit(batchId)),
          path, Seq("date_id", "batch_id"))
      }

  /** Streaming exact dedup on the key columns alone, state bounded by the
    * watermark: a duplicate redelivered with a different ingest timestamp is
    * still suppressed (keying on ts as well would let it through).
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Gap-based sessionization with UPDATE-mode emission: every micro-batch
    * emits the CURRENT merged state of each session that changed in it —
    * the operational mode for live dashboards, where waiting for the
    * watermark to close a session (append mode, [[sessionize]]) is too
    * late. Spark 4 rejects `session_window` aggregations in update mode
    * ([STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION]), so update-mode
    * sessionization goes through the engine's supported path:
    * `flatMapGroupsWithState(OutputMode.Update)`.
    *
    * Semantics: state holds the user's disjoint sessions; batch events
    * enter as singletons and a single sorted merge pass folds anything
    * within `gapSec` together (the same inclusive-at-gap rule as batch
    * q15 and `session_window`). Exactly the sessions absent from the
    * previous state — new or widened — are emitted, so a downstream
    * consumer upserting by (user, overlapping-window) converges to the
    * batch answer; a session is never emitted twice unchanged.
    */
  def sessionizeUpdates(
      spark: SparkSession,
      events: DataFrame,
      gapSec: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[StreamEvent], state: GroupState[SessionSetBuf]) => {
          val existing = state.getOption.map(_.sessions.toVector)
            .getOrElse(Vector.empty)
          val singletons = it.toSeq.map(e => SessionBuf(e.sec, e.sec, 1))
          if (singletons.isEmpty) Iterator.empty
          else {
            val merged = (existing ++ singletons)
              .sortBy(b => (b.start, b.end))
              .foldLeft(Vector.empty[SessionBuf]) { (acc, b) =>
                acc.lastOption match {
                  case Some(p) if b.start <= p.end + gapSec =>
                    acc.init :+
                      SessionBuf(p.start, math.max(p.end, b.end), p.n + b.n)
                  case _ => acc :+ b
                }
              }
            state.update(SessionSetBuf(merged))
            val before = existing.toSet
            merged.filterNot(before.contains)
              .map(b => SessionOut(user, b.start, b.end, b.n)).iterator
          }
        })
  }

  /** Gap-based sessionization with explicit state.
    *
    * - Event-time timeout + watermark: a user's FINAL session is flushed
    *   when the watermark passes its close, and the user's state is freed
    *   (NoTimeout would hold every user's last session forever).
    * - Late events inside the session window extend it with min/max (a
    *   blind `end = late.sec` would move a session's end backwards).
    * - Late events older than the window by more than the gap are emitted
    *   as standalone singleton sessions.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapSec: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      // keep the watermarked ts column itself — event-time timeout requires
      // it to reach the grouped Dataset
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, it: Iterator[StreamEvent], state: GroupState[SessionBuf]) => {
          if (!state.hasTimedOut && it.isEmpty) {
            Iterator.empty
          } else if (state.hasTimedOut) {
            val out = state.getOption
              .map(b => SessionOut(user, b.start, b.end, b.n)).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.sec, e.event_id))
            var buf = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              buf match {
                case Some(b) if e.sec >= b.start - gapSec && e.sec <= b.end + gapSec =>
                  buf = Some(SessionBuf(math.min(b.start, e.sec), math.max(b.end, e.sec), b.n + 1))
                case Some(b) if e.sec > b.end + gapSec =>
                  out += SessionOut(user, b.start, b.end, b.n)
                  buf = Some(SessionBuf(e.sec, e.sec, 1))
                case Some(_) => // older than the open session by > gap
                  out += SessionOut(user, e.sec, e.sec, 1)
                case None =>
                  buf = Some(SessionBuf(e.sec, e.sec, 1))
              }
            }
            buf.foreach { b =>
              state.update(b)
              // flush when the watermark passes the session close; timeout
              // must be set strictly beyond the current watermark
              state.setTimeoutTimestamp(math.max((b.end + gapSec) * 1000L,
                state.getCurrentWatermarkMs + 1000L))
            }
            out.result().iterator
          }
        })
  }

  /** Streaming debounce/throttle: per (user, event_type), emit an event
    * only if at least `gapSec` elapsed since the LAST EMITTED one — the
    * telemetry rate-limiter (alert storms, duplicate beacons) as a
    * stateful operator. State is one long per key (the last-kept second):
    * O(keys), unbounded history never retained. Update mode: kept events
    * are final the moment they're emitted. Within a batch the group is
    * sorted by (sec, event_id); across batches correctness needs
    * time-sliced input files (the q259 staging contract), the same
    * in-order-source requirement any streaming debounce has.
    */
  def debounce(
      spark: SparkSession,
      events: DataFrame,
      gapSec: Long): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    typed
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (Long, String), it: Iterator[StreamEvent],
            state: GroupState[Long]) => {
          var lk = state.getOption.getOrElse(Long.MinValue / 2)
          val kept = it.toSeq.sortBy(e => (e.sec, e.event_id)).flatMap { e =>
            if (e.sec >= lk + gapSec) { lk = e.sec; Some((key._1, key._2, e.sec)) }
            else None
          }
          state.update(lk)
          kept.iterator
        })
      .toDF("user_id", "event_type", "kept_sec")
  }

  /** Streaming running z-score monitor: per event type, three longs of
    * state (n, Σcents, Σcents²) — Welford without the float drift — and
    * an alert whenever a point sits more than `z` sigmas from the mean of
    * everything BEFORE it (the online anomaly gate; the point then joins
    * the baseline). The test is evaluated in exact BigInt arithmetic,
    *   (n·v − Σ)² > z²·(n·Σ² − Σ²),
    * so no engine float rounding can flip an alert — the batch oracle
    * replays it in int128. Events fold in (sec, event_id) order within a
    * batch; the time-sliced staging contract (q259) makes cross-batch
    * order the same global order, so streaming equals the batch prefix
    * windows row for row. Alerts need `minN` prior points.
    */
  def zscoreAlerts(
      spark: SparkSession,
      events: DataFrame,
      minN: Int,
      z: Int): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    typed
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[StreamEvent],
            state: GroupState[(Long, Long, Long)]) => {
          var (n, s, sq) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = it.toSeq.sortBy(e => (e.sec, e.event_id)).flatMap { e =>
            val c = java.math.BigDecimal.valueOf(e.value)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2).longValueExact()
            val alert = n >= minN && {
              val lhs = BigInt(n) * c - BigInt(s)
              lhs * lhs > BigInt(z.toLong * z) *
                (BigInt(n) * sq - BigInt(s) * BigInt(s))
            }
            val res =
              if (alert) Some((key, e.sec, e.event_id, c, n)) else None
            // exact accumulation: cents² can overflow a Long after ~9M
            // rows per key; fail loudly rather than silently flip alerts
            n += 1
            s = Math.addExact(s, c)
            sq = Math.addExact(sq, Math.multiplyExact(c, c))
            res
          }
          state.update((n, s, sq))
          out.iterator
        })
      .toDF("event_type", "sec", "event_id", "value_cents", "n_prior")
  }

  /** Per-user lifetime profile on the ARBITRARY-STATE V2 API
    * (`transformWithState`, Spark 4's successor to
    * flatMapGroupsWithState): TWO independently-typed named value states
    * per key — the last-seen second (session tracking) and the
    * (events, sessions) counters — maintained by a `StatefulProcessor`
    * against the RocksDB state store. A gap > `gapSec` opens a new
    * session (the q15 rule). Update-mode emissions are cumulative and
    * monotone, so the drained final row per key is a plain max.
    */
  def twsProfile(
      spark: SparkSession,
      events: DataFrame,
      gapSec: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    import org.apache.spark.sql.{Encoder, Encoders}
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    val processor = new org.apache.spark.sql.streaming.StatefulProcessor[
        Long, StreamEvent, (Long, Long, Long)] {
      @transient private var lastSec:
        org.apache.spark.sql.streaming.ValueState[Long] = _
      @transient private var counts:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _
      override def init(outputMode: OutputMode,
          timeMode: TimeMode): Unit = {
        lastSec = getHandle.getValueState[Long]("lastSec",
          Encoders.scalaLong, TTLConfig.NONE)
        val tupleEnc: Encoder[(Long, Long)] =
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
        counts = getHandle.getValueState[(Long, Long)]("counts",
          tupleEnc, TTLConfig.NONE)
      }
      override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
          timerValues: org.apache.spark.sql.streaming.TimerValues)
          : Iterator[(Long, Long, Long)] = {
        var ls = if (lastSec.exists()) lastSec.get() else Long.MinValue / 2
        var (ne, ns) =
          if (counts.exists()) counts.get() else (0L, 0L)
        rows.toSeq.sortBy(e => (e.sec, e.event_id)).foreach { e =>
          if (e.sec - ls > gapSec) ns += 1
          ls = e.sec; ne += 1
        }
        lastSec.update(ls)
        counts.update((ne, ns))
        Iterator.single((key, ne, ns))
      }
    }
    typed
      .groupByKey(_.user_id)
      .transformWithState(processor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "n_sessions")
  }

  /** Gap-session FINALIZATION via EVENT-TIME TIMERS on the arbitrary-state
    * v2 API — the [[twsProfile]] family member that exercises
    * `registerTimer` / `handleExpiredTimer`: sessions closed by an
    * observed in-data gap emit from `handleInputRows`; each key's LAST
    * open session is closed by a registered event-time timer at
    * (last + gap) once the watermark passes it — the production "emit
    * exactly once, when provably complete" pattern without
    * `session_window`. Exactly one live timer per key (each batch deletes
    * stale timers before re-registering), and `handleExpiredTimer` guards
    * on the watermark so a timer racing a same-batch extension can never
    * emit a still-open session. Watermark delay (2h) > gap (≤30min) means
    * a fired timer's session is provably un-extendable under time-ordered
    * slices. Append-mode emissions are final; the drained union must
    * equal batch q15 sessionization row for row.
    */
  def twsSessionTimers(
      spark: SparkSession,
      events: DataFrame,
      gapSec: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    val typed = events
      .withWatermark("ts", "2 hours")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    val processor = new org.apache.spark.sql.streaming.StatefulProcessor[
        Long, StreamEvent, (Long, Long, Long, Long)] {
      @transient private var open: ValueState[(Long, Long, Long)] = _
      override def init(outputMode: OutputMode,
          timeMode: TimeMode): Unit = {
        val enc = Encoders.tuple(
          Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
        open = getHandle.getValueState[(Long, Long, Long)]("open", enc,
          TTLConfig.NONE)
      }
      override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
          timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
        var cur = if (open.exists()) Option(open.get()) else None
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        rows.toSeq.sortBy(e => (e.sec, e.event_id)).foreach { e =>
          cur match {
            case Some((st, la, n)) if e.sec - la > gapSec =>
              out += ((key, st, la, n))
              cur = Some((e.sec, e.sec, 1L))
            case Some((st, la, n)) =>
              cur = Some((st, math.max(la, e.sec), n + 1L))
            case None =>
              cur = Some((e.sec, e.sec, 1L))
          }
        }
        cur.foreach { case (st, la, n) =>
          open.update((st, la, n))
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer((la + gapSec) * 1000L + 1000L)
        }
        out.iterator
      }
      override def handleExpiredTimer(key: Long, timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo)
          : Iterator[(Long, Long, Long, Long)] = {
        if (open.exists()) {
          val (st, la, n) = open.get()
          // only emit a session the watermark has provably closed — a
          // stale timer surviving a same-batch re-registration must not
          // flush the REPLACEMENT session early
          if ((la + gapSec) * 1000L < timerValues.getCurrentWatermarkInMs()) {
            open.clear()
            Iterator.single((key, st, la, n))
          } else Iterator.empty
        } else Iterator.empty
      }
    }
    typed
      .groupByKey(_.user_id)
      .transformWithState(processor, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_sec", "end_sec", "n_events")
  }

  /** First-seen emission per (user, event_type) with TTL'd state — the
    * [[twsProfile]] family member that exercises a REAL `TTLConfig`
    * duration: the "seen" marker is value state created with a TTL, so at
    * production scale the key space self-evicts instead of growing
    * forever (the dedup-state retention knob `dropDuplicatesWithinWatermark`
    * ties to the watermark, this ties to wall-clock age). TTL is
    * processing-time by API contract, so the verification gate runs with
    * a TTL far above the drain's wall-clock (nothing expires: result ==
    * exact batch first-per-key, oracle-hashable); StreamingSpec proves
    * actual expiry with a short TTL across two checkpoint-resumed runs.
    */
  def twsFirstSeenTtl(
      spark: SparkSession,
      events: DataFrame,
      ttl: java.time.Duration): DataFrame = {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig,
      ValueState}
    import org.apache.spark.sql.Encoders
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    val processor = new org.apache.spark.sql.streaming.StatefulProcessor[
        (Long, String), StreamEvent, (Long, String, Long, Long)] {
      @transient private var seen: ValueState[Long] = _
      override def init(outputMode: OutputMode,
          timeMode: TimeMode): Unit = {
        seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
          TTLConfig(ttl))
      }
      override def handleInputRows(key: (Long, String),
          rows: Iterator[StreamEvent], timerValues: TimerValues)
          : Iterator[(Long, String, Long, Long)] = {
        val batch = rows.toSeq
        if (seen.exists()) Iterator.empty
        else {
          val first = batch.minBy(e => (e.sec, e.event_id))
          seen.update(first.sec)
          Iterator.single((key._1, key._2, first.sec, first.event_id))
        }
      }
    }
    typed
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(processor, TimeMode.ProcessingTime(),
        OutputMode.Update())
      .toDF("user_id", "event_type", "first_sec", "first_event_id")
  }

  /** Lifetime per-user totals SEEDED from batch state — the
    * [[twsProfile]] family member that exercises
    * `StatefulProcessorWithInitialState`: the migration shape for moving a
    * standing aggregate onto a new streaming job without replaying
    * history. `handleInitialState` installs each key's batch-computed
    * (n_events, sum_cents) before the first input batch; the stream then
    * accumulates on top with the exact-cents arithmetic of
    * [[zscoreAlerts]]. Update-mode emissions are cumulative and monotone
    * in n, so the drained per-key argmax must equal the FULL-history
    * batch aggregate — which only holds if the seed was actually applied.
    */
  def twsProfileSeeded(
      spark: SparkSession,
      events: DataFrame,
      initial: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig,
      ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}
    import spark.implicits._
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent]
    val init = initial
      .select(col("user_id").cast("long"), col("n_events").cast("long"),
        col("sum_cents").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
    val processor =
      new org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
          Long, StreamEvent, (Long, Long, Long), (Long, Long, Long)] {
        @transient private var tot: ValueState[(Long, Long)] = _
        override def init(outputMode: OutputMode,
            timeMode: TimeMode): Unit = {
          val enc: Encoder[(Long, Long)] =
            Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
          tot = getHandle.getValueState[(Long, Long)]("tot", enc,
            TTLConfig.NONE)
        }
        override def handleInitialState(key: Long,
            initialState: (Long, Long, Long),
            timerValues: TimerValues): Unit =
          tot.update((initialState._2, initialState._3))
        override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
            timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
          var (n, cents) = if (tot.exists()) tot.get() else (0L, 0L)
          rows.foreach { e =>
            val c = java.math.BigDecimal.valueOf(e.value)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2).longValueExact()
            n += 1L
            cents = Math.addExact(cents, c)
          }
          tot.update((n, cents))
          Iterator.single((key, n, cents))
        }
      }
    typed
      .groupByKey(_.user_id)
      .transformWithState(processor, TimeMode.None(), OutputMode.Update(),
        init)
      .toDF("user_id", "n_events", "sum_cents")
  }
}
