package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {

  /** Stage the REAL events parquet (nanos timestamps) into a stream dir —
    * readEvents must consume the engine's own lake format directly.
    */
  private def stageSource(copies: Int = 1): String = {
    val dir = Files.createTempDirectory("graft_stream_src")
    (1 to copies).foreach { i =>
      Files.copy(Paths.get(s"$sf/events.parquet"),
        dir.resolve(s"events_$i.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("streaming hourly counts over the raw lake match the batch total") {
    val q = EventsStream.hourlyCounts(
      EventsStream.readEvents(spark, stageSource()))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("hourly_out").agg(sum("n")).head().getLong(0) == 1000L)
    } finally q.stop()
  }

  test("streaming lake sink isolates micro-batches and replays idempotently") {
    val lake = Files.createTempDirectory("graft_stream_lake").toString
    val src = stageSource()
    val q = EventsStream.toLake(EventsStream.readEvents(spark, src), lake).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(lake).count() == 1000L)
    } finally q.stop()
    // fresh query (fresh checkpoint) replays as batch 0 again: its own
    // batch partition is overwritten, rows are not duplicated
    val q2 = EventsStream.toLake(EventsStream.readEvents(spark, src), lake).start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(lake).count() == 1000L)
    } finally q2.stop()
  }

  test("streaming dedup suppresses duplicate deliveries (keyed, not ts-keyed)") {
    val q = EventsStream.dedupedStream(
      EventsStream.readEvents(spark, stageSource(copies = 2)), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 1000L)
    } finally q.stop()
  }

  test("stateful sessionization emits valid sessions; finals flush via event-time timeout") {
    val q = EventsStream.sessionize(spark,
      EventsStream.readEvents(spark, stageSource()))
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sessions_out")
      val batchTotal = SparkEntry.queries("q15_sessionize")(spark, sf).count()
      val users = spark.read.parquet(s"$sf/events.parquet")
        .select("user_id").distinct().count()
      // closed-by-successor sessions are always out; watermark-timeout may
      // flush up to all remaining open sessions
      assert(sessions.count() >= batchTotal - users)
      assert(sessions.count() <= batchTotal)
      assert(sessions.filter(col("end_sec") < col("start_sec")).count() == 0)
    } finally q.stop()
  }
}
