package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventsStream

class StreamingSpec extends SparkSuite {

  private def eventsAsBatchOfStreamSchema = {
    // batch frame shaped like the stream source (ts as proper timestamp)
    Tables.load(spark, sf, "events")
      .select(col("event_id"),
        timestamp_seconds(expr("ts div 1000000000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }

  test("streaming hourly counts match the batch aggregation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    eventsAsBatchOfStreamSchema.write.mode("overwrite").parquet(tmp)
    val stream = EventsStream.readEvents(spark, tmp)
    val q = EventsStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .agg(sum("n")).head().getLong(0)
      assert(streamed == 1000L)
    } finally q.stop()
  }

  test("streaming lake sink applies delete-insert per micro-batch") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    val lake = java.nio.file.Files.createTempDirectory("graft_lake3").toString
    eventsAsBatchOfStreamSchema.write.mode("overwrite").parquet(src)
    val q = EventsStream.toLake(EventsStream.readEvents(spark, src), lake).start()
    try {
      q.processAllAvailable()
      val n0 = spark.read.parquet(lake).count()
      assert(n0 == 1000L)
    } finally q.stop()
    // replaying the same source must not duplicate rows (delete-insert)
    val q2 = EventsStream.toLake(
      EventsStream.readEvents(spark, src), lake).start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(lake).count() == 1000L)
    } finally q2.stop()
  }

  test("streaming dedup suppresses duplicates across micro-batches") {
    val src = java.nio.file.Files.createTempDirectory("graft_stream4").toString
    // write the same events twice as two files => two input batches worth
    val base = eventsAsBatchOfStreamSchema
    base.coalesce(1).write.mode("overwrite").parquet(src)
    base.coalesce(1).write.mode("append").parquet(src)
    val q = EventsStream.dedupedStream(
      EventsStream.readEvents(spark, src), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 1000L)
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions with gap > 30min") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    eventsAsBatchOfStreamSchema.write.mode("overwrite").parquet(tmp)
    val stream = EventsStream.readEvents(spark, tmp)
    val q = EventsStream.sessionize(spark, stream)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sessions_out")
      // closed sessions only (the last per user stays in state):
      // batch q15 found the total; closed = total - open
      val batchTotal = SparkEntry.queries("q15_sessionize")(spark, sf).count()
      val users = eventsAsBatchOfStreamSchema.select("user_id").distinct().count()
      assert(sessions.count() == batchTotal - users)
      assert(sessions.filter(col("end_sec") < col("start_sec")).count() == 0)
    } finally q.stop()
  }
}
