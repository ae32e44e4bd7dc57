package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

case class StreamEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

case class SessionBuf(start: Long, end: Long, n: Int)

case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long, n_events: Int)

/** Structured Streaming variants of the batch event operators.
  *
  * `readStream` → watermark → windowed agg / stateful sessionization →
  * `writeStream`. The batch equivalents (SparkEntry q14/q15) share the same
  * aggregation logic, which is the Spark-native way to keep batch and
  * streaming consistent: same declarative transforms, different source/sink.
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Tumbling 1-hour windowed counts per event type with a 2-hour watermark
    * (late data beyond that is dropped, state is bounded).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Continuous bronze load: each micro-batch is written to the partitioned
    * lake with the reference's delete-insert semantics via `foreachBatch` —
    * re-processing a day replaces exactly that day's partitions, so the
    * stream is idempotent under replay (the streaming analogue of
    * /root/reference/utils/duckdb_utils.py's daily refresh).
    */
  def toLake(events: DataFrame, path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events
      .withColumn("date_id", date_format(col("ts"), "yyyy-MM-dd"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.PartitionedLake.deleteInsert(batch, path, Seq("date_id"))
      }

  /** Streaming exact dedup: watermarked `dropDuplicates` on a fingerprint
    * column — duplicates arriving across micro-batches are suppressed while
    * state stays bounded by the watermark horizon (the streaming form of
    * the corpus exact-dedup operator).
    */
  def dedupedStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates(keyCols :+ "ts")

  /** Gap-based sessionization with explicit state: a session closes after
    * `gapSec` silence; state per user is O(1).
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapSec: Long = 1800): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[StreamEvent], state: GroupState[SessionBuf]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime / 1000, e.event_id))
          var buf = state.getOption
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            buf match {
              case Some(b) if sec - b.end <= gapSec =>
                buf = Some(SessionBuf(b.start, sec, b.n + 1))
              case Some(b) =>
                out += SessionOut(user, b.start, b.end, b.n)
                buf = Some(SessionBuf(sec, sec, 1))
              case None =>
                buf = Some(SessionBuf(sec, sec, 1))
            }
          }
          buf.foreach(state.update)
          out.result().iterator
        })
  }
}
