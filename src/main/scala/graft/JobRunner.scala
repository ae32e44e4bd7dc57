package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PartitionedLake

/** Thin idempotent daily job runner — the engine's answer to the
  * reference's daily-cadence orchestration (a scheduler invokes the same
  * scripts once per day over that day's slice; re-running a day must be
  * safe). Re-expressed Spark-first: each named job is a day-scoped
  * transform whose output lands in its own `date_id`-partitioned lake
  * table via per-partition delete-insert, so
  *
  *   - a RE-RUN of a day replaces that day's partition with identical
  *     content instead of appending duplicates (safe retry / backfill);
  *   - running day D+1 never reads or rewrites day D's files (cost is
  *     proportional to one day, not the table — the property that keeps a
  *     daily cadence viable at 100 TB of history).
  *
  * Deliberately NOT a scheduler: cron/Airflow owns the clock; this owns
  * the only part the engine must guarantee — idempotent day semantics.
  */
object JobRunner {

  /** A named day-scoped transform. The transform must emit a `date_id`
    * string column; the runner restricts output to the day being run (a
    * misbehaving transform cannot touch other days' partitions).
    */
  final case class Job(
      name: String,
      transform: (SparkSession, String) => DataFrame)

  /** Table root for one job under the lake root. */
  def tablePath(lakeRoot: String, jobName: String): String =
    s"$lakeRoot/$jobName"

  /** Run every job for one lake day; returns rows committed per job,
    * counted from the lake read-back (the committed truth, not the plan).
    */
  def runDay(
      spark: SparkSession,
      sfDir: String,
      lakeRoot: String,
      day: String,
      jobs: Seq[Job]): Map[String, Long] = {
    require(jobs.map(_.name).distinct.size == jobs.size,
      "job names must be unique — each owns one lake table")
    jobs.map { job =>
      val out = job.transform(spark, sfDir).filter(col("date_id") === day)
      require(out.columns.contains("date_id"),
        s"job ${job.name} must emit a date_id column")
      val path = tablePath(lakeRoot, job.name)
      PartitionedLake.deleteInsert(out, path, Seq("date_id"))
      val n = PartitionedLake.read(spark, path)
        .filter(col("date_id") === day).count()
      job.name -> n
    }.toMap
  }
}
