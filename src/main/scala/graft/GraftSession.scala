package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local defaults target the test environment; on a cluster, master/memory
  * come from spark-submit and only the SQL confs below matter. AQE stays on
  * (runtime re-planning: shuffle coalescing, skew-join splitting, SMJ→BHJ
  * demotion) — it is the 100 TB safety net for every static choice here.
  */
object GraftSession {

  /** Cluster-facing tuning knobs, surfaced so a deployment sizes them to
    * its data instead of editing code:
    *
    * - `broadcastThresholdMb`: dims below this auto-broadcast. 10 MB is
    *   Spark's default; at 100 TB with large executors, 64–256 MB turns
    *   most dim joins into broadcast joins and removes their shuffles.
    * - `maxPartitionBytes`: scan split size. Bigger splits amortize task
    *   overhead on wide clusters; smaller splits help skewed file layouts.
    * - AQE stays on with skew-join splitting and partition coalescing
    *   explicit: skewed shuffle partitions split past
    *   `skewedPartitionThresholdInBytes`, tiny ones merge — the runtime
    *   safety net for every static estimate here.
    */
  def builder(
      appName: String = "graft",
      cores: Int = 32,
      broadcastThresholdMb: Int = 10,
      maxPartitionBytes: String = "128m"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${broadcastThresholdMb}m")
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      .config("spark.sql.session.timeZone", "UTC")
      // the synthetic lake stores event timestamps as parquet TIMESTAMP(NANOS),
      // which Spark only reads as a long (see SparkEntry.evSec)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)

  /** Local session for tests/benchmarks. */
  def local(appName: String = "graft", cores: Int = 32): SparkSession =
    builder(appName, cores).master(s"local[$cores]").getOrCreate()
}
