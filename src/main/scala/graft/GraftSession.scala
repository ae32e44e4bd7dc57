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

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
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
