package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Footer-only table statistics: COUNT/MIN/MAX answered from parquet
  * footer metadata without reading a single data page — the O(#files)
  * path for table-level stats over 100 TB.
  *
  * Spark's parquet aggregate pushdown lives in the V2 datasource, so the
  * scan is built with parquet removed from `useV1SourceList` and
  * `spark.sql.parquet.aggregatePushdown` on; both settings are restored
  * after the plan is MATERIALIZED (pushdown happens at optimization
  * time, so a lazy return would revert the configs before they matter).
  * Pushdown only fires for un-filtered, un-grouped aggregates over
  * non-nested columns — exactly the table-stats shape.
  */
object FooterStats {

  def withAggregatePushdown[T](spark: SparkSession)(body: => T): T = {
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = spark.conf.get(v1Key)
    val prevAgg = spark.conf.get(aggKey)
    spark.conf.set(v1Key,
      prevV1.split(",").map(_.trim).filterNot(_ == "parquet").mkString(","))
    spark.conf.set(aggKey, "true")
    try body
    finally {
      spark.conf.set(v1Key, prevV1)
      spark.conf.set(aggKey, prevAgg)
    }
  }

  /** The pushdown-eligible stats plan (un-materialized — for plan audits;
    * only valid while the pushdown configs are set).
    */
  def statsPlan(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Footer-only stats, materialized under the pushdown configs. */
  def tableStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    withAggregatePushdown(spark) {
      statsPlan(spark, path, cols).localCheckpoint(true)
    }
}
