package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned parquet lake with the reference's delete-then-insert refresh.
  *
  * The reference deletes a partition's S3 objects + Glue partition entry and
  * rewrites it (/root/reference/utils/duckdb_utils.py
  * `duck_db_parquet_delete_and_insert`, `delete_partition_data`). Spark-first,
  * that pattern IS dynamic partition overwrite: `mode=overwrite` +
  * `partitionOverwriteMode=dynamic` replaces exactly the partitions present in
  * the incoming DataFrame and leaves every other partition untouched — one
  * atomic job commit instead of hand-rolled list/delete/copy, and it scales to
  * thousands of partitions because the commit protocol only touches the
  * partitions being written.
  */
object PartitionedLake {

  /** Full (re)materialization of a table, partitioned by `partCols`. */
  def writeAll(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Idempotent per-partition refresh: replaces only the partitions present
    * in `df` (the reference's delete-insert), leaving the rest intact.
    */
  def deleteInsert(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Partition-pruned read: filters on the partition column prune directories
    * before any file IO (the reference achieves this by addressing a single
    * `date_id=D/data.parquet` path).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
