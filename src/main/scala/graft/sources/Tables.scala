package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the engine's table catalog.
  *
  * Mirrors the reference's catalog-backed lake reads (the reference resolves
  * `database/table/date_id=D/data.parquet` paths through AWS Glue —
  * /root/reference/utils/duckdb_utils.py:129). Here the catalog is a plain
  * directory of parquet tables; on a real cluster this maps 1:1 onto a Hive
  * metastore / Iceberg catalog lookup, and every reader below goes through the
  * DataSource V2 parquet scan, so filter pushdown and column pruning apply.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
