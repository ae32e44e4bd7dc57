package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

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

  /** Load a catalog table, normalizing `events.ts` to the engine's canonical
    * representation: epoch NANOSECONDS as a plain LONG.
    *
    * The lake has stored `ts` two ways across generations — parquet
    * TIMESTAMP(NANOS) (an int64 Spark surfaces as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`) and parquet TIMESTAMP(MICROS)
    * without UTC adjustment (surfaced as TIMESTAMP_NTZ). Every operator in
    * the engine does pure integer time arithmetic (`ts div 1e9` → seconds),
    * which is both codegen-friendly and timezone-proof, so the loader is the
    * single place that adapts storage to that contract — callers never
    * branch on the physical type. NTZ wall-clock is interpreted as UTC via
    * the session-tz cast (GraftSession pins `spark.sql.session.timeZone` to
    * UTC at every entry point), matching DuckDB's `epoch_ns(ts)` reading of
    * the same naive column.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }
  }
}
