package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: the `ANALYZE`/data-quality summary every ingest
  * pipeline runs before trusting a new drop — per column: non-null count,
  * exact distinct count, numeric min/max.
  *
  * Shape: ONE aggregation pass over the table computing every column's
  * statistics side by side (Catalyst plans the multi-column distinct
  * aggregates through a single Expand + partial-aggregate tree — one scan
  * of the 100 TB input, no per-column re-reads), then the single stats row
  * pivots to one row per column with an explode over a literal struct
  * array (driver-side width, data-size independent).
  */
object Profiling {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nn"),
        count_distinct(c).as(s"${f.name}__nd")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"${f.name}__mn"),
          max(c).cast("double").as(s"${f.name}__mx"))
        case _ => Seq(
          min(lit(null).cast("double")).as(s"${f.name}__mn"),
          max(lit(null).cast("double")).as(s"${f.name}__mx"))
      })
    }
    val stats = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    stats.select(explode(array(cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"${f.name}__nn").as("n_nonnull"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_num"),
        col(s"${f.name}__mx").as("max_num"))
    }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Schema-inference report over a free-form JSON column: one row per
    * (key path, inferred value type) with its row count and coverage —
    * the profiling pass that precedes any semi-structured ingest (what
    * `read.json` schema inference does internally, surfaced as a queryable
    * report instead of a hidden driver step, so it runs distributed and
    * incremental instead of re-sampling the whole input on the driver).
    *
    * Types are inferred from the extracted scalar's lexical form
    * (integer / decimal / boolean / null / string) — the cross-engine
    * portable classification. A quoted "123" is indistinguishable from
    * 123 post-extraction; both engines classify it identically, and real
    * inference would tighten with a raw-token pass. Top-level keys only:
    * nested objects/arrays classify as `string` (their raw rendering),
    * the honest summary for a profiler.
    */
  def jsonSchemaProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("__total"))
    val kv = df.select(col(jsonCol).as("__j"))
      .select(col("__j"), explode(json_object_keys(col("__j"))).as("path"))
      .withColumn("__v",
        // dynamic per-row path: the SQL form accepts a non-foldable path
        // (the Scala wrapper pins it to a literal)
        expr("get_json_object(__j, concat('$.', path))"))
    val vtype = when(col("__v").isNull, "null")
      .when(col("__v").rlike("^-?[0-9]+$"), "long")
      .when(col("__v").rlike("^-?[0-9]*\\.[0-9]+$"), "double")
      .when(col("__v").isin("true", "false"), "bool")
      .otherwise("string")
    kv.withColumn("vtype", vtype)
      .groupBy(col("path"), col("vtype"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("coverage",
        round(col("n").cast("double") / col("__total").cast("double"), 6))
      .drop("__total")
  }
}
