package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's bronze/silver/gold capability surface, Spark-first.
  *
  * - bronze: flatten semi-structured payloads into a declared typed schema and
  *   stamp the partition column (/root/reference/src/bronze/api_data/
  *   analytics__world_weather.py `extract_weather_metrics` + `WEATHER_SCHEMA`).
  * - silver: projection + predicate + CASE bucketing + literal partition id
  *   (/root/reference/src/silver/analytics/analytics__us_weather.py query).
  * - gold: UNION ALL of silver branches + literal region
  *   (/root/reference/src/gold/dashboard_data/
  *   dashboard__north_america_weather.py query).
  *
  * All declarative — Catalyst pushes the filters/pruning into the parquet
  * scan, and `from_json` is a codegen'd expression evaluated per-row on
  * executors (contrast: the reference flattens dict-by-dict in driver
  * Python).
  */
object Medallion {

  /** Parse a JSON string column with an explicit schema (bronze flatten). */
  def parseJson(raw: Column, schema: StructType): Column =
    from_json(raw, schema)

  /** Derive the `date_id` partition stamp from an event timestamp. */
  def dateId(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** Enforce a declared column->type schema: select exactly the declared
    * columns, cast to target types (bronze schema enforcement).
    */
  def enforceSchema(df: DataFrame, schema: Seq[(String, DataType)]): DataFrame =
    df.select(schema.map { case (c, t) => col(c).cast(t).as(c) }: _*)

  /** CASE-WHEN bucketing against ascending upper bounds, e.g. the
    * temperature_category Freezing/Cold/Mild/Warm ladder. NULL input stays
    * NULL (a bare CASE ladder would let null fall through every `<` into
    * the top label, silently misclassifying missing data).
    */
  def bucketize(v: Column, bounds: Seq[(Double, String)], last: String): Column = {
    val ladder = bounds.foldRight(lit(last)) { case ((bound, label), els) =>
      when(v < lit(bound), lit(label)).otherwise(els)
    }
    when(v.isNull, lit(null).cast("string")).otherwise(ladder)
  }

  /** Gold union: tag each branch with a literal, UNION ALL by name. */
  def unionBranches(branches: Seq[(DataFrame, String)], tagCol: String): DataFrame =
    branches
      .map { case (df, tag) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_ unionByName _)
}
