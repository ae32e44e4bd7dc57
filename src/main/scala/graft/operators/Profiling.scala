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
}
