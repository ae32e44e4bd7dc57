package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PartitionedLake

/** Incremental materialized-aggregate maintenance.
  *
  * At 100 TB you do not rescan history to refresh a daily rollup: the
  * aggregate TABLE is the state, each arriving slice contributes partial
  * aggregates, and the merge re-aggregates state + partials for ONLY the
  * partitions the slice touches (additive measures — counts, sums — merge
  * losslessly; averages etc. must be carried as sum+count pairs). Dynamic
  * partition overwrite commits exactly those partitions, so maintenance
  * cost tracks the delta, not the table.
  */
object Incremental {

  /** Merge additive partial aggregates into the state lake at `statePath`.
    *
    * `delta` must already be aggregated to the state's grain
    * (`partCol` + `keyCols`); `measureCols` are its additive measures.
    * Existing state rows for the affected partitions re-aggregate with the
    * delta partials; the result is cast back to the state's exact column
    * types (a decimal sum widens per merge — left uncast, every merge
    * would shift the parquet schema) and committed with dynamic overwrite.
    */
  def mergeAdditive(
      spark: SparkSession,
      statePath: String,
      delta: DataFrame,
      keyCols: Seq[String],
      partCol: String,
      measureCols: Seq[String]): Unit = {
    val d = delta.localCheckpoint(true) // referenced twice below
    val state = PartitionedLake.read(spark, statePath)
    val affected = d.select(col(partCol)).distinct()
    val existing = state.join(affected, Seq(partCol), "left_semi")
    val grain = (partCol +: keyCols).map(col)
    val merged = existing
      .unionByName(d.select(existing.columns.map(col): _*))
      .groupBy(grain: _*)
      .agg(measureCols.map(c => sum(col(c)).as(c)).head,
        measureCols.map(c => sum(col(c)).as(c)).tail: _*)
      // pin the state schema, and cut lineage to the files being replaced
      .select(state.schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .localCheckpoint(true)
    PartitionedLake.deleteInsert(merged, statePath, Seq(partCol))
  }

  /** Incremental maintenance of an AGGREGATE-over-JOIN materialized view
    * for append-only fact deltas — the composition
    * `γ(ΔA ⋈ B)` merged additively into the state
    * (ΔV = γ-merge(V, γ(ΔA ⋈ B)), the standard IVM identity for
    * additive measures over append-only facts): only the delta is
    * enriched and aggregated, and only the state partitions it touches
    * re-aggregate. The daily-revenue-per-dimension rollup at 100 TB:
    * per-refresh cost is the day's facts, never the table. `measures`
    * are (name, partial-aggregate) pairs whose partials must be
    * additive (counts, decimal sums; carry avg as sum+count).
    */
  def mergeAggJoinAppend(
      spark: SparkSession,
      statePath: String,
      delta: DataFrame,
      dim: DataFrame,
      joinKey: String,
      keyCols: Seq[String],
      partCol: String,
      measures: Seq[(String, org.apache.spark.sql.Column)]): Unit = {
    require(measures.nonEmpty)
    val partial = delta.join(dim, Seq(joinKey))
      .groupBy((partCol +: keyCols).map(col): _*)
      .agg(measures.head._2.as(measures.head._1),
        measures.tail.map { case (n, c) => c.as(n) }: _*)
    mergeAdditive(spark, statePath, partial, keyCols, partCol, measures.map(_._1))
  }

  /** Incremental maintenance of a materialized JOIN view for append-only
    * fact deltas: the view gains `delta ⋈ dim` without rescanning any
    * fact history — existing rows of the partitions the delta touches are
    * read back, unioned with the enriched delta, and recommitted via
    * dynamic partition overwrite; untouched partitions are never read or
    * written. The standard ΔV = ΔA ⋈ B identity for append-only A (a
    * changing dimension instead requires rewriting the partitions whose
    * dim keys changed — the delete-insert path, not this one). The dim
    * join is left to Catalyst: broadcast under the threshold, shuffle
    * hash-join above it.
    *
    * `dim`'s join column must already carry the same name as the delta's
    * `joinKey`.
    */
  def mergeJoinAppend(
      spark: SparkSession,
      viewPath: String,
      delta: DataFrame,
      dim: DataFrame,
      joinKey: String,
      partCol: String): Unit = {
    val d = delta.join(dim, Seq(joinKey)).localCheckpoint(true)
    val state = PartitionedLake.read(spark, viewPath)
    val affected = d.select(col(partCol)).distinct()
    val existing = state.join(affected, Seq(partCol), "left_semi")
    val merged = existing
      .unionByName(d.select(existing.columns.map(col): _*))
      .localCheckpoint(true) // cut lineage to the files being replaced
    PartitionedLake.deleteInsert(merged, viewPath, Seq(partCol))
  }
}
