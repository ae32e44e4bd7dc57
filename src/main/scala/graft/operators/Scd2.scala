package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance: apply a batch of
  * attribute changes to a versioned dimension — close each affected
  * key's current row at the change's effective date and append the new
  * current version. The historical row count only ever grows; no row is
  * updated in place, so every as-of query over `[eff_from, eff_to)`
  * keeps working. (q64 DERIVES an SCD2 history from raw observations;
  * this is the other half — maintaining one incrementally.)
  *
  * One broadcast-or-shuffle equi-join on the key plus a union: the
  * 100 TB dimension is touched once however many keys change.
  */
object Scd2 {

  /** `dim` rows: key, attributes, `fromCol`, `toCol` (null = current).
    * `changes` rows: key, attributes, `fromCol` (the effective date of
    * the new version; at most one change per key per batch).
    */
  def applyChanges(
      dim: DataFrame,
      changes: DataFrame,
      keyCol: String,
      fromCol: String,
      toCol: String): DataFrame = {
    val newFrom = changes.select(col(keyCol), col(fromCol).as("__new_from"))
    val closed = dim
      .join(newFrom, Seq(keyCol), "left")
      .withColumn(toCol,
        when(col(toCol).isNull && col("__new_from").isNotNull, col("__new_from"))
          .otherwise(col(toCol)))
      .drop("__new_from")
    val appended = changes.withColumn(toCol, lit(null).cast("string"))
    closed.unionByName(appended.select(closed.columns.map(col): _*))
  }
}
