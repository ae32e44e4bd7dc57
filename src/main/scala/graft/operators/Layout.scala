package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout helpers.
  *
  * Z-ordering interleaves the bits of two dimension keys so that sorting by
  * the combined value clusters rows that are close in EITHER dimension into
  * the same files. Parquet min/max row-group stats then let scans with a
  * range predicate on either column skip most files — the multi-dimensional
  * analogue of partition pruning, and the standard layout trick for 100 TB
  * fact tables queried by more than one key (Delta/Iceberg OPTIMIZE ZORDER).
  */
object Layout {

  /** Bit-interleaved (Morton) value of two non-negative ints capped to
    * `bits` bits each: x occupies even bit positions, y odd. Pure
    * shift/and/or Column arithmetic — ANSI-safe and engine-portable.
    */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xm = x.bitwiseAND(lit((1L << bits) - 1))
    val ym = y.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered by the z-order of two key columns:
    * a range repartition + intra-partition sort on the z-value gives each
    * output file a tight z-range (and therefore tight min/max stats on
    * both keys).
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      files: Int = 8): Unit =
    df.withColumn("__z", zorderValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
