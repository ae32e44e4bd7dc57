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

  /** N-ary bit-interleaved (Morton) value of non-negative int keys capped
    * to `bits` bits each: bit `i` of key `j` lands at position
    * `k*i + j` (k = number of keys). Pure shift/and/or Column arithmetic —
    * ANSI-safe and engine-portable.
    */
  def zorderValueN(bits: Int, keys: Seq[Column]): Column = {
    val k = keys.size
    require(k >= 2, "z-order needs at least two keys")
    require(bits >= 1 && bits * k <= 62,
      s"interleaved width ${bits * k} must fit a signed long")
    val m = lit((1L << bits) - 1)
    val masked = keys.map(_.bitwiseAND(m))
    (for { i <- 0 until bits; (c, j) <- masked.zipWithIndex }
      yield shiftleft(shiftrightunsigned(c, i).bitwiseAND(lit(1L)), k * i + j))
      .reduce(_ bitwiseOR _)
  }

  /** Two-key interleave: x occupies even bit positions, y odd. */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column =
    zorderValueN(bits, Seq(x, y))

  /** Write `df` as parquet clustered by the z-order of the key columns:
    * a range repartition + intra-partition sort on the z-value gives each
    * output file a tight z-range (and therefore tight min/max stats on
    * EVERY key — the property LayoutSpec's file-skipping test asserts).
    */
  def zorderWriteN(
      df: DataFrame,
      path: String,
      keyCols: Seq[String],
      bits: Int = 16,
      files: Int = 8): Unit =
    df.withColumn("__z", zorderValueN(bits, keyCols.map(col)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def zorderWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      files: Int = 8): Unit =
    zorderWriteN(df, path, Seq(xCol, yCol), bits, files)

  /** d=2 Hilbert-curve value of two non-negative int keys capped to `bits`
    * bits each ([[graft.plans.HilbertIndex2]]): the locality-preserving
    * alternative to [[zorderValue]] — every curve step is a unit grid
    * move, so a contiguous index range maps to a tighter bounding box
    * than Morton's quadrant jumps and a range probe on either key opens
    * fewer files at equal file count (LayoutSpec measures both layouts
    * on the same probe).
    */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.plans.CurveExpressions.hilbertIndex(x, y, bits)

  /** Write `df` as parquet clustered by the Hilbert index of (x, y) —
    * [[zorderWrite]]'s shape with the curve swapped: range repartition +
    * intra-partition sort on the index gives each file a contiguous
    * curve segment, i.e. a near-square tile of the key plane.
    */
  def hilbertWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      files: Int = 8): Unit =
    df.withColumn("__h", hilbertValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)

  /** Deterministic sorted-run layout: rows bucketed by EXACT
    * equal-frequency boundaries of `keyCol` (discrete ranks, not a
    * sample), one bucket per `bucket=<i>` directory, each bucket's rows in
    * exactly ONE file sorted by the key — so the table becomes
    * non-overlapping sorted runs. Range scans then skip whole files on
    * parquet min/max stats, and merge-style consumers (as-of joins,
    * ordered exports) read pre-sorted input.
    *
    * Why not `repartitionByRange`: its boundaries come from reservoir
    * sampling, so the file layout differs run to run — this layout is
    * bit-reproducible, which the oracle (and any incremental maintenance
    * diffing file sets) requires. The boundary table is metadata-sized
    * (`buckets − 1` rows) and the data moves through ONE hash shuffle on
    * the bucket id. Returns the boundaries used.
    */
  def rangeSortedWrite(
      df: DataFrame,
      path: String,
      keyCol: String,
      tieBreak: String,
      buckets: Int = 8): Seq[Double] = {
    require(buckets >= 2 && buckets <= 64, s"unreasonable bucket count $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val row = Relational.discretePercentiles(
      df.withColumn("__g", lit(1)), "__g", keyCol, tieBreak, ps).head()
    val bounds = ps.map(p => row.getAs[Double](s"p${(p * 100).toInt}"))
    require(bounds.distinct.size == bounds.size,
      "percentile names collided or boundaries degenerate; lower `buckets`")
    val bucket = bounds.zipWithIndex.foldRight(lit(buckets.toLong)) {
      case ((b, i), rest) => when(col(keyCol) <= lit(b), (i + 1).toLong).otherwise(rest)
    }
    df.withColumn("bucket", bucket)
      // hash shuffle on the bucket id puts ALL of a bucket's rows in one
      // task; partitionBy then writes them as the single file of their
      // bucket=<i> directory, sorted
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col(keyCol), col(tieBreak))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    bounds
  }

  /** CLUSTERING-DEPTH AUDIT — how well a file layout actually clusters
    * its sort key, measured from per-file [min, max] stats alone (the
    * numbers OPTIMIZE/ZORDER jobs are scheduled on): for each layout,
    * the number of OVERLAPPING file pairs (every overlap is a file a
    * point lookup may have to read twice) and the MAX OVERLAP DEPTH —
    * the worst-case number of files any single key value forces a scan
    * to open (Delta/Iceberg's clustering-depth metric; 1 = perfectly
    * clustered, n_files = unclustered). Input: one row per file with
    * `layout`, `file_id`, integer `mn`/`mx` stats.
    *
    * Shape: metadata-sized by construction (one row per FILE). Depth is
    * a boundary sweep — +1 at mn, −1 past mx, cumulative max over the
    * per-layout ordered event list (delta asc at equal position, so
    * back-to-back ranges [a,b][b+1,c] never fake an overlap); pairs by
    * interval self-join within the layout. Pure integer arithmetic.
    */
  def clusterDepthAudit(files: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = files.select(col("layout"), col("mn").as("pos"),
        lit(1L).as("delta"))
      .unionByName(files.select(col("layout"), (col("mx") + 1L).as("pos"),
        lit(-1L).as("delta")))
    val sweep = Window.partitionBy(col("layout"))
      .orderBy(col("pos"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val depth = events
      .withColumn("open", sum(col("delta")).over(sweep))
      .groupBy(col("layout"))
      .agg(max(col("open")).as("max_depth"))
    val l = files.select(col("layout"), col("file_id").as("ia"),
      col("mn").as("mna"), col("mx").as("mxa"))
    val r = files.select(col("layout"), col("file_id").as("ib"),
      col("mn").as("mnb"), col("mx").as("mxb"))
    val pairs = l.join(r, Seq("layout"))
      .filter(col("ia") < col("ib") &&
        col("mna") <= col("mxb") && col("mnb") <= col("mxa"))
      .groupBy(col("layout")).agg(count(lit(1)).as("overlap_pairs"))
    files.groupBy(col("layout")).agg(count(lit(1)).as("n_files"))
      .join(pairs, Seq("layout"), "left")
      .join(depth, Seq("layout"))
      .withColumn("overlap_pairs", coalesce(col("overlap_pairs"), lit(0L)))
      .select(col("layout"), col("n_files"), col("overlap_pairs"),
        col("max_depth"))
  }
}
