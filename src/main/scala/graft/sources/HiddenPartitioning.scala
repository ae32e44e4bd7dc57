package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style HIDDEN partitioning: the table declares TRANSFORMS —
  * `day(ts)` × `bucket(n, key)` — writers derive the partition columns,
  * and readers never see them. A query filters on the RAW columns and the
  * read path derives the matching partition predicates itself, so
  * partition pruning happens without the query author knowing the layout.
  * (The failure mode this kills: a filter on `ts` that scans everything
  * because the table is physically partitioned by a `date_id` string the
  * query never mentions.)
  *
  * The bucket transform here is `pmod(key, n)` — swap in any deterministic
  * hash; the derivation in [[read]] uses the same function, which is the
  * entire contract. At cluster scale the win compounds: day pruning bounds
  * the scan to the queried time range, bucket pruning to 1/n of the files
  * inside it, and neither requires the caller to know n or the layout.
  */
object HiddenPartitioning {

  private def bucketOf(k: Long, n: Int): Long = ((k % n) + n) % n

  /** Write `df` partitioned by the hidden transforms of `tsSecCol` (epoch
    * seconds → day string) and `keyCol` (→ bucket). The derived columns
    * live only in the directory layout.
    *
    * `__day` is floor(sec/86400) days from the epoch — pure integer
    * arithmetic, no timestamp cast — so the physical layout (and any
    * dayFrom/dayTo pruning) is identical regardless of the session
    * timezone of the writer or reader. A tz-dependent derivation would
    * let a reader in a different zone silently miss boundary rows.
    */
  def write(
      df: DataFrame,
      root: String,
      tsSecCol: String,
      keyCol: String,
      nBuckets: Int): Unit =
    df.withColumn("__day",
        date_format(
          date_add(lit("1970-01-01").cast("date"),
            floor(col(tsSecCol) / lit(86400L)).cast("int")),
          "yyyy-MM-dd"))
      .withColumn("__bucket", pmod(col(keyCol), lit(nBuckets.toLong)))
      // co-locate each (day, bucket) into one task before the
      // partitioned write: otherwise EVERY write task opens a file in
      // EVERY directory it sees rows for — tasks × partitions small
      // files instead of one per partition (the small-file explosion
      // that kills a 100 TB lake's downstream scans)
      .repartition(col("__day"), col("__bucket"))
      .write.mode("overwrite")
      .partitionBy("__day", "__bucket")
      .parquet(root)

  /** Read with raw-column predicates only; partition predicates are
    * derived: `keyEq` prunes to one bucket directory, `dayFrom`/`dayTo`
    * to the day range. The raw key filter is ALSO applied to the data
    * (the bucket holds n-to-1 keys); day filtering is day-granular, so
    * the derived `__day` range IS the data predicate.
    */
  def read(
      spark: SparkSession,
      root: String,
      keyCol: String,
      nBuckets: Int,
      keyEq: Option[Long] = None,
      dayFrom: Option[String] = None,
      dayTo: Option[String] = None): DataFrame = {
    var df = spark.read.parquet(root)
    keyEq.foreach(k => df = df.filter(col("__bucket") === bucketOf(k, nBuckets)))
    dayFrom.foreach(d => df = df.filter(col("__day") >= d))
    dayTo.foreach(d => df = df.filter(col("__day") <= d))
    keyEq.foreach(k => df = df.filter(col(keyCol) === k))
    df.drop("__day", "__bucket")
  }
}
