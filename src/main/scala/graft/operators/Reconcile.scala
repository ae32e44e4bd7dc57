package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TextHashExpressions.xsHash

/** Cross-table reconciliation: find every key whose row differs between
  * two tables (a migration cut-over check, replica audit, or backfill
  * validation) WITHOUT shipping either table across the network whole.
  *
  * Two phases, the anti-entropy shape:
  *   1. each side reduces to `buckets` (count, xor-of-row-signatures)
  *      pairs — a full scan but a tiny shuffle (the xor aggregate is
  *      commutative, so it map-side combines);
  *   2. only the buckets whose digests disagree are re-read and compared
  *      row-by-row (full outer join on the key).
  * At 100 TB with few expected differences, phase 2 touches a vanishing
  * fraction of the data. The usual caveat: an xor digest can collide if
  * two differences cancel inside one bucket; count+xor makes that need
  * simultaneous cancellation of both, and production use pairs it with a
  * second independent hash.
  */
object Reconcile {

  /** Per-row signature: portable xsHash over the '|'-joined column values
    * (the caller guarantees '|' never occurs in the data — or remaps the
    * separator).
    */
  private def rowSig(cols: Seq[String]): Column =
    xsHash(concat_ws("|", cols.map(c => col(c).cast("string")): _*))

  /** Keys whose rows differ, labelled `A_only` / `B_only` / `differs`.
    * `keyCol` must be an integral key (bucketed by modulo).
    */
  def diffKeys(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1)
    val cols = a.columns.toSeq
    require(b.columns.toSeq == cols, "schemas must align for reconciliation")
    def prep(df: DataFrame) = df.select(
      col(keyCol),
      pmod(col(keyCol), lit(buckets.toLong)).as("bucket"),
      rowSig(cols).as("sig"))
    def digest(df: DataFrame, n: String, x: String) =
      prep(df).groupBy(col("bucket"))
        .agg(count(lit(1)).as(n), expr("bit_xor(sig)").as(x))
    // the digest table is at most `buckets` rows — collecting the
    // disagreeing ids is metadata-sized and makes the phase-2 restriction
    // a plain per-row predicate (no join, no shuffle); on a
    // bucket-partitioned layout the same predicate prunes whole files
    val bad = digest(a, "n_a", "x_a")
      .join(digest(b, "n_b", "x_b"), Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) || !(col("x_a") <=> col("x_b")))
      .select(col("bucket")).collect().map(_.getLong(0)).toSeq
    val inBad: Column =
      if (bad.isEmpty) lit(false) else col("bucket").isin(bad: _*)
    // phase 2: row-level compare restricted to the disagreeing buckets
    val aBad = prep(a).filter(inBad)
      .select(col(keyCol).as("k_a"), col("sig").as("s_a"))
    val bBad = prep(b).filter(inBad)
      .select(col(keyCol).as("k_b"), col("sig").as("s_b"))
    aBad.join(bBad, col("k_a") === col("k_b"), "full_outer")
      .withColumn("status",
        when(col("k_a").isNull, "B_only")
          .when(col("k_b").isNull, "A_only")
          .when(col("s_a") =!= col("s_b"), "differs"))
      .filter(col("status").isNotNull)
      .select(coalesce(col("k_a"), col("k_b")).as(keyCol), col("status"))
  }
}
