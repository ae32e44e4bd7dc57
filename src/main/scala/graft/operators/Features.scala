package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature engineering for model-input pipelines.
  *
  * The hashing trick maps an unbounded categorical vocabulary into a fixed
  * dimension without a fitted dictionary — the property that matters at
  * 100 TB, where a vocabulary join would itself be a shuffle over billions
  * of distinct feature strings and any new category would invalidate the
  * fit. Hashing is stateless: every executor maps features identically with
  * zero coordination, appends cost O(batch), and train/serve skew from a
  * stale dictionary is impossible by construction.
  */
object Features {

  /** Hashed one-hot features with the sign trick (Weinberger et al.,
    * "Feature Hashing for Large Scale Multitask Learning", ICML 2009):
    * each feature string hashes to a bucket `h mod dim` and a sign from
    * the next hash bit, so collisions cancel in expectation instead of
    * accumulating bias.
    *
    * Input: one row per entity, `featureCols` already rendered as feature
    * strings (caller prefixes the field name — "seg:AUTO" — so identical
    * values in different fields stay distinct). Output: the sparse vector
    * as (key, idx, val) rows, zero entries dropped — the layout that joins
    * directly against a coefficient table at serving time.
    */
  def hashedFeatures(
      df: DataFrame,
      keyCol: String,
      featureCols: Seq[Column],
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val exploded = df.select(col(keyCol),
      explode(array(featureCols: _*)).as("feat"))
    val h = conv(substring(md5(col("feat")), 1, 13), 16, 10).cast("long")
    // integer-only bucket and sign bits: `h mod dim` indexes, the next
    // modular bit signs — no floating division anywhere, so the oracle
    // replays the arithmetic exactly
    exploded
      .withColumn("idx", (h % dim).cast("long"))
      .withColumn("sign",
        when(h % (2L * dim) >= dim, 1L).otherwise(-1L))
      .groupBy(col(keyCol), col("idx"))
      .agg(sum(col("sign")).as("val"))
      .filter(col("val") =!= 0L)
  }
}
