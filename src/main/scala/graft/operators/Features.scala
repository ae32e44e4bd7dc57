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

  /** LEAVE-ONE-OUT target encoding with additive (m-estimate) smoothing —
    * the high-cardinality categorical encoder a gradient-boosting
    * pipeline reaches for when one-hot would explode and a plain mean
    * would leak the row's own label into its feature:
    * enc = (catSum − ownTarget + prior·m) / (catN − 1 + m). One grouped
    * aggregate then a broadcast-back join on the category — the encode
    * itself never shuffles the fact table. Integer target sums; prior and
    * enc are pinned-order doubles. Categories with a single row fall back
    * to the prior (their LOO denominator would be m alone — defined, and
    * exactly what the formula yields).
    */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      m: Double): DataFrame = {
    require(m > 0.0, "smoothing mass m must be positive")
    val t = col(targetCol).cast("long")
    val perCat = df.groupBy(col(catCol))
      .agg(sum(t).as("__cs"), count(lit(1)).as("__cn"))
    val glob = df.agg(sum(t).as("__gs"), count(lit(1)).as("__gn"))
    val prior = col("__gs").cast("double") / col("__gn").cast("double")
    df.join(broadcast(perCat), Seq(catCol))
      .crossJoin(broadcast(glob))
      .withColumn("enc", round(
        ((col("__cs") - t).cast("double") + prior * lit(m)) /
          ((col("__cn") - 1L).cast("double") + lit(m)), 6))
      .drop("__cs", "__cn", "__gs", "__gn")
  }

  /** WEIGHT OF EVIDENCE / INFORMATION VALUE over fixed-width bins — the
    * credit-scoring feature audit: per bin of a numeric column,
    * woe = ln(goodShare/badShare) with +0.5 Laplace smoothing, and
    * IV = Σ (goodShare − badShare)·woe quantifying the column's
    * separating power. One bounds pass + one map-side-combined bin count;
    * every share derives from exact integer counts, ln over those exact
    * ratios in pinned order (the q256 MI discipline), the IV total a
    * window over the bins-sized aggregate on the 1e-9 decimal grid.
    */
  def woeIv(
      df: DataFrame,
      valueCol: String,
      targetCol: Column,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(bins >= 2, "need at least 2 bins")
    val v = col(valueCol).cast("double")
    val b = df.agg(min(v).as("mn"), max(v).as("mx"),
      sum(when(targetCol, 1L).otherwise(0L)).as("ng"),
      sum(when(targetCol, 0L).otherwise(1L)).as("nb")).head()
    require(!b.isNullAt(0) && b.getDouble(1) > b.getDouble(0),
      "degenerate or empty value column")
    require(b.getLong(2) > 0 && b.getLong(3) > 0,
      "both target classes must be present")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val (ng, nb) = (b.getLong(2), b.getLong(3))
    val bin = least(
      floor((v - lit(mn)) * lit(bins.toDouble) / lit(mx - mn)),
      lit(bins - 1L)).cast("long")
    val counts = df.groupBy(bin.as("bin"))
      .agg(sum(when(targetCol, 1L).otherwise(0L)).as("g"),
        sum(when(targetCol, 0L).otherwise(1L)).as("bd"))
    val dg = (col("g").cast("double") + 0.5) / lit(ng.toDouble)
    val db = (col("bd").cast("double") + 0.5) / lit(nb.toDouble)
    val woe = log(dg / db)
    counts
      .withColumn("woe", round(woe, 6))
      .withColumn("iv_term",
        round((dg - db) * woe, 9).cast(DecimalType(18, 9)))
      .withColumn("iv_total",
        sum(col("iv_term")).over(Window.partitionBy()).cast("double"))
      .select(col("bin"), col("g").as("n_good"), col("bd").as("n_bad"),
        col("woe"), col("iv_term").cast("double").as("iv_term"),
        col("iv_total"))
  }
}
