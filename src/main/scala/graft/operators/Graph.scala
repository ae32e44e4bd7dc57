package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge-list DataFrames.
  *
  * Complements the connected-components operator ([[Dedup.components]])
  * with weighted propagation: PageRank is the standard importance score
  * for entity graphs mined out of a corpus (citation/link graphs,
  * customer-supplier networks). Each iteration is ONE equi-join shuffle of
  * the edge list against the current rank table plus one aggregation —
  * the plan a 1000-executor cluster wants, no driver-side graph state.
  */
object Graph {

  /** PageRank over a directed edge list `(src, dst)`.
    *
    * Callers modelling an undirected graph pass both edge directions (then
    * every node has out-degree >= 1, so no dangling-mass correction is
    * needed — the usual trick for bipartite entity graphs).
    *
    * Determinism across engines and partition orders: each contribution
    * `pr/deg * damping` is a fixed-order double expression cast onto a
    * 1e-9 decimal grid BEFORE the per-destination sum, so the aggregate is
    * order-independent; the grid sits ~7 orders of magnitude above the
    * double ulp of these O(1..100) scores, and the decimal sum's scaled
    * integer stays far below 2^53 so the final double cast is exactly
    * rounded in any engine. Rank tables are localCheckpoint'd per round —
    * chaining lineage would re-execute every prior iteration.
    *
    * Returns `(node, pr)` with `pr` rounded to 6 decimals.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var pr = deg.select(col("src").as("node"), col("deg"), lit(1.0).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr, e("src") === pr("node"))
        .select(col("dst"),
          (col("pr") / col("deg") * lit(damping)).cast(DecimalType(28, 9)).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("c_sum"))
      pr = pr.select(col("node"), col("deg"))
        .join(contrib, pr("node") === contrib("dst"))
        .select(col("node"), col("deg"),
          (lit(1.0 - damping) + col("c_sum").cast("double")).as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("node"), round(col("pr"), 6).as("pr"))
  }
}
