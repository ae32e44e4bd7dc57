package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch attribution over a first-order Markov journey model —
  * the removal-effect method (Anderl et al., "Mapping the customer
  * journey", 2016): a channel's credit is how much the start→conversion
  * absorption probability DROPS when every transition touching that
  * channel is deleted (paths through it become losses).
  *
  * Exactness discipline: transition probabilities are integer-scaled
  * (`p9 = floor(n_ij · 10⁹ / n_i)`) and the bounded-step absorption
  * recursion runs in pure int64 arithmetic (`v' = p9_conv +
  * floor(Σ p9·v / 10⁹)`, values bounded by 10⁹ so products fit int64) —
  * every engine and the oracle replay it bit for bit, with no float
  * summation order anywhere.
  */
object Attribution {

  private val S = 1000000000L // probability scale (9 decimal digits)

  /** `transitions`: (src, dst, n) counts with states `start`, the
    * channels, and absorbing `conv`/`drop`. The matrix is
    * O((channels+2)²) metadata, so the bounded-step fold runs on
    * collected cells (the k-means-centroid posture); the transition
    * COUNTING — the data-sized part — stays distributed in the caller.
    * `steps` bounds path length; journeys longer than `steps` hops
    * contribute the truncated mass identically on engine and oracle.
    */
  def markovRemoval(
      transitions: DataFrame,
      channels: Seq[String],
      steps: Int): DataFrame = {
    val spark = transitions.sparkSession
    val cells = transitions.groupBy(col("src"), col("dst"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val outTot: Map[String, Long] =
      cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    def p9Raw(s: String, d: String): Long =
      cells.get((s, d)).map(n => n * S / outTot(s)).getOrElse(0L)
    val states = "start" +: channels
    def absorb(removed: Option[String]): Long = {
      def p(s: String, d: String): Long =
        if (removed.exists(r => r == s || r == d)) 0L else p9Raw(s, d)
      var v: Map[String, Long] = states.map(s => s -> p(s, "conv")).toMap
      for (_ <- 1 to steps)
        v = states.map { s =>
          s -> (p(s, "conv") + channels.map(c => p(s, c) * v(c)).sum / S)
        }.toMap
      v("start")
    }
    val base = absorb(None)
    require(base > 0L, "no conversion mass reachable from start")
    val rows = channels.sorted.map(ch => (ch, base - absorb(Some(ch))))
    val t9 = rows.map(_._2).sum
    import spark.implicits._
    rows.toDF("channel", "re9")
      .select(col("channel"),
        round(col("re9").cast("double") / lit(base.toDouble), 6)
          .as("removal_effect"),
        round(col("re9").cast("double") / lit(t9.toDouble), 6)
          .as("attribution"))
  }
}
