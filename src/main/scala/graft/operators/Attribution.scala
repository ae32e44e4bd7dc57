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

  /** EXACT SHAPLEY-VALUE attribution over touched-channel coalitions —
    * the game-theoretic split [[markovRemoval]] approximates by removal:
    * with v(S) = converting users whose touched set ⊆ S, channel c gets
    * φ_c = Σ_{S∌c} |S|!(n−1−|S|)!/n! · (v(S∪c) − v(S)). Every piece is
    * COALITION-DOMAIN-SIZED: users collapse to a 2ⁿ-bucket mask census
    * in one aggregate; coalitions, factorial weights and both v lookups
    * are broadcast spines; φ stays an exact scaled INTEGER until the one
    * final division by n!. Bounded to n ≤ 16 channels by construction —
    * the honest limit of exact Shapley anywhere.
    *
    * `maskCounts`: (mask, n) — converting users per exact touched-set
    * bitmask, mask built from `channels`' (name, bit) assignments.
    */
  def shapley(
      maskCounts: DataFrame,
      channels: Seq[(String, Int)]): DataFrame = {
    val n = channels.size
    require(n >= 1 && n <= 16, "exact Shapley needs 1..16 channels")
    require(channels.map(_._2).toSet == (0 until n).map(1 << _).toSet,
      "channel bits must be exactly the low n single-bit masks")
    // A mask with a bit outside the low n is never a subset of any
    // coalition, so its converters would silently vanish from every v(S)
    // including v(full) and deflate every φ — fail loudly instead. One
    // one-row aggregate against the already-census-sized input.
    val mxRow = maskCounts.agg(max(col("mask"))).head()
    if (!mxRow.isNullAt(0)) {
      val mx = mxRow.get(0).asInstanceOf[Number].longValue
      require(mx < (1L << n),
        s"shapley: maskCounts contains mask $mx with bits outside the " +
          s"declared $n channels — add the channel or pre-filter the mask")
    }
    val spark = maskCounts.sparkSession
    val fact = (0 to n).scanLeft(1L)((a, i) => a * math.max(i, 1)).tail
    // fact(i) = i! for i in 0..n (fact(0) = 1)
    val factArr = array((0 to n).map(i =>
      lit((1 to i).foldLeft(1L)(_ * _))): _*)
    val coalitions = spark.createDataFrame(
      (0 until (1 << n)).map(s => (s, Integer.bitCount(s))))
      .toDF("s", "sz")
    val v = coalitions
      .join(broadcast(maskCounts),
        col("s").bitwiseOR(col("mask")) === col("s"), "left")
      .groupBy(col("s"), col("sz"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("v"))
    val ch = spark.createDataFrame(channels).toDF("channel", "bit")
    val base = broadcast(ch).join(v,
        col("s").bitwiseAND(col("bit")) === 0)
      .select(col("channel"), col("bit"), col("s"), col("sz"),
        col("v").as("v_without"))
    val withC = v.select(col("s").as("s2"), col("v").as("v_with"))
    val nBang = fact(n - 1) * n
    base
      .join(broadcast(withC), col("s").bitwiseOR(col("bit")) === col("s2"))
      .withColumn("w",
        element_at(factArr, col("sz").cast("int") + 1) *
          element_at(factArr, lit(n) - col("sz").cast("int")))
      .groupBy(col("channel"))
      .agg(sum(col("w") * (col("v_with") - col("v_without")))
        .as("phi_scaled"))
      .select(col("channel"),
        round(col("phi_scaled").cast("double") / lit(nBang.toDouble), 6)
          .as("phi"))
  }

  /** ABSORBING-MARKOV funnel metrics over the same journey matrix as
    * [[markovRemoval]]: for every transient state, the expected number
    * of steps to absorption (the row sum of the fundamental matrix
    * N = (I−Q)⁻¹) and the absorption split P(conv) vs P(drop) —
    * computed as the bounded-step geometric series in the same pure
    * int64 arithmetic, so engine and oracle replay it bit for bit:
    *
    *   E[s]  = 1 + Σ_c p(s,c)·E[c]          (each visit takes one step)
    *   A[s]  = p(s,a) + Σ_c p(s,c)·A[c]     (a ∈ {conv, drop})
    *
    * truncated at `steps` rounds IDENTICALLY on both engines.
    * Probabilities ride the p9 = 10⁹ scale; expected steps ride a 10⁶
    * scale, so p9·st6 products stay under 2^63 for expected-step values
    * below ~9·10⁶ — far past any funnel that converges at all. The
    * matrix is O((channels+2)²) collected metadata (the
    * [[markovRemoval]] posture); transition COUNTING stays distributed
    * in the caller.
    */
  def absorbingMetrics(
      transitions: DataFrame,
      channels: Seq[String],
      steps: Int): DataFrame = {
    require(steps >= 1 && channels.nonEmpty)
    val spark = transitions.sparkSession
    val cells = transitions.groupBy(col("src"), col("dst"))
      .agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val outTot: Map[String, Long] =
      cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    require(channels.forall(outTot.contains),
      "absorbingMetrics: every declared channel needs outgoing transitions")
    def p9(s: String, d: String): Long =
      cells.get((s, d)).map(n => n * S / outTot(s)).getOrElse(0L)
    val states = "start" +: channels
    val V = 1000000L
    var vConv = states.map(s => s -> p9(s, "conv")).toMap
    var vDrop = states.map(s => s -> p9(s, "drop")).toMap
    var st6 = states.map(s => s -> V).toMap
    for (_ <- 1 to steps) {
      vConv = states.map { s =>
        s -> (p9(s, "conv") + channels.map(c => p9(s, c) * vConv(c)).sum / S)
      }.toMap
      vDrop = states.map { s =>
        s -> (p9(s, "drop") + channels.map(c => p9(s, c) * vDrop(c)).sum / S)
      }.toMap
      st6 = states.map { s =>
        s -> (V + channels.map(c => p9(s, c) * st6(c)).sum / S)
      }.toMap
    }
    import spark.implicits._
    states.map(s => (s, outTot(s), st6(s), vConv(s), vDrop(s)))
      .toDF("state", "n_out", "st6", "c9", "d9")
      .select(col("state"), col("n_out"),
        round(col("st6").cast("double") / lit(1000000.0), 6)
          .as("exp_steps"),
        round(col("c9").cast("double") / lit(1000000000.0), 6)
          .as("p_conv"),
        round(col("d9").cast("double") / lit(1000000000.0), 6)
          .as("p_drop"))
  }

  /** RULE-BASED MULTI-TOUCH CREDITS — first-touch, last-touch, linear
    * and U-shaped (40/20/40) in ONE pass per channel: the four
    * heuristics every attribution dashboard shows next to the
    * model-based numbers ([[markovRemoval]], [[shapley]]); disagreement
    * between the columns IS the insight (first≫last = awareness
    * channel, etc.).
    *
    * Callers supply one row per (journey, order, channel) touch —
    * converting journeys only by convention. First/last are exact
    * integer counts; linear (1/n) and U-shaped (0.4 ends, 0.2/(n−2)
    * middles; n=1 → 1, n=2 → ½/½) are single IEEE divisions per touch
    * quantized to the 1e-9 grid and decimal-summed. Journey-partitioned
    * windows only; channel-domain output.
    */
  def positionCredits(
      df: DataFrame,
      journeyCol: String,
      orderCol: String,
      channelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d189 = DecimalType(18, 9)
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val base = df.select(col(journeyCol).as("j"), col(orderCol).as("o"),
        col(channelCol).as("ch"))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("j")).orderBy(col("o"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("j"))))
    val lin = round(lit(1.0) / dbl(col("n")), 9).cast(d189)
    val ush = when(col("n") === 1L, lit(1.0))
      .when(col("n") === 2L, lit(0.5))
      .when(col("i") === 1L || col("i") === col("n"), lit(0.4))
      .otherwise(lit(0.2) / dbl(col("n") - 2L))
    base.groupBy(col("ch"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("i") === 1L, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("i") === col("n"), 1L).otherwise(0L)).as("last_touch"),
        round(dbl(sum(lin)), 6).as("linear"),
        round(dbl(sum(round(ush, 9).cast(d189))), 6).as("u_shaped"))
  }
}
