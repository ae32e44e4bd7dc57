package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release mechanisms, deterministic by construction.
  *
  * Production DP noise is drawn from a seeded PRNG; a distributed engine
  * re-executing a stage must NOT redraw it (a retry would publish a second,
  * different release of the same statistic — a classic privacy-budget bug).
  * The engine therefore derives each noise draw from a keyed hash of the
  * release (salt + group key): the draw is a pure function of the release
  * identity, so stage retries, AQE re-plans and engine re-runs all publish
  * the SAME noised value, and the oracle can replay it hash-for-hash.
  * (This mirrors the counter-based-RNG discipline of large-scale DP
  * systems; the salt plays the role of the per-release seed, which must
  * never be reused across releases.)
  */
object Privacy {

  private val H52_SPACE = 4503599627370496.0 // 2^52

  /** A Laplace(b) draw derived from a 52-bit keyed hash via inverse-CDF:
    * u ∈ [0,1) from the hash, centered c = u - 1/2, then
    * `-b * sign(c) * ln(1 - 2|c|)`. Pure column arithmetic — codegen'd,
    * no RNG, identical on every re-execution.
    */
  def laplaceNoise(key: Column, salt: String, b: Double): Column = {
    val h = conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 13),
      16, 10).cast("long")
    val c = h.cast("double") / lit(H52_SPACE) - lit(0.5)
    -lit(b) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** ε-DP noisy counts per group (Laplace mechanism, sensitivity 1).
    *
    * One map-side-combined aggregate, then a per-group scalar noise
    * expression: the shape is a plain `groupBy(...).count()` at any scale.
    * Returns both the true and the noised count so the correctness gate
    * can verify the mechanism; a production release would drop `n`.
    */
  def dpNoisyCounts(
      df: DataFrame,
      groupCol: String,
      epsilon: Double,
      salt: String): DataFrame = {
    val b = 1.0 / epsilon
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n",
        round(col("n").cast("double") + laplaceNoise(col(groupCol), salt, b), 6))
  }

  /** ε-DP MEDIAN by the EXPONENTIAL MECHANISM (McSherry–Talwar) — the
    * DP release for order statistics where [[laplaceNoise]] on the value
    * is useless (a median's sensitivity to one record is unbounded in
    * VALUE but exactly 1 in RANK): every candidate value scores
    * u(v) = −|rank distance to the median| and is selected with
    * probability ∝ exp(ε·u/2). The selection is derandomized with the
    * Gumbel-max trick on salted md5 uniforms — a pure function, so the
    * release is retry-stable (the DP-budget property [[dpNoisyCounts]]
    * establishes) and the oracle replays the draw exactly. Doubled rank
    * distances keep utilities integral; ε/4-scaled scores land once on
    * the 1e-9 grid; argmax ties break to the smaller value. One
    * value-domain census + one argmax — nothing fact-sized past the
    * first aggregate.
    */
  def dpMedian(
      df: DataFrame,
      vCol: String,
      epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0.0)
    import org.apache.spark.sql.expressions.Window
    val byV = df.groupBy(col(vCol).cast("long").as("v"))
      .agg(count(lit(1)).as("t"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val ranked = byV
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(tot))
      // doubled rank distance of the tie-group midpoint to the median
      .withColumn("u2", -abs(lit(2L) * col("c") - col("t") - col("n")))
    val hexU = conv(substring(md5(concat(lit(salt + ":"),
      col("v").cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val uni = (hexU.cast("double") + 0.5) / lit(H52_SPACE)
    val gumbel = -log(-log(uni))
    val scored = ranked.withColumn("score",
      round(lit(epsilon / 4.0) * col("u2").cast("double") + gumbel, 9))
    scored.agg(max(col("n")).as("n"),
        min(when(col("c") >= expr("(n + 1) div 2"), col("v")))
          .as("true_median"),
        max(struct(col("score").as("s"), (-col("v")).as("mv"))).as("__a"))
      .select(col("n"), col("true_median"),
        (-col("__a").getField("mv")).as("dp_median"))
  }

  /** l-DIVERSITY audit — the re-identification check k-anonymity (q217)
    * misses: a quasi-identifier class can hold k rows yet leak the
    * sensitive attribute completely if all k share one value (the
    * homogeneity attack). Per QI class: size, DISTINCT sensitive values,
    * the dominant value's share, and the flag `diverse = distinct ≥ l`.
    * One grouped aggregate on (QI, sensitive) then a class-level rollup —
    * both map-side combinable; nothing larger than the class domain
    * shuffles.
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int): DataFrame = {
    require(l >= 2, "l must be at least 2")
    val qi = quasiCols.map(col)
    val cells = df
      .groupBy(qi :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__n"))
    cells
      .groupBy(qi: _*)
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(col("__n")).as("max_sensitive_n"))
      .withColumn("dominant_share",
        round(col("max_sensitive_n").cast("double") /
          col("class_size").cast("double"), 6))
      .withColumn("diverse", (col("n_sensitive") >= l).cast("int"))
  }

  /** t-CLOSENESS audit over an ORDERED sensitive attribute — the attack
    * [[lDiversity]] misses: a class can be l-diverse yet still leak
    * ("every salary in this class is in the top two deciles"). Distance
    * is the ordered-EMD: (1/(m−1))·Σᵢ |Σ_{j≤i} (p_j − q_j)| between each
    * class's sensitive-value distribution p and the global q over the m
    * ordered categories. Per-category densities are rounded to the 1e-9
    * grid and the CUMULATIVE sums run in DECIMAL (exact, order-free), so
    * only the final division is floating point — the q332 term-grid
    * discipline. Everything after the one cell census is
    * (classes × m)-sized.
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(t > 0.0 && t < 1.0, "t must lie in (0, 1)")
    val qi = quasiCols.map(col)
    val d18 = DecimalType(18, 9)
    val cells = df
      .groupBy(qi :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__n"))
    val classTotals = cells.groupBy(qi: _*)
      .agg(sum(col("__n")).as("__cn"))
    val globalBySens = cells.groupBy(col("__s"))
      .agg(sum(col("__n")).as("__gn"))
    val globalTotal = globalBySens.agg(sum(col("__gn")).as("__N"))
    // every (class × sensitive-category) pair, absent cells included —
    // the cumulative difference needs the full ordered spine
    val spine = classTotals.crossJoin(broadcast(
      globalBySens.crossJoin(globalTotal)))
    // rename the rejoined census column: spine already carries `cells`
    // lineage (class/global totals derive from it), so a bare `__n`
    // reference would be ambiguous under Spark's self-join resolution
    val cellsR = cells.withColumnRenamed("__n", "__cell_n")
    val joined = spine.join(cellsR, quasiCols :+ "__s", "left")
      .withColumn("__p", round(coalesce(col("__cell_n"), lit(0L)).cast("double") /
        col("__cn").cast("double"), 9).cast(d18))
      .withColumn("__q", round(col("__gn").cast("double") /
        col("__N").cast("double"), 9).cast(d18))
    val cum = Window.partitionBy(qi: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("__cd", sum(col("__p") - col("__q")).over(cum))
      .groupBy(qi :+ col("__cn").as("class_size"): _*)
      .agg(count(lit(1)).as("m_categories"),
        sum(abs(col("__cd"))).as("__emd_sum"))
      .withColumn("emd",
        round(col("__emd_sum").cast("double") /
          (col("m_categories").cast("double") - 1.0), 6))
      .withColumn("close", (col("emd") <= t).cast("int"))
      .drop("__emd_sum")
  }
  /** K-ANONYMITY SWEEP — the utility/privacy CURVE a suppression policy
    * is chosen from, where q217 anonymizes at one fixed k: for each
    * candidate k, how many equivalence classes (and how much row mass)
    * fall below it and would be suppressed. One QI-census collapsed to
    * the CLASS-SIZE census (a frame bounded by the distinct class sizes,
    * tiny at any scale), then the k spine broadcasts over it — the whole
    * sweep costs one corpus aggregation however many k are asked.
    */
  def kAnonSweep(
      df: DataFrame,
      qiCols: Seq[String],
      ks: Seq[Int]): DataFrame =
    kAnonSweepFromCounts(
      df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("n")),
      qiCols, ks)

  /** [[kAnonSweep]] from an already-aggregated per-QI-class count table
    * (qiCols..., n) — counts ADD across batches, so a streaming store's
    * drained census sweeps identically to the one-pass path (and new
    * data can only GROW classes, never shrink them: the monitor's
    * suppressed share is monotone non-increasing under ingestion).
    */
  def kAnonSweepFromCounts(
      counts: DataFrame,
      qiCols: Seq[String],
      ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty && ks.nonEmpty && ks.forall(_ >= 2) &&
      ks.distinct.size == ks.size, "distinct k >= 2")
    val spark = counts.sparkSession
    import spark.implicits._
    val sizes = counts.groupBy(qiCols.map(col): _*)
      .agg(sum(col("n")).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("classes"))
      .localCheckpoint(true) // class-size census, one agg per k
    val spine = broadcast(ks.map(_.toLong).toDF("k"))
    sizes.crossJoin(spine)
      .groupBy(col("k"))
      .agg(sum(col("classes")).as("n_classes"),
        sum(col("sz") * col("classes")).as("n_rows"),
        sum(when(col("sz") < col("k"), col("classes")).otherwise(0L))
          .as("classes_suppressed"),
        sum(when(col("sz") < col("k"), col("sz") * col("classes"))
          .otherwise(0L)).as("rows_suppressed"))
      .select(col("k"), col("n_classes"), col("classes_suppressed"),
        col("rows_suppressed"),
        round(col("rows_suppressed").cast("double") /
          col("n_rows").cast("double"), 6).as("suppressed_share"))
      .orderBy(col("k"))
  }

  /** QUASI-IDENTIFIER UNIQUENESS RISK — for each DECLARED column combo,
    * the share of rows that are UNIQUE under it (singleton equivalence
    * classes — the re-identification surface a journalist attack walks
    * in through). The measured-not-assumed meter for the privacy shelf:
    * run it BEFORE choosing which columns q217's anonymizer must
    * generalize. One census per combo (each a single corpus
    * aggregation), unioned.
    */
  def uniquenessRisk(
      df: DataFrame,
      combos: Seq[(String, Seq[String])]): DataFrame = {
    require(combos.nonEmpty && combos.map(_._1).distinct.size == combos.size)
    combos.map { case (name, cols) =>
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          sum(when(col("sz") === 1L, 1L).otherwise(0L)).as("n_singletons"))
        .select(lit(name).as("combo"), col("n_classes"),
          col("n_singletons"),
          round(col("n_singletons").cast("double") /
            col("n_rows").cast("double"), 6).as("unique_row_share"))
    }.reduce(_ unionByName _).orderBy(col("combo"))
  }
}