package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reproducible sampling for corpus construction.
  *
  * Training-data pipelines need samples that are STABLE across reruns,
  * cluster sizes and engines — `df.sample()` is none of those (seed +
  * partition layout dependent). Hash-based selection on a key is: the same
  * row set comes back anywhere, and adding data never flips previously
  * selected rows. md5 is used as the hash because every engine agrees on
  * it (the DuckDB oracles replay these exactly).
  */
object Sampling {

  /** First hex nibble of md5(key-as-string): uniform over 16 buckets. */
  private def nibble(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 1)

  /** Deterministic ~`sixteenths`/16 sample selected by key hash. */
  def deterministicSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame = {
    require(sixteenths >= 1 && sixteenths <= 16)
    val keep = "0123456789abcdef".take(sixteenths).map(_.toString)
    df.filter(nibble(col(keyCol)).isin(keep: _*))
  }

  /** Deterministic NEGATIVE sampling for contrastive training pairs: for
    * each anchor, `k` pseudo-random corpus rows drawn from an md5 hash
    * ring over the id domain — the in-batch-negatives alternative when
    * batches are engine-assembled and reruns must ship IDENTICAL pairs
    * (otherwise a resumed training job silently changes its data).
    *
    * Candidates are `md5(anchor:j) mod (max_id + 1)` for j < overgen·k;
    * ids need not be dense — existence is settled by a semi-join against
    * the corpus keys (broadcast-sized anchors make that the only
    * corpus-touching step), self-pairs are excluded, duplicates keep
    * their first draw, and the first `k` surviving draws (by j, ties by
    * id) are the sample. Fully engine-portable: the oracle replays every
    * draw.
    */
  def negativeSample(
      corpus: DataFrame,
      anchors: DataFrame,
      keyCol: String,
      k: Int,
      overgen: Int = 2): DataFrame = {
    require(k >= 1 && overgen >= 1)
    val mx = corpus.agg(max(col(keyCol)).as("mx"))
    val cand = anchors.select(col(keyCol).as("anchor"))
      .join(broadcast(mx))
      .select(col("anchor"), col("mx"),
        explode(sequence(lit(0), lit(overgen * k - 1))).as("j"))
      .select(col("anchor"), col("j"),
        (conv(substring(md5(concat(col("anchor").cast("string"), lit(":"),
          col("j").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % (col("mx") + 1)).as("neg"))
      .filter(col("neg") =!= col("anchor"))
    val existing = cand
      .join(corpus.select(col(keyCol).as("neg")), Seq("neg"), "left_semi")
    val w1 = Window.partitionBy(col("anchor"), col("neg")).orderBy(col("j"))
    val w2 = Window.partitionBy(col("anchor")).orderBy(col("j"), col("neg"))
    existing
      .withColumn("__r", row_number().over(w1)).filter(col("__r") === 1)
      .withColumn("neg_rank", row_number().over(w2)).filter(col("neg_rank") <= k)
      .select(col("anchor"), col("neg_rank"), col("neg"))
  }

  /** Weighted (importance) sampling: keep a row with probability equal to
    * its `weight` column (clamped to [0,1]), decided by comparing a
    * uniform hash fraction of the key against the weight — deterministic,
    * engine-portable (md5), and monotone: raising a row's weight can only
    * ADD it to the sample, never remove others. The LLM-pipeline use:
    * quality-weighted corpus downsampling where high-quality documents
    * survive at higher rates.
    *
    * The fraction takes the first 8 md5 hex digits as an integer over
    * 16^8 — uniform on [0,1) with 2^-32 granularity.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val frac = conv(
      substring(md5(col(keyCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.filter(frac < least(greatest(col(weightCol), lit(0.0)), lit(1.0)))
  }

  /** Stratified sample: `perStratum` rows per stratum, chosen in a
    * deterministic pseudo-random order (md5 of the key, tie-break key).
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Temperature-scaled stratum balancing — the multilingual-corpus
    * sampling recipe: each stratum's quota out of `target` rows is
    * proportional to count^α with α = 0.5 (√count), which upweights
    * low-resource strata relative to proportional sampling without the
    * head-stratum starvation of a uniform cap. Rows within a stratum are
    * then chosen by the engine's reproducible md5 rank.
    *
    * Determinism across engines: √count is quantized to DECIMAL(28,12)
    * BEFORE the cross-stratum sum, so the weight total is
    * order-independent; quotas are floors of exactly-reproducible
    * doubles. The stratum table is metadata-sized and broadcast — the
    * only corpus-sized work is one count aggregate and one per-stratum
    * window rank.
    */
  def temperatureBalanced(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      target: Int): DataFrame = {
    val weights = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__wq",
        sqrt(col("cnt").cast("double")).cast("decimal(28,12)"))
    val total = weights.agg(sum(col("__wq")).cast("double").as("__tw"))
    val quotas = weights.crossJoin(broadcast(total))
      .select(col(stratumCol),
        floor(lit(target.toDouble) * col("__wq").cast("double") / col("__tw"))
          .cast("long").as("quota"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")), col(keyCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("rk") <= col("quota"))
  }

  /** Deterministic stride-scheduled mixture interleave — the data-mixing
    * step that turns per-source corpora plus integer mixture weights into
    * ONE total training order: class c's i-th row is scheduled at virtual
    * time `i * (LCM(weights) / w_c)`, so over any window of L consecutive
    * slots each class appears in proportion to its weight (stride
    * scheduling — deterministic, no RNG, resumable from any position).
    *
    * Scale shape: one per-class window rank (shuffle on the class column)
    * and a broadcast of the |classes|-row stride table. The returned
    * `vt` IS the order — a distributed writer sorts by `(vt, class, id)`;
    * no global row-number is materialized here (that would serialize the
    * corpus through one partition).
    */
  def mixtureSchedule(
      df: DataFrame,
      classCol: String,
      idCol: String,
      weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 1))
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = weights.values.reduce((a, b) => a / gcd(a, b) * b)
    val strides = weights.toSeq.map { case (c, wt) => (c, l / wt) }
    val sdf = broadcast(
      df.sparkSession.createDataFrame(strides)
        .toDF(classCol, "__stride"))
    val w = Window.partitionBy(col(classCol)).orderBy(col(idCol))
    df.join(sdf, Seq(classCol)) // inner: classes without a weight are excluded
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("vt", col("__rank") * col("__stride"))
      .drop("__rank", "__stride")
  }

  /** Deterministic epoch ordering for a training dataloader: each epoch
    * re-shuffles the corpus by a seeded md5 over `(epoch, id)`, deals rows
    * into `nShards` hash shards (one per data-parallel rank), and numbers
    * each shard's rows — so any rank can resume mid-epoch by skipping its
    * first `pos <= consumed` rows, with NO coordination state beyond the
    * (epoch, consumed) pair. Reproducible across engines and reruns; a
    * different epoch yields an unrelated order (the hash reseeds).
    * One window shuffle on the shard column; no global row-number.
    */
  def epochShardOrder(
      df: DataFrame,
      idCol: String,
      epoch: Long,
      nShards: Int): DataFrame = {
    require(nShards >= 1)
    val hx = md5(concat(lit(s"$epoch:"), col(idCol).cast("string")).cast("binary"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hx"), col(idCol))
    df.withColumn("__hx", hx)
      .withColumn("shard",
        pmod(conv(substring(col("__hx"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__hx")
  }

  /** Per-key document cap — the per-domain crawl-governance rule: at most
    * `cap` rows per key survive, chosen by the engine's reproducible md5
    * rank (so the kept subset is stable across runs and engines, not
    * whichever rows a scan happened to emit first). One window shuffle on
    * the key; emits `cap_rank` (1-based) for audit.
    */
  def perKeyCap(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    require(cap >= 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    df.withColumn("cap_rank", row_number().over(w).cast("long"))
      .filter(col("cap_rank") <= cap)
  }

  /** Systematic probability-proportional-to-size sampling: exactly `k`
    * rows per stratum, selection probability proportional to an INTEGER
    * weight, fully deterministic and engine-exact — no randomness, no
    * transcendentals (the A-Res exponential-key scheme needs ln/pow,
    * whose last-ulp rounding differs across engines; this doesn't).
    *
    * Classic systematic PPS: order the stratum on the md5 hash of the key
    * (a reproducible shuffle, decorrelating selection from any natural
    * ordering), take the cumulative weight, and select every row whose
    * weight interval [cumw − w, cumw) crosses a multiple of step = W/k.
    * The crossing test is pure integer arithmetic on k-scaled weights:
    * ⌊k·cumw/W⌋ > ⌊k·(cumw−w)/W⌋. Rows with w ≥ W/k are always selected
    * (may cross twice — counted once, so output can be < k only when
    * heavy rows dominate; `n_crossings` carries the multiplicity).
    *
    * One window shuffle per stratum; no collect, no iteration — the same
    * plan shape at any scale.
    */
  def systematicPps(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__cumw", sum(col("__w")).over(run))
      .withColumn("__tot",
        sum(col("__w")).over(Window.partitionBy(col(strataCol))))
      .withColumn("n_crossings",
        expr(s"(__cumw * $k) div __tot - ((__cumw - __w) * $k) div __tot"))
      .filter(col("n_crossings") >= 1)
      .drop("__w", "__cumw", "__tot")
  }

  /** Exact stratified splitting by the largest-remainder (Hamilton)
    * method: within each stratum, rows land in the named splits in EXACT
    * integer proportion to the weights — quota = floor(n·w/W) plus one
    * extra for the splits with the largest fractional remainders until
    * the stratum is exhausted (remainder ties broken by declared split
    * order). Deterministic assignment inside a stratum follows the md5
    * ring, so reruns, engines and cluster layouts agree row for row —
    * `randomSplit` is approximate AND layout-dependent; this is neither.
    *
    * Cost shape: one shuffle (the stratum window ranking); the quota
    * arithmetic is pure integer over the |strata|×|splits| aggregate, and
    * the boundary table broadcasts back onto the ranked rows.
    */
  def largestRemainderSplit(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights")
    require(splits.map(_._1).distinct.length == splits.length, "unique split names")
    val totalW = splits.map(_._2).sum
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    val ranked = df.select(col(strataCol), col(idCol))
      .withColumn("__rn", row_number().over(ord))
    val splitLits = array(splits.zipWithIndex.map { case ((nm, w), i) =>
      struct(lit(i.toLong).as("idx"), lit(nm).as("split"), lit(w.toLong).as("w"))
    }: _*)
    val byStratum = Window.partitionBy(col(strataCol))
    val cum = byStratum.orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = ranked.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .select(col(strataCol), col("n"), explode(splitLits).as("sp"))
      .select(col(strataCol), col("n"), col("sp.idx").as("idx"),
        col("sp.split").as("split"), col("sp.w").as("w"))
      .withColumn("base", expr(s"(n * w) div $totalW"))
      .withColumn("rem", expr(s"(n * w) % $totalW"))
      .withColumn("leftover", col("n") - sum(col("base")).over(byStratum))
      .withColumn("erk", row_number().over(
        byStratum.orderBy(col("rem").desc, col("idx"))))
      .withColumn("quota",
        col("base") + when(col("erk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("hi", sum(col("quota")).over(cum))
      .withColumn("lo", col("hi") - col("quota"))
      .select(col(strataCol), col("split"), col("lo"), col("hi"))
    ranked.join(broadcast(bounds), Seq(strataCol))
      .filter(col("__rn") > col("lo") && col("__rn") <= col("hi"))
      .select(col(idCol), col(strataCol), col("split"))
  }

  /** Poisson(1) CDF pinned as 12-decimal literals so engine and oracle
    * draw the SAME bootstrap weights (recomputing e⁻¹ per engine could
    * differ in the last ulp). Weights ≥ 5 are capped at 5 (mass 3e-4).
    */
  private val poisson1Cdf: Seq[Double] = Seq(
    0.367879441171, 0.735758882343, 0.919698602929,
    0.981011843124, 0.996340153173)

  /** Deterministic Poisson bootstrap — the only bootstrap that works on
    * a cluster: resampling n-out-of-n needs global coordination, but
    * Binomial(n, 1/n) → Poisson(1), so each row draws an INDEPENDENT
    * replicate-count per resample from a counter-based hash — no RNG
    * state, no shuffle, stage retries and engines agree draw for draw.
    * The draw is the codegen'd portable xorshift mix (seed(salt) → id →
    * rep → TWO finalizer rounds — one xorshift round only moves a
    * low-bit change up ~35 bit positions, so without the finalizers the
    * small `rep` counter never reaches the high bits the uniform is cut
    * from; with them the weight distribution is Poisson(1) to within
    * sampling noise), top 52 bits → uniform. Pure integer ops inside
    * whole-stage codegen, ~10× cheaper per draw than a string md5, and
    * the oracle replays it bit-for-bit through the same HUGEINT macros
    * as the dedup family. Emits
    * per-stratum point estimate and the discrete-rank [10%, 90%]
    * percentile interval of the `b` resample means.
    *
    * Shape: rows × b expansion is map-side (explode straight into a
    * partial aggregate); everything after is |strata|·b-sized. Resample
    * sums accumulate in DECIMAL (order-independent); means and ranks
    * replay exactly.
    */
  def poissonBootstrap(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      valueCol: String,
      b: Int,
      salt: String): DataFrame = {
    require(b >= 10, "need enough resamples for the percentile ranks")
    import graft.plans.TextHashExpressions.xsMix
    val seed = graft.plans.XsHash.hash(salt.getBytes("UTF-8"))
    val fin = lit(0x9E3779B97F4A7C15L)
    val mixed = xsMix(xsMix(xsMix(xsMix(lit(seed),
      col(idCol).cast("long")), col("rep").cast("long")), fin), fin)
    val u = shiftrightunsigned(mixed, 12).cast("double") /
      lit(4503599627370496.0)
    val w = poisson1Cdf.zipWithIndex.foldRight(lit(5L): Column) {
      case ((t, k), rest) => when(u < t, k.toLong).otherwise(rest)
    }
    val rep = df.select(col(strataCol), col(idCol), col(valueCol))
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__w", w)
      .groupBy(col(strataCol), col("rep"))
      .agg(sum(col("__w")).as("n_rep"),
        sum((col("__w") * col(valueCol)).cast(DecimalType(18, 2))).as("s_rep"))
      .filter(col("n_rep") > 0)
      .withColumn("mean_rep",
        col("s_rep").cast("double") / col("n_rep").cast("double"))
    val loRank = math.ceil(b * 0.1).toLong
    val hiRank = math.ceil(b * 0.9).toLong
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(col("mean_rep"), col("rep"))
    val ranked = rep.withColumn("__rk", row_number().over(ord))
    val ci = ranked.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_resamples"),
        max(when(col("__rk") === loRank, col("mean_rep"))).as("ci_lo"),
        max(when(col("__rk") === hiRank, col("mean_rep"))).as("ci_hi"))
    val point = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol).cast(DecimalType(18, 2))).cast("double") /
          count(lit(1)).cast("double")).as("mean"))
    point.join(ci, Seq(strataCol))
      .select(col(strataCol), col("n"), round(col("mean"), 6).as("mean"),
        col("n_resamples"), round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"))
  }

  /** CLASS-BALANCED downsampling to the minority count: every class keeps
    * exactly min(|class|) rows, chosen by md5-hash order of the id — a
    * deterministic uniform draw (stage retries and engine re-runs keep
    * the SAME rows, the property a training-data pipeline needs for
    * reproducible rebalancing). One class-count aggregate (broadcast
    * back, it is class-domain-sized) + one per-class window; no
    * corpus-wide ordering anywhere.
    */
  def balancedDownsample(
      df: DataFrame,
      classCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minRow = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n"))).head()
    require(!minRow.isNullAt(0), "balancedDownsample: empty input")
    val minN = minRow.getLong(0)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    df.withColumn("__h", h)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(classCol))
          .orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= minN)
      .drop("__h", "__rn")
  }

  /** POST-STRATIFICATION — reweight a biased sample to KNOWN population
    * stratum shares: the survey-sampling estimator that fixes "my
    * sample over-represents stratum X" without re-collecting,
    *
    *   ŷ = Σ_h W_h·ȳ_h,   SE² = Σ_h W_h²·s_h²/n_h,   W_h = N_h/N
    *
    * — the companion to [[balancedDownsample]] (which rebalances by
    * DROPPING rows; this reweights the estimate). Exact integer moments
    * per stratum, per-stratum W·ȳ and W²s²/n terms on the 1e-9 grid,
    * decimal-summed; the estimate/SE broadcast onto the per-stratum
    * rows (the mi_total shape). Strata present in the population but
    * unsampled are REPORTED (NULL mean, n = 0) — their weight is
    * missing mass the estimate cannot cover, flagged rather than
    * silently renormalized.
    */
  def postStratify(
      sample: DataFrame,
      population: DataFrame,
      stratumCol: String,
      valueCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val d38 = DecimalType(38, 0)
    val pop = population.groupBy(col(stratumCol).cast("string").as("h"))
      .agg(count(lit(1)).as("pop_n"))
    val samp = sample.groupBy(col(stratumCol).cast("string").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("long").cast(d38)).as("s"),
        sum(col(valueCol).cast("long").cast(d38) *
          col(valueCol).cast("long").cast(d38)).as("ss"))
    val joined = pop.join(samp, Seq("h"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val tot = Window.partitionBy()
    val nD = dbl(col("n"))
    val w = dbl(col("pop_n")) / dbl(sum(col("pop_n")).over(tot))
    val meanH = dbl(col("s")) / nD
    val varH = (nD * dbl(col("ss")) - dbl(col("s")) * dbl(col("s"))) /
      (nD * (nD - 1.0))
    val staged = joined
      .withColumn("w", round(w, 9))
      .withColumn("mean_h", when(col("n") > 0L, round(meanH, 6)))
      .withColumn("term_y", when(col("n") > 0L,
        round(w * meanH, 9)).otherwise(lit(0.0))
        .cast(DecimalType(28, 9)))
      .withColumn("term_v", when(col("n") > 1L,
        round(w * w * varH / nD, 9)).otherwise(lit(0.0))
        .cast(DecimalType(28, 9)))
      .withColumn("covered", col("n") > 0L)
    staged.select(col("h"), col("pop_n"), col("n"), col("w"),
      col("mean_h"), col("covered"),
      round(dbl(sum(col("term_y")).over(tot)), 6).as("estimate"),
      round(sqrt(dbl(sum(col("term_v")).over(tot))), 6).as("se"))
  }

  /** TEMPERATURE-SCALED MIXING WEIGHTS (α = 0.5) — the data-mixing table
    * every multi-source training run starts from: sampling probability
    * pᵢ ∝ tᵢ^α flattens the source distribution so small domains are
    * up-sampled relative to their token share (α=1 is proportional,
    * α=0 uniform; the classic multilingual-LM recipe). Reports, per
    * group, the mixing weight, the tokens one "epoch" of the budget
    * draws from it, and how many times its own corpus that re-reads
    * (effective epochs — the over-sampling red flag when ≫ 1).
    *
    * α is FIXED at 0.5 because sqrt is IEEE-correctly-rounded on both
    * engines (bit-identical) while pow(x, α) is libm-dependent; the
    * weights are √tokens rounded once to the 1e-6 grid and summed as
    * exact decimals (order-independent), each pᵢ one pinned double
    * ratio. One group-census aggregate — group-domain-sized everything.
    */
  def temperatureMixing(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "need a positive token budget")
    def dbl(c: Column): Column = c.cast("double")
    val census = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol).cast("long")).as("n_tokens"))
      .withColumn("w",
        round(sqrt(dbl(col("n_tokens"))), 6).cast(DecimalType(18, 6)))
    val tot = Window.partitionBy()
    val p = dbl(col("w")) / dbl(sum(col("w")).over(tot))
    census.select(col("g"), col("n_docs"), col("n_tokens"),
      round(p, 9).as("weight"),
      round(p * lit(tokenBudget.toDouble), 6).as("tokens_per_epoch"),
      round(p * lit(tokenBudget.toDouble) / dbl(col("n_tokens")), 6)
        .as("eff_epochs"))
  }

  /** EFFECTIVE SAMPLE SIZE of weighted data — ESS = (Σw)²/Σw², the
    * Kish diagnostic that says how many EQUAL-WEIGHT rows a weighted
    * set is actually worth: importance weighting (q479's DSIR scores,
    * q371's IPS) silently concentrates the estimator on a few heavy
    * rows, and ESS/n is the number that catches it before anyone trains
    * on a "10M-row" corpus that is statistically 40k rows. Exact
    * DECIMAL(38,0) weight moments per group (integer-weight contract),
    * two pinned ratios, group-domain-sized output.
    */
  def essWeights(
      df: DataFrame,
      groupCol: String,
      weightCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = col(weightCol).cast("long").cast(d38)
    essFromMoments(df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"), sum(w).as("sw"), sum(w * w).as("sww")))
  }

  /** [[essWeights]] computed from a (g, n, Σw, Σw²) MOMENT CENSUS — rows
    * of partials (e.g. the streaming store's per-batch commits). The
    * moments are associative sums, so however the partials were batched
    * the merged readout equals the one-pass [[essWeights]] bit for bit —
    * the property that lets the streaming surface share the batch oracle.
    */
  def essFromMoments(census: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    census.groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("sw").cast(d38)).as("sw"),
        sum(col("sww").cast(d38)).as("sww"))
      .select(col("g"), col("n"),
        round(dbl(col("sw")) * dbl(col("sw")) / dbl(col("sww")), 6).as("ess"),
        round(dbl(col("sw")) * dbl(col("sw")) / dbl(col("sww")) /
          dbl(col("n")), 6).as("ess_ratio"))
  }

  /** NEYMAN ALLOCATION — the variance-optimal stratified sampling plan:
    * given a total budget, stratum h draws n_h ∝ N_h·S_h (size × spread),
    * the allocation that minimizes the estimator variance where
    * proportional allocation ignores spread entirely. The output is the
    * PLAN a sampler (q48's stratified draw) executes.
    *
    * Exactness: per-stratum moments are exact DECIMAL(38,0) integer sums
    * (cents discipline); S_h is one pinned double rounded to 1e-6;
    * weights scale to integer micro-shares of the decimal-summed total,
    * and the budget splits by the largest-remainder (Hamilton) rule —
    * the [[largestRemainderSplit]] discipline — so allocations are pure
    * integers summing EXACTLY to the budget (remainder ties break by
    * stratum key). Single-row and zero-variance strata carry weight 0
    * (S undefined / zero — they need no sample to be known exactly).
    * Shape: one group census; everything after is strata-domain-sized.
    * Note: an allocation may exceed its stratum's N_h when budgets are
    * large and a stratum is tiny — redistribution is the caller's policy
    * decision, flagged in `over_allocated`.
    */
  def neymanAllocation(
      df: DataFrame,
      strataCol: String,
      valueCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "need a positive sample budget")
    require(budget <= 1000000L,
      "budget above 1e6 would overflow the micro-share arithmetic")
    def dbl(c: Column): Column = c.cast("double")
    val d38 = DecimalType(38, 0)
    val v = col(valueCol).cast("long").cast(d38)
    val per = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(v).as("sv"), sum(v * v).as("svv"))
    val nD = dbl(col("n_rows"))
    val sd = when(col("n_rows") > 1L,
      round(sqrt((dbl(col("svv")) - dbl(col("sv")) * dbl(col("sv")) / nD) /
        (nD - 1.0)), 6)).otherwise(lit(0.0))
    val withW = per.withColumn("sd", sd)
      .withColumn("w", round(nD * col("sd"), 6).cast(DecimalType(28, 6)))
    val tot = Window.partitionBy()
    // integer micro-shares: share in [0,1] over the exact decimal total,
    // scaled to 1e12 units — all allocation arithmetic below is integer
    // all-degenerate spread (every stratum single-row or constant) falls
    // back to proportional-to-size shares rather than dividing by zero
    val share = when(sum(col("w")).over(tot) > lit(0).cast(DecimalType(28, 6)),
      dbl(col("w")) / dbl(sum(col("w")).over(tot)))
      .otherwise(nD / dbl(sum(col("n_rows")).over(tot)))
    val staged = withW
      .withColumn("su", round(share * 1.0e12, 0).cast("long"))
      .withColumn("s_total", sum(col("su")).over(tot))
      .withColumn("base", expr(s"($budget * su) div s_total"))
      .withColumn("rem", expr(s"($budget * su) % s_total"))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(tot))
      .withColumn("erk", row_number().over(
        tot.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("alloc",
        col("base") + when(col("erk") <= col("leftover"), 1L).otherwise(0L))
    staged.select(col("stratum"), col("n_rows"), col("sd"),
      col("su").as("weight_ppt"), col("alloc"),
      (col("alloc") > col("n_rows")).as("over_allocated"))
  }
  /** RAKING / ITERATIVE PROPORTIONAL FITTING — calibrate (row, col) cell
    * weights so the weighted marginals hit DECLARED targets: the survey
    * post-stratification workhorse and the training-data MIXTURE
    * calibration step ("equal mass per source, keep the observed
    * language mix") that q225's schedule and q159's temperature sampling
    * assume someone already ran. Here the row target is the uniform
    * share over the observed row domain and the column target is the
    * observed column marginal (a production run passes declared
    * targets); `rounds` alternating row/column scalings, each rescaled
    * weight ROUNDED to the 1e-9 grid so both engines walk the identical
    * trajectory (the iteration is a contraction - grid rounding does not
    * stall it). Cell-domain-sized frame throughout (bounded-domain
    * contract); the row-domain cardinality pin is one distinct count.
    * Output: (row, col, n, weight, factor) where factor = weight / raw
    * share - the up/down-weighting each cell receives.
    */
  def rake(
      df: DataFrame,
      rowCol: String,
      colCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 6, "bounded IPF rounds")
    val d189 = DecimalType(18, 9)
    def dbl(x: Column): Column = x.cast("double")
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // cell census, domain pin + iteration
    val nRows = cells.select(col("r")).distinct().count().toDouble
    val fam = Window.partitionBy()
    val byR = Window.partitionBy(col("r"))
    val byC = Window.partitionBy(col("c"))
    val base = cells
      .withColumn("tot", sum(col("n")).over(fam))
      .withColumn("ct", dbl(sum(col("n")).over(byC)) / dbl(col("tot")))
      .withColumn("w",
        round(dbl(col("n")) / dbl(col("tot")), 9).cast(d189))
    val rt = lit(1.0) / lit(nRows)
    val fitted = (1 to rounds).foldLeft(base) { (acc, _) =>
      acc
        .withColumn("w", round(dbl(col("w")) *
          (rt / dbl(sum(col("w")).over(byR))), 9).cast(d189))
        .withColumn("w", round(dbl(col("w")) *
          (col("ct") / dbl(sum(col("w")).over(byC))), 9).cast(d189))
    }
    fitted.select(col("r"), col("c"), col("n"),
      dbl(col("w")).as("weight"),
      round(dbl(col("w")) / (dbl(col("n")) / dbl(col("tot"))), 6)
        .as("factor"))
  }
}