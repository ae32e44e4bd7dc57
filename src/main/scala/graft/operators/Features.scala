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

  /** BINARY-CLASSIFIER evaluation in one pass: the confusion matrix and
    * P/R/F1 at a threshold, plus EXACT ROC-AUC as the rank statistic
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with tie-averaged ranks — the
    * Mann–Whitney identity, so no curve integration, no score sort of
    * the corpus: ranks come from the SCORE DOMAIN (one map-side-combined
    * aggregate + a domain-sized cumulative window), doubled ranks and
    * sums exact in DECIMAL(38,0) (the q319 machinery pointed at model
    * evaluation).
    */
  def binaryMetrics(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val s = col(scoreCol).cast("double")
    val byScore = df
      .groupBy(s.as("v"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("tp1"),
        sum(when(labelCol, 0L).otherwise(1L)).as("tn1"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byScore
      .withColumn("t", col("tp1") + col("tn1"))
      .withColumn("c", sum(col("tp1") + col("tn1")).over(cum))
      .withColumn("r2", lit(2L) * col("c") - col("t") + 1L)
    val d38 = DecimalType(38, 0)
    val agg = ranked.agg(
      sum(col("tp1")).as("np"), sum(col("tn1")).as("nn"),
      sum(col("tp1").cast(d38) * col("r2").cast(d38)).as("rp2"),
      sum(when(col("v") >= threshold, col("tp1")).otherwise(0L)).as("tp"),
      sum(when(col("v") >= threshold, col("tn1")).otherwise(0L)).as("fp"),
      sum(when(col("v") < threshold, col("tp1")).otherwise(0L)).as("fn"),
      sum(when(col("v") < threshold, col("tn1")).otherwise(0L)).as("tn"))
    def dbl(c: Column): Column = c.cast("double")
    val prec = dbl(col("tp")) / dbl(col("tp") + col("fp"))
    val rec = dbl(col("tp")) / dbl(col("tp") + col("fn"))
    val auc2 = col("rp2") - col("np").cast(d38) * (col("np") + 1L).cast(d38)
    agg.select(col("np").as("n_pos"), col("nn").as("n_neg"),
      col("tp"), col("fp"), col("fn"), col("tn"),
      round(prec, 6).as("precision"), round(rec, 6).as("recall"),
      round(lit(2.0) * prec * rec / (prec + rec), 6).as("f1"),
      round(dbl(auc2) / (lit(2.0) * dbl(col("np")) * dbl(col("nn"))), 6)
        .as("auc"))
  }

  /** DECISION-STUMP SPLIT — the best single threshold on a bucketed
    * numeric feature by Gini gain: the tree-based sibling of q325's
    * WOE/IV feature audit (IV scores the feature's total separating
    * power; the stump says WHERE one cut buys the most purity, which
    * is what a triage rule or a first tree node actually uses).
    * Candidates are bucket boundaries (domain-bounded — never raw
    * values), cumulative class counts run over the ordered bucket
    * domain, gains pin at 1e-9 and ties break toward the LOWEST
    * boundary deterministically. Splits with an empty side are not
    * candidates.
    */
  def stumpSplit(
      df: DataFrame,
      bucketCol: Column,
      labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dbl(c: Column): Column = c.cast("double")
    val cen = df.select(bucketCol.cast("long").as("b"),
        labelCol.cast("long").as("y"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .localCheckpoint(true) // cumulative sweep over the bucket domain
    val ord = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val sw = cen
      .withColumn("cn", sum(col("n")).over(ord))
      .withColumn("cp", sum(col("pos")).over(ord))
      .withColumn("tn", sum(col("n")).over(all))
      .withColumn("tp", sum(col("pos")).over(all))
      .filter(col("cn") > 0L && col("cn") < col("tn"))
    def gini(p: Column, n: Column): Column = {
      val q = dbl(p) / dbl(n)
      lit(1.0) - q * q - (lit(1.0) - q) * (lit(1.0) - q)
    }
    val nl = col("cn"); val nr = col("tn") - col("cn")
    val weighted = (dbl(nl) * gini(col("cp"), nl) +
      dbl(nr) * gini(col("tp") - col("cp"), nr)) / dbl(col("tn"))
    val parent = gini(col("tp"), col("tn"))
    val scored = sw.select(col("b"), nl.as("n_left"), nr.as("n_right"),
      round(parent, 9).as("parent_gini"),
      round(weighted, 9).as("weighted_gini"),
      round(parent - weighted, 9).as("gain"))
    scored.orderBy(col("gain").desc, col("b"))
      .limit(1)
      .select(col("b").as("split_bucket"), col("n_left"), col("n_right"),
        round(col("parent_gini"), 6).as("parent_gini"),
        round(col("weighted_gini"), 6).as("weighted_gini"),
        round(col("gain"), 6).as("gain"))
  }

  /** CLASSIFIER SUITE beyond P/R/F1 — the prevalence-robust readouts
    * [[binaryMetrics]] omits, from the SAME four confusion integers:
    * MCC (the correlation coefficient of the confusion matrix — the
    * one scalar that stays honest under class imbalance, where
    * accuracy and even F1 flatter a majority-class guesser), Youden's
    * J and balanced accuracy (threshold quality independent of
    * prevalence), specificity and NPV (the negative-side column F1
    * ignores entirely), and F2 (recall-weighted, for screens where a
    * miss costs more than a false alarm). One conditional census;
    * every metric is O(1) double arithmetic; one-sided degenerates
    * NULL their metric instead of dividing by zero.
    */
  def classifierSuite(
      df: DataFrame,
      scoreCol: String,
      labelCol: Column,
      threshold: Double): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val s = col(scoreCol).cast("double")
    val agg = df.agg(
      sum(when(labelCol && s >= threshold, 1L).otherwise(0L)).as("tp"),
      sum(when(!labelCol && s >= threshold, 1L).otherwise(0L)).as("fp"),
      sum(when(labelCol && s < threshold, 1L).otherwise(0L)).as("fn"),
      sum(when(!labelCol && s < threshold, 1L).otherwise(0L)).as("tn"))
    val n = dbl(col("tp") + col("fp") + col("fn") + col("tn"))
    val sens = dbl(col("tp")) / dbl(col("tp") + col("fn"))
    val spec = dbl(col("tn")) / dbl(col("tn") + col("fp"))
    val prec = dbl(col("tp")) / dbl(col("tp") + col("fp"))
    val npv = dbl(col("tn")) / dbl(col("tn") + col("fn"))
    val posOk = col("tp") + col("fn") > 0L
    val negOk = col("tn") + col("fp") > 0L
    val mccDen = dbl(col("tp") + col("fp")) * dbl(col("tp") + col("fn")) *
      dbl(col("tn") + col("fp")) * dbl(col("tn") + col("fn"))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((dbl(col("tp")) + dbl(col("tn"))) / n, 6).as("accuracy"),
      round(dbl(col("tp") + col("fn")) / n, 6).as("prevalence"),
      when(mccDen > 0.0,
        round((dbl(col("tp")) * dbl(col("tn")) -
          dbl(col("fp")) * dbl(col("fn"))) / sqrt(mccDen), 6)).as("mcc"),
      when(posOk && negOk, round(sens + spec - 1.0, 6)).as("youden_j"),
      when(posOk && negOk, round((sens + spec) / 2.0, 6))
        .as("balanced_acc"),
      when(negOk, round(spec, 6)).as("specificity"),
      when(col("tn") + col("fn") > 0L, round(npv, 6)).as("npv"),
      when(col("tp") + col("fp") > 0L && posOk &&
          lit(4.0) * prec + sens > 0.0,
        round(lit(5.0) * prec * sens / (lit(4.0) * prec + sens), 6))
        .as("f2"))
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

  /** OFF-POLICY REPLAY evaluation (the Li et al. replay method): score a
    * DETERMINISTIC candidate policy against logged (context, action,
    * reward) rows without deploying it — keep only rows where the logged
    * action happens to equal the policy's choice for that context, and
    * average their rewards. Unbiased when logging was uniform-random
    * over `actions`; always an apples-to-apples A/B-style readout
    * against the logged baseline. The policy here is the hash rule
    * `actions[h52(context) mod |actions|]` — stateless, so every
    * executor (and the oracle) scores contexts identically with zero
    * coordination, the same property that makes [[hashedFeatures]]
    * serve-safe. Reward means are exact-cents decimal sums divided once.
    */
  def policyReplay(
      df: DataFrame,
      contextCol: String,
      actionCol: String,
      rewardCentsCol: String,
      actions: Seq[String]): DataFrame = {
    require(actions.nonEmpty && actions.distinct.size == actions.size)
    import org.apache.spark.sql.types.DecimalType
    val policy = hashPolicy(col(contextCol), actions)
    val d38 = DecimalType(38, 0)
    val r = col(rewardCentsCol).cast("long").cast(d38)
    val matched = col(actionCol) === policy
    df.agg(count(lit(1)).as("n_total"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
        sum(when(matched, r).otherwise(lit(0).cast(d38))).as("sr"),
        sum(r).as("srAll"))
      .select(col("n_total"), col("n_matched"),
        round(col("n_matched").cast("double") / col("n_total").cast("double"),
          6).as("match_rate"),
        round(col("sr").cast("double") / col("n_matched").cast("double"), 6)
          .as("replay_reward"),
        round(col("srAll").cast("double") / col("n_total").cast("double"), 6)
          .as("baseline_reward"))
  }

  /** The deterministic hash policy both off-policy evaluators score:
    * `actions[h52(context) mod |actions|]`. Stateless, so every executor
    * (and the oracle) maps contexts identically with zero coordination.
    */
  private def hashPolicy(context: Column, actions: Seq[String]): Column = {
    val h = conv(substring(md5(context.cast("string").cast("binary")),
      1, 13), 16, 10).cast("long")
    element_at(array(actions.map(lit): _*),
      pmod(h, lit(actions.size)).cast("int") + 1)
  }

  /** CUPED variance reduction (Deng et al. 2013) — the experimentation
    * workhorse that makes A/B tests decisive at a fraction of the
    * traffic: adjust each unit's post-period metric y by its PRE-period
    * covariate x, ŷ = y − θ(x − x̄) with θ = cov(x,y)/var(x) fitted on
    * the POOLED sample (pre-period data is treatment-independent, so
    * the adjustment is unbiased). Reports per arm the raw and adjusted
    * means plus the variance ratio — the fraction of noise CUPED
    * removed, i.e. how much less traffic the next test needs. ONE
    * conditional-moment pass over (unit, x, y, arm): all sums exact in
    * DECIMAL(38,0) (integer cents in), θ and the finishes pinned
    * doubles; var(ŷ) expands to Σy² − 2θΣxy + θ²Σx² so no second pass
    * materializes adjusted rows.
    */
  def cuped(
      df: DataFrame,
      armCol: String,
      xCentsCol: String,
      yCentsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val x = col(xCentsCol).cast("long").cast(d38)
    val y = col(yCentsCol).cast("long").cast(d38)
    val perArm = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    val tot = Window.partitionBy()
    def g(c: String): Column = sum(col(c)).over(tot)
    val gn = dbl(g("n"))
    // pooled theta = (N·Σxy − Σx·Σy) / (N·Σxx − Σx·Σx), exact operands
    val theta = (gn * dbl(g("sxy")) - dbl(g("sx")) * dbl(g("sy"))) /
      (gn * dbl(g("sxx")) - dbl(g("sx")) * dbl(g("sx")))
    val xbar = dbl(g("sx")) / gn
    val n = dbl(col("n"))
    val meanY = dbl(col("sy")) / n
    val meanX = dbl(col("sx")) / n
    val meanAdj = meanY - theta * (meanX - xbar)
    // per-arm variances (population form): Σ(v−v̄)²/n from raw moments
    val varY = dbl(col("syy")) / n - meanY * meanY
    val varAdj = (dbl(col("syy")) - lit(2.0) * theta * dbl(col("sxy")) +
      theta * theta * dbl(col("sxx"))) / n -
      (meanY - theta * meanX) * (meanY - theta * meanX)
    perArm.select(col("arm"), col("n"),
      round(meanY, 6).as("mean_y"),
      round(meanAdj, 6).as("mean_y_adj"),
      round(theta, 6).as("theta"),
      round(varAdj / varY, 6).as("var_ratio"))
  }

  /** SPLIT-CONFORMAL prediction intervals (Vovk; Lei et al.) per group —
    * distribution-free coverage for ANY point predictor: hash-split the
    * data into train/calibration, fit the predictor on train (here the
    * group mean — swap in anything), take q̂ = the ⌈(n_cal+1)(1−α)⌉-th
    * order statistic of calibration |residuals|, and ship [pred − q̂,
    * pred + q̂], guaranteed ≥ 1−α coverage with NO distributional
    * assumption. Exactness: the prediction lands on the 1e-6 decimal
    * grid, residuals are exact decimals against integer cents, and q̂
    * resolves by discrete-rank lookup on the residual VALUE DOMAIN (the
    * q124 discipline) — the only doubles are the output casts. The
    * measured calibration coverage is reported beside the guarantee.
    * Groups with no train rows (or no calibration rows) have no fit and
    * DROP from the output — an interval from zero calibration points
    * would be a lie, not a row.
    */
  def conformalInterval(
      df: DataFrame,
      groupCol: String,
      yCentsCol: String,
      idCol: String,
      alphaBp: Int,
      salt: String): DataFrame = {
    require(alphaBp > 0 && alphaBp < 10000)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d186 = DecimalType(18, 6)
    def dbl(c: Column): Column = c.cast("double")
    val h = conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val base = df.select(col(groupCol).as("g"),
      col(yCentsCol).cast("long").as("y"),
      (pmod(h, lit(2L)) === 0L).as("train"))
    val pred = base.filter(col("train"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_train"),
        round(dbl(sum(col("y"))) / dbl(count(lit(1))), 6).cast(d186)
          .as("pred"))
    val resid = base.filter(!col("train")).join(pred, Seq("g"))
      .groupBy(col("g"), col("n_train"), col("pred"),
        abs(col("y").cast(d186) - col("pred")).as("r"))
      .agg(count(lit(1)).as("t"))
    conformalTail(resid, alphaBp)
  }

  /** Shared finish of the split-conformal computation: from the
    * per-group RESIDUAL census `(g, n_train, pred, r, t)` to the
    * interval report — rank lookup on the exact residual domain, the
    * q̂ row's cumulative count doubling as the measured coverage.
    */
  private def conformalTail(resid: DataFrame, alphaBp: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dbl(c: Column): Column = c.cast("double")
    val wg = Window.partitionBy(col("g"))
    val cum = wg.orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = resid
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n_cal", sum(col("t")).over(wg))
      // rank = ceil((n+1)(1−α)) in pure integers, clamped to n
      .withColumn("rk", least(col("n_cal"),
        expr(s"((n_cal + 1) * ${10000 - alphaBp} + 9999) div 10000")))
    // the q̂ row's cumulative count IS the within-interval count, so one
    // struct-min yields both the quantile and the measured coverage
    ranked.groupBy(col("g"), col("n_train"), col("n_cal"), col("pred"))
      .agg(min(when(col("c") >= col("rk"),
        struct(col("r").as("q"), col("c").as("w")))).as("__a"))
      .select(col("g"), col("n_train"), col("n_cal"),
        dbl(col("pred")).as("pred"),
        dbl(col("__a").getField("q")).as("qhat"),
        dbl(col("pred") - col("__a").getField("q")).as("lo"),
        dbl(col("pred") + col("__a").getField("q")).as("hi"),
        round(dbl(col("__a").getField("w")) / dbl(col("n_cal")), 6)
          .as("coverage"))
  }

  /** [[conformalInterval]] recomputed from the `(g, train, y, t)` VALUE
    * CENSUS — the sufficient statistic of split conformal, and the form
    * a STREAM can maintain: censuses merge by ADDING counts, so partial
    * censuses from arbitrary micro-batch slices reassemble the corpus
    * census exactly (StreamVerify.conformalMaintenance is the ingestion
    * side). Integer sums Σy·t / Σt reproduce the row-level mean bit for
    * bit, and the residual census derives from the value census by one
    * domain-sized transform — so the report equals the batch
    * [[conformalInterval]] on the same rows, row for row.
    */
  def conformalFromCensus(census: DataFrame, alphaBp: Int): DataFrame = {
    require(alphaBp > 0 && alphaBp < 10000)
    import org.apache.spark.sql.types.DecimalType
    val d186 = DecimalType(18, 6)
    def dbl(c: Column): Column = c.cast("double")
    val pred = census.filter(col("train"))
      .groupBy(col("g"))
      .agg(sum(col("t")).as("n_train"),
        round(dbl(sum(col("y") * col("t"))) / dbl(sum(col("t"))), 6)
          .cast(d186).as("pred"))
    val resid = census.filter(!col("train")).join(pred, Seq("g"))
      .groupBy(col("g"), col("n_train"), col("pred"),
        abs(col("y").cast(d186) - col("pred")).as("r"))
      .agg(sum(col("t")).as("t"))
    conformalTail(resid, alphaBp)
  }

  /** INVERSE-PROPENSITY-SCORED off-policy evaluation — [[policyReplay]]'s
    * estimator when logging was NOT uniform: weight each matched row by
    * 1/p̂(logged action), with p̂ the EMPIRICAL logging distribution
    * (n_a/n, measured from the log itself in the same pass). Reports both
    * plain IPS — unbiased but variance-prone when a rare action carries a
    * big weight — and the self-normalized SNIPS = Σwr/Σw that trades a
    * vanishing bias for much lower variance (the estimator actually
    * shipped). All mass aggregates to the ACTION domain first (≤ |actions|
    * rows), each action's Σr/n_a and m_a/n_a terms land once on the 1e-6
    * decimal grid, and the k-row finish is pinned doubles — so the whole
    * evaluation is one map-side-combined pass over the log regardless of
    * scale.
    */
  def ipsEval(
      df: DataFrame,
      contextCol: String,
      actionCol: String,
      rewardCentsCol: String,
      actions: Seq[String]): DataFrame = {
    require(actions.nonEmpty && actions.distinct.size == actions.size)
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val d386 = DecimalType(38, 6)
    def dbl(c: Column): Column = c.cast("double")
    val matched = col(actionCol) === hashPolicy(col(contextCol), actions)
    val r = col(rewardCentsCol).cast("long").cast(d38)
    val byAction = df
      .groupBy(col(actionCol).as("a"))
      .agg(count(lit(1)).as("n_a"),
        sum(when(matched, 1L).otherwise(0L)).as("m_a"),
        sum(when(matched, r).otherwise(lit(0).cast(d38))).as("s_a"),
        sum(r).as("sr_a"))
    byAction
      .agg(sum(col("n_a")).as("n_total"),
        sum(col("m_a")).as("n_matched"),
        sum(round(dbl(col("s_a")) / dbl(col("n_a")), 6).cast(d386))
          .as("ips_sum"),
        sum(round(dbl(col("m_a")) / dbl(col("n_a")), 6).cast(d386))
          .as("w_sum"),
        sum(col("sr_a")).as("sr_all"))
      .select(col("n_total"), col("n_matched"),
        round(dbl(col("ips_sum")), 6).as("ips_reward"),
        round(dbl(col("ips_sum")) / dbl(col("w_sum")), 6).as("snips_reward"),
        round(dbl(col("sr_all")) / dbl(col("n_total")), 6)
          .as("baseline_reward"))
  }

  /** QUANTILE NORMALIZATION to the pooled reference distribution: every
    * group's values are replaced by the pooled distribution's order
    * statistic at the same scaled rank — after it, all groups share ONE
    * value distribution (the batch-effect remover of expression arrays,
    * and the cross-segment score calibrator here). The mapping is pinned
    * exactly: within group g of size n_g, the rank-rn row (ties broken
    * by id) maps to pooled position p = ⌈rn·N/n_g⌉ (exact integer
    * ceiling; contract rn·N < 2^63) and receives the p-th smallest
    * pooled value.
    *
    * Scale shape: per-group ranks are key-partitioned windows; the
    * pooled order statistics come from a VALUE-DOMAIN census run through
    * [[GlobalOrder.prefixSums]] (range shuffle + broadcast offsets — no
    * single-partition window anywhere); and the rank→value lookup is
    * [[Relational.rangeJoin]]'s bucketized containment join on the
    * cumulative-count intervals — an EQUI-join on coarse buckets, never
    * fact × census. Returns `(g, id, v, v_norm)`.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      bucketSize: Long = 4096L): DataFrame = {
    require(bucketSize >= 1, "bucketSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valueCol).cast("long").as("v"))
    val fact = rows
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("g")).orderBy(col("v"), col("id")))
        .cast("long"))
      .withColumn("n_g", count(lit(1))
        .over(Window.partitionBy(col("g"))))
      .crossJoin(broadcast(rows.agg(count(lit(1)).as("n_total"))))
      .withColumn("p", expr("(rn * n_total + n_g - 1) div n_g"))
    val census = rows.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val intervals = GlobalOrder
      .prefixSums(census, Seq(col("v")), "cnt", "cum")
      .select(col("v").as("v_norm"),
        (col("cum") - col("cnt") + 1L).as("lo"),
        (col("cum") + 1L).as("hi"))
    // merge-join hint: after the prefixSums slimming (r12) the interval
    // table's size estimate fell under the auto-broadcast threshold, and
    // broadcasting the EXPLODED bucket intervals builds the relation on
    // one thread — measured ~1.5 s slower than the shuffled merge join
    // this plan had before (and a value census is unbounded at scale, so
    // the merge join is also the honest 100 TB default here)
    Relational.rangeJoin(
        fact.select(col("g"), col("id"), col("v"), col("p")),
        "p", intervals.hint("merge"), "lo", "hi", bucketSize.toDouble)
      .select(col("g"), col("id"), col("v"), col("v_norm"))
  }

  /** RARE-CATEGORY COLLAPSE — the categorical-encoder prep that folds
    * every value below `minSupport` into one `__other__` bucket: a
    * target/one-hot encoder fitted on the raw tail memorizes noise
    * (each rare level seen once gets a degenerate estimate) and breaks
    * on unseen levels at serving; collapsing first caps the cardinality
    * and makes the unseen-level path explicit. Emits the RESOLVED
    * mapping census per column — output value, rows it covers, and how
    * many source levels folded into it — which is the artifact a
    * training job pins and a serving path replays. One melted union,
    * one (column, value) census, category-domain-sized everything.
    */
  def rareCollapse(
      df: DataFrame,
      cols: Seq[String],
      minSupport: Long): DataFrame = {
    require(cols.nonEmpty, "need at least one column to encode")
    require(minSupport >= 1, "support threshold must be positive")
    val melted = cols.map(c =>
      df.select(lit(c).as("column"), col(c).cast("string").as("value")))
      .reduce(_ unionByName _)
    melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("n"))
      .withColumn("out_value",
        when(col("n") >= minSupport, col("value")).otherwise(lit("__other__")))
      .groupBy(col("column"), col("out_value"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_source_values"))
      .withColumn("collapsed", col("out_value") === "__other__")
  }

  /** PLATT SCALING — the parametric calibrator the calibration shelf
    * was missing: fit p = σ(a + b·s) over the (score, outcome) census
    * by `iters` fixed NEWTON steps, so raw scores become probabilities
    * a threshold can be set on. q288/q570 MEASURE miscalibration and
    * q406 fits the nonparametric monotone curve; Platt is the two-
    * parameter fix that extrapolates and ships as two constants. All
    * state is the (a, b) pair, re-pinned to the 1e-9 grid after every
    * step; every σ has a pinned input and a 1e-12-pinned output; the
    * gradient/Hessian sums accumulate re-pinned per-cell terms as exact
    * decimals over the SCORE-DOMAIN census (never row-level), and the
    * 2×2 solve is closed-form. A degenerate Hessian freezes the step
    * (emitted iteration count says how many steps actually moved).
    * Fixed iteration count, deterministic everywhere — the oracle
    * unrolls the identical steps.
    */
  def plattScaling(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      iters: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(iters >= 1 && iters <= 16)
    val d289 = DecimalType(28, 9)
    def dbl(c: Column): Column = c.cast("double")
    val cen = df.select(scoreCol.cast("long").as("s"),
        labelCol.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .localCheckpoint(true) // every Newton step re-reads it
    val tot = cen.agg(count(lit(1)).as("cells"), sum(col("n")).as("nt"),
      sum(col("pos")).as("pt")).head()
    val (cells, nt, pt) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val spark = df.sparkSession
    import spark.implicits._
    // init: b = 0, a = the base-rate logit with +1 smoothing
    var params = Seq((0, 0.0, 0.0)).toDF("it", "a", "b")
      .select(col("it"),
        round(log((dbl(lit(pt)) + 1.0) / (dbl(lit(nt - pt)) + 1.0)), 9)
          .as("a"), col("b"))
    (1 to iters).foreach { _ =>
      val z = round(col("a") + col("b") * dbl(col("s")), 9)
      val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 12)
      val stepped = cen.crossJoin(broadcast(params))
        .select(col("it"), col("a"), col("b"),
          round(dbl(col("pos")) - dbl(col("n")) * p, 9).cast(d289)
            .as("g1t"),
          round(dbl(col("s")) * (dbl(col("pos")) - dbl(col("n")) * p), 9)
            .cast(d289).as("g2t"),
          round(dbl(col("n")) * p * (lit(1.0) - p), 9).cast(d289)
            .as("w0t"),
          round(dbl(col("s")) * (dbl(col("n")) * p * (lit(1.0) - p)), 9)
            .cast(d289).as("w1t"),
          round(dbl(col("s")) * dbl(col("s")) *
            (dbl(col("n")) * p * (lit(1.0) - p)), 9).cast(d289).as("w2t"))
        .groupBy(col("it"), col("a"), col("b"))
        .agg(sum(col("g1t")).as("g1"), sum(col("g2t")).as("g2"),
          sum(col("w0t")).as("h11"), sum(col("w1t")).as("h12"),
          sum(col("w2t")).as("h22"))
      val det = dbl(col("h11")) * dbl(col("h22")) -
        dbl(col("h12")) * dbl(col("h12"))
      val moved = det > lit(1e-12)
      params = stepped.select(
        (col("it") + when(moved, 1).otherwise(0)).as("it"),
        when(moved, round(col("a") +
          (dbl(col("h22")) * dbl(col("g1")) -
            dbl(col("h12")) * dbl(col("g2"))) / det, 9))
          .otherwise(col("a")).as("a"),
        when(moved, round(col("b") +
          (dbl(col("h11")) * dbl(col("g2")) -
            dbl(col("h12")) * dbl(col("g1"))) / det, 9))
          .otherwise(col("b")).as("b"))
        .localCheckpoint(true) // pin the step; keep the lineage flat
    }
    // + 0.0 normalizes a tiny-negative residue's −0.0 to 0.0
    // (hash-stable across engines; the q619 pattern)
    params.select(lit(cells).as("n_cells"), lit(nt).as("n"),
      lit(pt).as("n_pos"), col("it").cast("long").as("steps_moved"),
      (round(col("a"), 6) + lit(0.0)).as("a"),
      (round(col("b"), 6) + lit(0.0)).as("b"))
  }
}
