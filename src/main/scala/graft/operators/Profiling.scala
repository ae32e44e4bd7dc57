package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Table profiling: the `ANALYZE`/data-quality summary every ingest
  * pipeline runs before trusting a new drop — per column: non-null count,
  * exact distinct count, numeric min/max.
  *
  * Shape: ONE aggregation pass over the table computing every column's
  * statistics side by side (Catalyst plans the multi-column distinct
  * aggregates through a single Expand + partial-aggregate tree — one scan
  * of the 100 TB input, no per-column re-reads), then the single stats row
  * pivots to one row per column with an explode over a literal struct
  * array (driver-side width, data-size independent).
  */
object Profiling {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(c).as(s"${f.name}__nn"),
        count_distinct(c).as(s"${f.name}__nd")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"${f.name}__mn"),
          max(c).cast("double").as(s"${f.name}__mx"))
        case _ => Seq(
          min(lit(null).cast("double")).as(s"${f.name}__mn"),
          max(lit(null).cast("double")).as(s"${f.name}__mx"))
      })
    }
    val stats = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    stats.select(explode(array(cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__rows").as("n_rows"),
        col(s"${f.name}__nn").as("n_nonnull"),
        col(s"${f.name}__nd").as("n_distinct"),
        col(s"${f.name}__mn").as("min_num"),
        col(s"${f.name}__mx").as("max_num"))
    }: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Schema-inference report over a free-form JSON column: one row per
    * (key path, inferred value type) with its row count and coverage —
    * the profiling pass that precedes any semi-structured ingest (what
    * `read.json` schema inference does internally, surfaced as a queryable
    * report instead of a hidden driver step, so it runs distributed and
    * incremental instead of re-sampling the whole input on the driver).
    *
    * Types are inferred from the extracted scalar's lexical form
    * (integer / decimal / boolean / null / string) — the cross-engine
    * portable classification. A quoted "123" is indistinguishable from
    * 123 post-extraction; both engines classify it identically, and real
    * inference would tighten with a raw-token pass. Top-level keys only:
    * nested objects/arrays classify as `string` (their raw rendering),
    * the honest summary for a profiler.
    */
  def jsonSchemaProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("__total"))
    // ONE Jackson parse per row: from_json to map<string,string> keeps each
    // scalar's raw token text (the same text get_json_object('$.<key>')
    // returns), then the map explodes to (path, value) pairs. The previous
    // formulation called get_json_object with a NON-FOLDABLE path, which
    // re-parses both the JSONPath and the document once per (row, key) in
    // interpreted mode — measured 8.5 s of q274's 14 s at sf0.1 in that one
    // stage; this form runs inside whole-stage codegen.
    val kv = df.select(col(jsonCol).as("__j"))
      .select(explode(from_json(col("__j"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .as(Seq("path", "__v")))
    val vtype = when(col("__v").isNull, "null")
      .when(col("__v").rlike("^-?[0-9]+$"), "long")
      .when(col("__v").rlike("^-?[0-9]*\\.[0-9]+$"), "double")
      .when(col("__v").isin("true", "false"), "bool")
      .otherwise("string")
    kv.withColumn("vtype", vtype)
      .groupBy(col("path"), col("vtype"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .withColumn("coverage",
        round(col("n").cast("double") / col("__total").cast("double"), 6))
      .drop("__total")
  }

  /** Benford's-law probabilities for leading digits 1..9, pinned as
    * 12-decimal literals so engine and oracle share the EXACT constants
    * (log10(1+1/d) recomputed per engine would differ in the last ulp).
    */
  private val benfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
    4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
    7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)

  /** Benford first-digit audit — the fabricated-data forensic: observed
    * leading-digit distribution of a positive numeric column vs the
    * Benford expectation, with the χ² statistic. The leading digit comes
    * from the INTEGER part (`floor` then string head), so no cent-rounding
    * boundary can flip a digit between engines; rows with value < 1 are
    * excluded (no leading digit in 10⁰..). One map-side-combined count
    * pass; a 9-row literal spine keeps absent digits visible at n=0; the
    * χ² terms round to the 1e-6 grid and total in DECIMAL — the
    * order-independent, engine-exact discipline.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    benfordFromCensus(df.filter(v >= 1.0)
      .select(substring(floor(v).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n")))
  }

  /** [[benfordDigits]] computed from a DIGIT CENSUS — rows of (digit, n)
    * partials (e.g. the streaming store's per-batch commits). Counts ADD,
    * so however the partials were batched the merged census — and every
    * output bit — equals the one-pass [[benfordDigits]] over the raw
    * rows; that property lets the streaming surface share the batch
    * oracle shape verbatim.
    */
  def benfordFromCensus(censusDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val obs = censusDf
      .groupBy(col("digit").cast("int").as("digit"))
      .agg(sum(col("n")).as("n"))
    val spine = obs.sparkSession.createDataFrame(benfordP)
      .toDF("digit", "expected_p")
    val all = Window.partitionBy()
    spine.join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total", sum(col("n")).over(all))
      .withColumn("expected_n",
        col("expected_p") * col("total").cast("double"))
      .withColumn("chi2_term",
        // zero qualifying rows => expected_n = 0 everywhere; emit NULL
        // terms (and so a NULL chi2_total) explicitly rather than letting
        // 0/0 leak a NaN through the decimal cast
        when(col("total") > 0L,
          round((col("n").cast("double") - col("expected_n")) *
            (col("n").cast("double") - col("expected_n")) /
            col("expected_n"), 6))
          .cast(DecimalType(18, 6)))
      .withColumn("chi2_total",
        sum(col("chi2_term")).over(all).cast("double"))
      .select(col("digit"), col("n"), col("expected_p"),
        round(col("expected_n"), 6).as("expected_n"),
        col("chi2_term").cast("double").as("chi2_term"), col("chi2_total"))
  }

  /** Functional-dependency discovery over declared candidate pairs —
    * the profiler that tells a modeler which "natural keys" actually
    * determine which attributes before they're trusted in a join or an
    * SCD merge. For each (determinant, dependent) pair: how many distinct
    * determinant values exist, how many of them map to >1 dependent value
    * (violations), the worst multiplicity, and the violation rate.
    *
    * Shape: every pair melts into ONE union then ONE (pair, value)-keyed
    * aggregation — a single shuffle however many pairs are probed; the
    * per-pair rollup runs over the group-cardinality-sized aggregate.
    */
  def fdViolations(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    val melted = pairs.map { case (lhs, rhs) =>
      df.select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
        col(lhs).cast("string").as("a"), col(rhs).cast("string").as("b"))
    }.reduce(_ unionByName _)
    melted.groupBy(col("lhs"), col("rhs"), col("a"))
      .agg(count_distinct(col("b")).as("ndv_b"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("ndv_b") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("ndv_b")).as("max_multiplicity"))
      .withColumn("violation_rate",
        round(col("n_violating").cast("double") / col("n_groups").cast("double"),
          6))
      .withColumn("holds", col("n_violating") === 0)
  }

  /** FOREIGN-KEY DISCOVERY across tables — [[fdViolations]]' cross-table
    * sibling: for each candidate (child column → parent column) pair,
    * the inclusion-dependency profile — distinct counts on both sides,
    * how many child values the parent CONTAINS, the containment
    * fraction, and the is_fk verdict (containment = 1). The schema-
    * inference audit run before trusting an undocumented lake's join
    * graph. Each pair is two distinct-aggregates and one left join on
    * the DISTINCT key domains — never a fact×fact join; pairs union into
    * one frame.
    */
  /** JOIN-FANOUT AUDIT — the "will this join explode" question answered
    * BEFORE the join runs, from key-domain statistics alone: per join
    * key, the output contribution is n_left(k)·n_right(k), so the exact
    * total join cardinality is Σ over the key domain — two
    * map-side-combined counts and one domain-sized equi-join, never the
    * fact×fact join being audited. Reports the topN contributing keys
    * with their share of the total: the skew diagnosis that decides
    * between a plain shuffle join, a broadcast, or salting (q19/q75)
    * at 100 TB. Exact decimals throughout; share is the single double.
    */
  def joinFanout(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(topN >= 1)
    val d38 = DecimalType(38, 0)
    val cl = left.groupBy(col(leftKey).cast("string").as("k"))
      .agg(count(lit(1)).as("n_left"))
    val cr = right.groupBy(col(rightKey).cast("string").as("k"))
      .agg(count(lit(1)).as("n_right"))
    val joined = cl.join(cr, Seq("k"))
      .withColumn("n_pairs", col("n_left").cast(d38) *
        col("n_right").cast(d38))
    val tot = Window.partitionBy()
    joined
      .withColumn("total_pairs", sum(col("n_pairs")).over(tot))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_pairs").desc, col("k"))))
      .filter(col("rn") <= topN)
      .select(col("rn").cast("long").as("rank"), col("k"),
        col("n_left"), col("n_right"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("total_pairs").cast("long").as("total_pairs"),
        round(col("n_pairs").cast("double") /
          col("total_pairs").cast("double"), 6).as("share"))
  }

  def fkContainment(
      candidates: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(candidates.nonEmpty)
    candidates.map { case (name, child, childCol, parent, parentCol) =>
      val c = child.select(col(childCol).cast("string").as("k"))
        .filter(col("k").isNotNull).distinct()
      val p = parent.select(col(parentCol).cast("string").as("k"))
        .filter(col("k").isNotNull).distinct()
        .withColumn("__in_p", lit(1L))
      c.join(p, Seq("k"), "left")
        .agg(count(lit(1)).as("n_child_distinct"),
          sum(coalesce(col("__in_p"), lit(0L))).as("n_contained"))
        .crossJoin(p.agg(count(lit(1)).as("n_parent_distinct")))
        .select(lit(name).as("candidate"),
          col("n_child_distinct"), col("n_parent_distinct"),
          col("n_contained"),
          round(col("n_contained").cast("double") /
            col("n_child_distinct").cast("double"), 6).as("containment"),
          (col("n_contained") === col("n_child_distinct")).cast("int")
            .as("is_fk"))
    }.reduce(_ unionByName _)
  }

  /** TUKEY-FENCES OUTLIER REPORT per group — the boxplot numbers: exact
    * Q1/Q3 (lower order statistics at ⌈n/4⌉ / ⌈3n/4⌉ over the value
    * census, pure-integer rank compares), IQR, the 1.5·IQR fences, and
    * how many points sit outside each — the scale-free outlier census
    * a z-score report gets wrong on skewed data (the fences don't
    * assume symmetry). 1.5·integer-cents is exact in double, so the
    * fences and every point compare are engine-identical.
    */
  def tukeyFences(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = df.groupBy(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("t"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(Window.partitionBy(col("g"))))
    def orderStat(pNum: Int, pDen: Int) =
      ranked.filter(col("c") * pDen >= col("n") * pNum)
        .groupBy(col("g")).agg(min(col("v")))
    val q1 = orderStat(1, 4).withColumnRenamed("min(v)", "q1")
    val q3 = orderStat(3, 4).withColumnRenamed("min(v)", "q3")
    val fences = q1.join(q3, "g")
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo", col("q1").cast("double") -
        lit(1.5) * col("iqr").cast("double"))
      .withColumn("hi", col("q3").cast("double") +
        lit(1.5) * col("iqr").cast("double"))
    census.join(fences, "g")
      .groupBy(col("g"))
      .agg(sum(col("t")).as("n"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        max(col("iqr")).as("iqr"),
        max(col("lo")).as("fence_lo"), max(col("hi")).as("fence_hi"),
        sum(when(col("v").cast("double") < col("lo"), col("t"))
          .otherwise(0L)).as("n_low"),
        sum(when(col("v").cast("double") > col("hi"), col("t"))
          .otherwise(0L)).as("n_high"))
  }

  /** COLUMN ENTROPY PROFILE — per column: distinct count, Shannon
    * entropy (nats) and the [0,1] normalized entropy H/ln(distinct):
    * the "how identifying / how skewed is this column" reading that a
    * distinct count alone hides (1M distinct values at 99% mass on one
    * of them ≈ a constant; normalized entropy says so) — feeds
    * partition-key and quasi-identifier decisions alongside
    * [[profile]]'s shape stats.
    *
    * H = ln N − (Σ c·ln c)/N over the per-column value census: c·ln c
    * terms (ln over exact integer counts) on the 1e-9 grid,
    * decimal-summed; normalized NULL for single-valued columns. Columns
    * are profiled via one melt pass (column list small by contract);
    * NULLs count as a regular sentinel category.
    */
  def entropyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(cols.nonEmpty)
    val d189 = DecimalType(18, 9)
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val melted = cols.map { c =>
      df.select(lit(c).as("col_name"),
        coalesce(col(c).cast("string"), lit("\u0000null")).as("v"))
    }.reduce(_.unionByName(_))
    val census = melted.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("term",
        round(dbl(col("c")) * log(dbl(col("c"))), 9).cast(d189))
    val agg = census.groupBy(col("col_name"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(col("term")).as("clogc"))
    val h = log(dbl(col("n"))) - dbl(col("clogc")) / dbl(col("n"))
    agg.select(col("col_name"), col("n"), col("n_distinct"),
      round(h, 6).as("entropy_nats"),
      round(when(col("n_distinct") > 1L,
        h / log(dbl(col("n_distinct")))), 6).as("entropy_norm"))
  }

  /** CHAO1 RICHNESS + GOOD'S COVERAGE per group — "how much vocabulary
    * haven't we seen yet": the observed species count is a lower bound
    * that keeps climbing with corpus size (Heaps' law, q535); Chao1
    * extrapolates the unseen mass from the singleton/doubleton balance
    * (many singletons = the accumulation curve is nowhere near flat)
    * and Good's coverage 1 − f1/n says what share of the next sample
    * will be already-known species. The deduplication/crawl-planning
    * question ("is another crawl of this source worth it") answered
    * from ONE abundance census: per-(group, species) counts collapse
    * to the frequency-of-frequencies, everything after is O(groups)
    * integer arithmetic. Uses the bias-corrected estimator
    * f1(f1−1)/(2(f2+1)) — defined even when doubletons are absent,
    * where the classic f1²/2f2 blows up.
    */
  def chao1(
      df: DataFrame,
      groupCol: String,
      speciesCol: String): DataFrame = {
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val census = df.select(col(groupCol).cast("string").as("g"),
        col(speciesCol).cast("string").as("sp"))
      .groupBy(col("g"), col("sp")).agg(count(lit(1)).as("c"))
    val a = census.groupBy(col("g"))
      .agg(count(lit(1)).as("s_obs"), sum(col("c")).as("n"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
    a.select(col("g").as(groupCol), col("n").as("n_tokens"),
      col("s_obs"), col("f1"), col("f2"),
      round(dbl(col("s_obs")) + dbl(col("f1")) * (dbl(col("f1")) - 1.0) /
        (lit(2.0) * (dbl(col("f2")) + 1.0)), 6).as("chao1"),
      when(col("n") > 0L,
        round(lit(1.0) - dbl(col("f1")) / dbl(col("n")), 6))
        .as("coverage"))
  }

  /** HILL-NUMBER DIVERSITY PROFILE per group — the "effective number
    * of units" ladder that puts richness, Shannon and Simpson on ONE
    * comparable scale: q0 = observed distinct units, q1 = exp(Shannon)
    * (effective count weighting units by share), q2 = 1/Σp² (inverse
    * Simpson, weighting toward dominants). An event type with a
    * million registered users but hill2 ≈ 40 is a forty-user feature
    * wearing a big denominator — the audience-concentration readout
    * q460's entropy states in nats and q338's Gini states as
    * inequality, here in UNITS so thresholds mean something. One
    * (group, unit) census; the Shannon terms pin on the 1e-9 grid
    * (q460's discipline) and Σc² is an exact DECIMAL(38,0) integer, so
    * both engines read identical profiles. Evenness = hill1/richness.
    */
  def hillNumbers(
      df: DataFrame,
      groupCol: String,
      unitCol: String): DataFrame =
    hillNumbersFromCensus(df.select(col(groupCol).cast("string").as("g"),
        col(unitCol).cast("string").as("u"))
      .groupBy(col("g"), col("u")).agg(count(lit(1)).as("c")), groupCol)

  /** [[hillNumbers]] from a (g, u, c) census — unit counts ADD across
    * batches (richness, Shannon and Σc² are all census functionals),
    * so a streaming store's drained census reads identically to the
    * one-pass path and shares the batch oracle verbatim.
    */
  def hillNumbersFromCensus(
      censusDf: DataFrame,
      groupCol: String = "g"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dbl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val d189 = DecimalType(18, 9)
    val d38 = DecimalType(38, 0)
    val census = censusDf.groupBy(col("g"), col("u"))
      .agg(sum(col("c")).as("c"))
    val a = census.groupBy(col("g"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("richness"),
        sum(round(dbl(col("c")) * log(dbl(col("c"))), 9).cast(d189))
          .as("clogc"),
        sum(col("c").cast(d38) * col("c").cast(d38)).as("c2"))
    val h = log(dbl(col("n"))) - dbl(col("clogc")) / dbl(col("n"))
    a.select(col("g").as(groupCol), col("n"), col("richness"),
      round(exp(h), 6).as("hill1"),
      round(dbl(col("n")) * dbl(col("n")) / dbl(col("c2")), 6).as("hill2"),
      when(col("richness") > 0L, round(exp(h) / dbl(col("richness")), 6))
        .as("evenness"))
  }
}
