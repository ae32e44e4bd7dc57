package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operators beyond the basics: as-of join, salted aggregation,
  * exact discrete percentiles. All are composed from built-in operators so
  * Catalyst/AQE keep optimizing them (preference (a) in the build rules).
  */
object Relational {

  /** Exact-decimal sum surfaced as double: deterministic under any partition
    * order/parallelism, unlike a raw double sum. This is the engine-wide
    * pattern for money/quantity aggregates.
    */
  def sumExact(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` for the same key — without a range cross-join.
    *
    * Implementation: union both sides tagged, one window sort per key,
    * `last(right attrs, ignoreNulls)` carried forward, keep left rows.
    * One shuffle on the key, sort within partitions, no row explosion —
    * this is the plan that survives 100 TB (a key-equi shuffle), whereas a
    * `leftTs >= rightTs` theta-join degenerates to broadcast-nested-loop.
    *
    * `right` must be unique per (key, ts): pre-aggregate it if not.
    * Both `ts` columns must be the same orderable type.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      carry: Seq[String]): DataFrame = {
    // the union/window plumbing uses __-prefixed scratch columns; a caller
    // column of the same name would silently corrupt the result
    require(
      !(left.columns ++ right.columns).exists(_.startsWith("__")),
      "asofJoin: input columns may not start with '__' (reserved for internal use)")
    val lCols = left.columns
    val tagged =
      left
        .withColumn("__ts", col(leftTs))
        .withColumn("__side", lit(1))
        .select(
          (lCols.map(col) :+ col("__ts") :+ col("__side")) ++
            carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__c_$c")): _*)
        .unionByName(
          right
            .withColumn("__ts", col(rightTs))
            .withColumn("__side", lit(0))
            .select(
              (lCols.map(c =>
                if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
                col("__ts") :+ col("__side")) ++
                carry.map(c => col(c).as(s"__c_$c")): _*))
    // right rows (side=0) sort before left rows at equal ts => inclusive <=
    val w = Window
      .partitionBy(key)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the whole right row as ONE struct and last() that: a per-column
    // last(ignoreNulls) would skip a right row whose carry value is
    // legitimately NULL and mis-attribute an older row's value
    val carried = tagged
      .withColumn("__c_row",
        when(col("__side") === 0,
          struct(carry.map(c => col(s"__c_$c").as(c)): _*)))
      .withColumn("__last_row", last(col("__c_row"), ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        carry.map(c => col("__last_row").getField(c).as(c)): _*)
  }

  /** Two-phase salted aggregation: pre-aggregate on (key, salt) to spread a
    * skewed key over `saltBuckets` reducers, then combine. Semantics equal a
    * plain groupBy thanks to exact decimal partials.
    */
  def saltedSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // deterministic salt: a nondeterministic one (rand/monotonic id) makes
    // the phase-1 shuffle key unstable under task retry — the classic
    // silent row-loss/duplication hazard on fetch-failure recomputation
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(key), col(valueCol)), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("total"))
  }

  /** Range (interval) join: fact rows matched to every interval
    * `[loCol, hiCol)` containing `valueCol` — WITHOUT the
    * broadcast-nested-loop plan a raw `value >= lo && value < hi` theta-join
    * degenerates to.
    *
    * Each interval is exploded into the coarse buckets of width
    * `bucketSize` it overlaps; the fact side computes its single bucket;
    * the join becomes an EQUI-join on the bucket id (hash shuffle, AQE
    * skew-handling, broadcastable) followed by the exact containment
    * filter. At 100 TB this is the shape that survives: cost scales with
    * fact rows + interval rows × avg buckets-per-interval, not
    * fact × intervals. Choose `bucketSize` near the median interval width
    * (smaller → more interval duplication; larger → more false candidates
    * filtered after the join).
    *
    * Intervals may overlap arbitrarily; a fact row matching k intervals
    * yields k rows. `valueCol`/`loCol`/`hiCol` must be numeric.
    */
  def rangeJoin(
      fact: DataFrame,
      valueCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketSize: Double): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    require(
      !(fact.columns ++ intervals.columns).exists(_.startsWith("__")),
      "rangeJoin: input columns may not start with '__' (reserved for internal use)")
    val lastBucket =
      // hi is exclusive: an interval ending exactly on a bucket boundary
      // does not overlap that bucket
      when(col(hiCol) % bucketSize === 0.0, floor(col(hiCol) / bucketSize) - 1)
        .otherwise(floor(col(hiCol) / bucketSize))
    val expandedIntervals = intervals
      // empty intervals (hi <= lo) match nothing under the hi-exclusive
      // semantics — and without this filter their bucket sequence would run
      // BACKWARDS (Spark's sequence auto-steps -1 when start > stop)
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / bucketSize).cast("long"),
          lastBucket.cast("long"))))
    fact
      .withColumn("__bucket", floor(col(valueCol) / bucketSize).cast("long"))
      .join(expandedIntervals, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Salted join for skewed keys: the big side gets a deterministic salt in
    * [0, saltBuckets) derived from non-key attributes, the small side is
    * replicated once per salt value, and the join runs on (key, salt) —
    * spreading one hot key over `saltBuckets` reducers. Result is
    * row-identical to the plain join.
    *
    * AQE's skew-join split handles most cases at runtime; explicit salting
    * remains the tool when a single key exceeds what one task can hold even
    * after AQE splitting (AQE splits the partition, salting also spreads
    * the build side), or when AQE is unavailable (streaming joins).
    * The salt hashes row content, not rand(): task retries must re-derive
    * the same salt or fetch-failure recomputation duplicates/loses rows.
    * Consequence: rows identical in the salt columns share a bucket — pass
    * `saltCols` naming a high-cardinality column (a unique id is ideal)
    * when the default (all non-key columns) could be constant within a
    * hot key.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(
      !(big.columns ++ small.columns).exists(_.startsWith("__")),
      "saltedJoin: input columns may not start with '__' (reserved for internal use)")
    val saltFrom = if (saltCols.nonEmpty) saltCols else big.columns.filterNot(_ == key).toSeq
    require(saltFrom.nonEmpty,
      "saltedJoin: need at least one non-key column (or explicit saltCols) to derive the salt")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((saltBuckets - 1).toLong))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact discrete percentile per group: value at row `ceil(p * n)` of the
    * group ordered by (`valueCol`, `tieBreak`). Returns one row per group
    * with one column per requested percentile, named `p<percent>`.
    *
    * Scale note: the per-group window sort places each group on one
    * partition — correct for group cardinalities up to partition size
    * (the usual analytics shape: many groups). For a FEW huge groups
    * prefer `percentile_approx` or a manual range-partitioned rank, since
    * any exact per-group order statistic fundamentally needs the group
    * sorted.
    */
  def discretePercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      tieBreak: String,
      ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieBreak))
    val cw = Window.partitionBy(groupCol)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
    val aggs = ps.map { p =>
      max(when(col("__rn") === ceil(col("__cnt") * lit(p)), col(valueCol)))
        .as(s"p${(p * 100).toInt}")
    } :+ max(col("__cnt")).as("n")
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact WEIGHTED percentiles per group — the lower weighted-quantile:
    * the smallest value whose cumulative weight reaches p% of the group's
    * total weight (e.g. "the price below which 90% of shipped QUANTITY
    * falls", not 90% of line rows). Thresholds compare in pure integer
    * space (`100·cumw ≥ p·W`), so the boundary is engine-exact — no
    * double multiplication anywhere near the cut.
    *
    * Shape: one per-group window cumsum ordered by (value, tieBreak) plus
    * a metadata-sized total joined back — [[discretePercentiles]]'s
    * discipline with weights. Weights must be non-negative integers
    * (cast-checked).
    */
  def weightedPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String,
      tieBreak: String,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "percents must be integer percentages in [1, 100]")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(valueCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(groupCol)
    val base = df.select(col(groupCol), col(valueCol), col(tieBreak),
      col(weightCol).cast("long").as("__w"))
    // group total via a whole-partition window: same partitioning as the
    // cumsum (one shuffle serves both), and no self-join lineage
    val cum = base
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__W", sum(col("__w")).over(whole))
    val aggs = percents.map { p =>
      min(when(col("__cw") * 100 >= col("__W") * p, col(valueCol)))
        .as(s"p${p}_w")
    } :+ max(col("__W")).as("total_weight")
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact distinct entities over a trailing window of `windowBuckets`
    * time buckets, reported per observed bucket.
    *
    * The naive formulation — for each bucket, scan the trailing interval —
    * is a theta-join (O(buckets × rows), plans as BNL). Scalable shape:
    * dedup to (bucket, entity) pairs first (collapses 100 TB of events to
    * the pair cardinality), then each pair contributes to exactly
    * `windowBuckets` trailing windows — a BOUNDED explode — and a plain
    * groupBy counts distinct entities per window. Three equi-shuffles, no
    * non-equi join anywhere, replication factor fixed by the window, not
    * the data.
    */
  def trailingDistinct(
      df: DataFrame,
      bucketCol: String,
      entityCol: String,
      windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, "windowBuckets must be positive")
    require(!df.columns.contains("__wb"),
      "input must not carry the reserved __wb column")
    val pairs = df.select(col(bucketCol), col(entityCol)).distinct()
    val observed = pairs.select(col(bucketCol)).distinct()
    pairs
      .select(col(entityCol),
        explode(sequence(col(bucketCol),
          col(bucketCol) + lit(windowBuckets - 1L))).as("__wb"))
      .join(observed.withColumnRenamed(bucketCol, "__wb"), Seq("__wb"), "left_semi")
      .groupBy(col("__wb").as(bucketCol))
      .agg(count_distinct(col(entityCol)).as("n_distinct"))
  }

  /** Shuffle-skew diagnostic: the keys whose row count reaches
    * `threshold`, each with the salt factor (`ceil(n / targetPerTask)`) a
    * salted repartition ([[saltedSum]]/[[saltedJoin]]) would need to
    * spread it over even tasks. The report is what an operator of a
    * 100 TB pipeline consults BEFORE a hot key melts an executor: one
    * map-side-combined count, output bounded by the flagged keys, nothing
    * driver-sized.
    */
  def skewReport(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      targetPerTask: Long): DataFrame = {
    require(threshold >= 1 && targetPerTask >= 1)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col(keyCol), col("n"),
        ceil(col("n").cast("double") / lit(targetPerTask.toDouble))
          .cast("long").as("salt_factor"))
  }

  /** Dynamic-gap sessionization: each event opens an interval
    * `[sec, sec + gap]` where the gap is an arbitrary per-row expression
    * (e.g. longer idle allowance after a purchase), and overlapping or
    * touching intervals per key merge into one session — the
    * interval-merge generalization of fixed-gap sessionize.
    *
    * A new session starts exactly when an event's start exceeds the
    * running maximum end of every earlier interval in its key (a single
    * `max(...) over (rows unbounded preceding, 1 preceding)` — the frame
    * GROWS, so WindowExec maintains it incrementally, one shuffle on the
    * key, no self-join). All arithmetic is integer-exact.
    */
  def dynamicGapSessions(
      df: DataFrame,
      keyCol: String,
      secCol: Column,
      tieCol: Column,
      gapSec: Column): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col("__sec"), col("__tie"))
    val prevEnds = order.rowsBetween(Window.unboundedPreceding, -1)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), secCol.cast("long").as("__sec"),
        tieCol.as("__tie"), gapSec.cast("long").as("__gap"))
      .withColumn("__end", col("__sec") + col("__gap"))
      .withColumn("__prev_max_end", max(col("__end")).over(prevEnds))
      .withColumn("__new",
        (col("__prev_max_end").isNull ||
          col("__sec") > col("__prev_max_end")).cast("long"))
      .withColumn("session_idx", sum(col("__new")).over(running))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__sec")).as("start_sec"),
        max(col("__end")).as("end_sec"))
  }

  /** 2-D skyline (Pareto frontier) per group, both dimensions minimized:
    * a row survives iff no other row in its group is ≤ in both dimensions
    * and < in at least one (equal points do not dominate each other, so
    * exact duplicates all survive).
    *
    * The naive formulation is a per-group self-join (quadratic — dead at
    * scale). The sort-based identity used here: order by x, then a row is
    * dominated exactly when (a) some row with strictly smaller x has
    * y ≤ mine — a running min over the x-ordered prefix, excluded to
    * x < current via RANGE … 1 PRECEDING — or (b) some row with EQUAL x
    * has strictly smaller y — the per-(group, x) min. One window shuffle
    * on the group, zero joins, linear in the partition.
    */
  def skyline2d(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: Column,
      yCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val byX = Window.partitionBy(g: _*).orderBy(col("__x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy((g :+ col("__x")): _*)
    df.withColumn("__x", xCol.cast("long"))
      .withColumn("__y", yCol.cast("long"))
      .withColumn("__minPrev", min(col("__y")).over(byX))
      .withColumn("__minSame", min(col("__y")).over(sameX))
      .filter((col("__minPrev").isNull || col("__minPrev") > col("__y")) &&
        col("__minSame") === col("__y"))
      .drop("__minPrev", "__minSame")
  }

  /** Interval-overlap join: all (left, right) pairs whose closed intervals
    * `[lLo, lHi] × [rLo, rHi]` intersect — WITHOUT the theta-join that
    * Spark would execute as a broadcast-nested-loop (every left row against
    * every right row, the plan that dies first at scale).
    *
    * Both sides explode each interval onto the fixed grid of
    * `bucketWidth`-sized time buckets it covers; the join is then a plain
    * EQUI-join on the bucket id plus the residual overlap predicate, so it
    * shuffles on bucket and scales with (rows × buckets-per-interval +
    * true matches), not |L|×|R|. A pair spanning several shared buckets
    * would match once per bucket; the canonical-bucket filter — keep a
    * match only in the bucket containing `max(lLo, rLo)`, which provably
    * lies inside both intervals for any overlapping pair — makes every
    * pair emit EXACTLY once with no distinct pass.
    *
    * `bucketWidth` trades explosion factor against join selectivity: pick
    * it near the typical interval length so each interval covers O(1)
    * buckets. Long-tail intervals cost proportionally more buckets (their
    * true match potential is proportionally larger anyway).
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lLo: String, lHi: String,
      rLo: String, rHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    // integer `div` throughout (truncating; bounds must be non-negative, as
    // epoch-second intervals are) so the oracle replays bucket ids exactly.
    // Column names must be disjoint across the two sides.
    def withBuckets(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__b",
        explode(sequence(expr(s"CAST($lo AS BIGINT) div $bucketWidth"),
          expr(s"CAST($hi AS BIGINT) div $bucketWidth"))))
    val l = withBuckets(left, lLo, lHi)
    val r = withBuckets(right, rLo, rHi).withColumnRenamed("__b", "__rb")
    l.join(r,
        col("__b") === col("__rb") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          col("__b") === expr(
            s"CAST(greatest($lLo, $rLo) AS BIGINT) div $bucketWidth"))
      .drop("__b", "__rb")
  }

  /** Per-key INTERVAL UNION: merge overlapping-or-touching [start, end)
    * spans into maximal disjoint spans — the coverage question behind
    * "total active time", SLA uptime stitching and validity-window
    * normalization that q64's point-gap islands can't answer (intervals
    * can swallow LATER-STARTING but earlier-ending ones; a lag-based gap
    * test misses that). A span is new iff its start clears the running
    * max of all previous ends (the standard sweep), so one ordered
    * window pass per key; ties on start break by end. Emits one row per
    * merged span with its source count.
    */
  def intervalUnion(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      weightCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__s"), col("__e"))
    val prevMax = max(col("__e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    // n_merged counts source intervals — or sums a carried weight, so
    // already-merged spans (incremental maintenance) recompose their
    // underlying counts exactly
    val weight = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.select(col(keyCol), col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"), weight.as("__w"))
      .withColumn("__new",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__span"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"),
        sum(col("__w")).as("n_merged"))
      .select(col(keyCol), col("span_start"), col("span_end"),
        col("n_merged"))
  }

  /** SPEARMAN rank correlation with tie-averaged ranks — the monotone-
    * association measure where Pearson (q83) assumes linearity: each
    * variable ranks over its own VALUE DOMAIN (the q319 shape, twice),
    * doubled ranks stay integral, and ρ is Pearson over the doubled
    * ranks (the 2× scale cancels) with every sum exact in
    * DECIMAL(38,0) and one pinned-order double finish.
    *
    * Scale assumption: the rank frames (and the unpartitioned cumulative
    * window inside them) are sized by each column's DISTINCT-VALUE
    * domain. For coded/bucketed columns that is small and the rank joins
    * broadcast; for a continuous double column the domain approaches the
    * row count — AQE picks the join strategy (no forced broadcast here,
    * so a corpus-sized domain degrades to a shuffle join instead of a
    * driver OOM), but the single-partition rank window still bounds this
    * to domains that fit one executor. Discretize first (q116) when the
    * value domain is corpus-sized.
    */
  def spearman(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def ranks2(c: String): DataFrame = {
      val byV = df.groupBy(col(c).cast("double").as("v"))
        .agg(count(lit(1)).as("t"))
      val cum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV.withColumn("cc", sum(col("t")).over(cum))
        .select(col("v"), (lit(2L) * col("cc") - col("t") + 1L).as("r2"))
    }
    val d38 = DecimalType(38, 0)
    val joined = df
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .join(ranks2(xCol).withColumnRenamed("r2", "rx"),
        col("x") === col("v")).drop("v")
      .join(ranks2(yCol).withColumnRenamed("r2", "ry"),
        col("y") === col("v")).drop("v")
    def dbl(c: Column): Column = c.cast("double")
    val a = joined.agg(count(lit(1)).as("n"),
      sum(col("rx").cast(d38)).as("sx"), sum(col("ry").cast(d38)).as("sy"),
      sum(col("rx").cast(d38) * col("rx").cast(d38)).as("sxx"),
      sum(col("ry").cast(d38) * col("ry").cast(d38)).as("syy"),
      sum(col("rx").cast(d38) * col("ry").cast(d38)).as("sxy"))
    a.select(col("n"),
      round((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
        (sqrt(dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
          sqrt(dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))),
        6).as("rho"))
  }

  /** CLAMPED RUNNING BALANCE per key: h_t = min(cap, max(0, h_{t−1} + Δ_t))
    * — the inventory/credit-balance fold NO window function can express
    * (the clamp makes each step depend on the clamped previous value, not
    * the raw prefix sum; a plain cumsum resurrects stock that was never
    * there). The whole per-key series folds in ONE codegen'd HOF
    * aggregate over the sorted deltas (the q353 pattern) counting floor
    * and ceiling hits as it goes — the stock-out / overflow audit. Pure
    * integer arithmetic, replayed exactly by a recursive CTE.
    *
    * Per-key series must fit one row (the documented LTTB/Holt bound);
    * order ties on `orderCol` are broken by the delta value for
    * determinism — pass a unique ordering column.
    */
  def clampedBalance(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      deltaCol: String,
      cap: Long): DataFrame = {
    require(cap > 0, "cap must be positive")
    val folded = aggregate(
      col("__s"),
      struct(lit(0L).as("h"), lit(0L).as("lo"), lit(0L).as("hi")),
      (acc, e) => {
        val raw = acc.getField("h") + e.getField("__d")
        val h = least(lit(cap), greatest(lit(0L), raw))
        struct(h.as("h"),
          (acc.getField("lo") + when(raw < 0L, 1L).otherwise(0L)).as("lo"),
          (acc.getField("hi") + when(raw > cap, 1L).otherwise(0L)).as("hi"))
      })
    df.select(col(keyCol), col(orderCol).cast("long").as("__o"),
        col(deltaCol).cast("long").as("__d"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_moves"),
        sort_array(collect_list(struct(col("__o"), col("__d")))).as("__s"))
      .select(col(keyCol), col("n_moves"),
        folded.getField("h").as("on_hand"),
        folded.getField("lo").as("n_shortages"),
        folded.getField("hi").as("n_overflows"))
  }

  /** EXACT-CENTS PRORATION with largest-remainder reconciliation: split
    * each group's integer `totalCol` across its lines proportionally to
    * integer `weightCol`, floor the shares, then hand the leftover cents
    * to the largest fractional remainders (ties → lowest line id) so the
    * allocations SUM EXACTLY to the total per group — the invoice /
    * revenue-share requirement a double multiply silently violates.
    * Remainders compare as exact integers (total·w mod W), two per-group
    * windows, zero floating point anywhere.
    */
  def prorateCents(
      df: DataFrame,
      groupCol: String,
      lineCol: String,
      weightCol: String,
      totalCol: String): DataFrame = {
    val w = Window.partitionBy(col("__g"))
    val base = df.select(col(groupCol).as("__g"), col(lineCol).as("__l"),
        col(weightCol).cast("long").as("__w"),
        col(totalCol).cast("long").as("__t"))
      // "__tw", not "__W": withColumn resolves case-INsensitively, so a
      // column named __W would silently REPLACE __w (hit in round 8)
      .withColumn("__tw", sum(col("__w")).over(w))
      .filter(col("__tw") > 0)
    // long arithmetic throughout: total·weight must fit a signed long
    // (10^7-cent totals × 10^7-cent weights leave 4 orders of headroom);
    // `div` is integer division, pmod the exact remainder
    val ranked = base
      .withColumn("__num", col("__t") * col("__w"))
      .withColumn("__fs", expr("__num div __tw"))
      .withColumn("__rem", pmod(col("__num"), col("__tw")))
      .withColumn("__left", (col("__t") -
        sum(col("__fs")).over(w)).cast("long"))
      .withColumn("__rk", row_number().over(
        w.orderBy(col("__rem").desc, col("__l"), col("__w"))))
    ranked.select(col("__g").as(groupCol), col("__l").as(lineCol),
        col("__w").as(weightCol),
        (col("__fs") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** MAX-MIN FAIR allocation (WATER-FILLING) of an integer per-group
    * capacity across integer line demands — the fairness-first quota
    * [[prorateCents]]' proportional split can't express: small demands
    * are satisfied IN FULL, the remainder splits evenly among the big
    * ones (bandwidth quotas, inventory rationing, budget caps). The
    * water level needs no iteration: with lines sorted by demand, line k
    * is saturated iff d_k·(n−k+1) ≤ C − prefix_{k−1} (exact integer
    * compare — the predicate is monotone along the sort, so the
    * saturated set is a prefix), and the unsaturated lines split
    * C − Σsat as floor + largest-remainder (+1 to the lowest line ids) —
    * so allocations are integers summing EXACTLY to min(C, Σd). Two
    * per-group window passes, zero floating point; an unsaturated line
    * always has d ≥ L+1, so the +1 never overshoots a demand.
    */
  def waterfill(
      df: DataFrame,
      groupCol: String,
      lineCol: String,
      demandCol: String,
      capCol: String): DataFrame = {
    val w = Window.partitionBy(col("__g"))
    val wOrd = w.orderBy(col("__d"), col("__l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base0 = df.select(col(groupCol).as("__g"), col(lineCol).as("__l"),
      col(demandCol).cast("long").as("__d"),
      col(capCol).cast("long").as("__cap"))
    // a negative capacity would silently emit negative allocations from
    // the level division — refuse loudly (the ffdPlan/theilIndex posture)
    require(base0.filter(col("__cap") < 0L || col("__d") < 0L).isEmpty,
      "waterfill: capacities and demands must be non-negative")
    val ranked = base0
      .withColumn("__rn", row_number().over(w.orderBy(col("__d"), col("__l"))))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__pre", sum(col("__d")).over(wOrd))
      .withColumn("__sat", col("__d") * (col("__n") - col("__rn") + 1L) <=
        col("__cap") - (col("__pre") - col("__d")))
    val leveled = ranked
      .withColumn("__ns", sum(when(col("__sat"), 1L).otherwise(0L)).over(w))
      .withColumn("__ss", sum(when(col("__sat"), col("__d")).otherwise(0L))
        .over(w))
      .withColumn("__m", col("__n") - col("__ns"))
      .withColumn("__lvl", when(col("__m") > 0L,
        expr("(__cap - __ss) div __m")))
      .withColumn("__left", when(col("__m") > 0L,
        pmod(col("__cap") - col("__ss"), col("__m"))))
      .withColumn("__rnu", row_number().over(
        Window.partitionBy(col("__g"), col("__sat")).orderBy(col("__l"))))
    leveled.select(col("__g").as(groupCol), col("__l").as(lineCol),
      col("__d").as(demandCol),
      when(col("__sat"), col("__d"))
        .otherwise(col("__lvl") +
          when(col("__rnu") <= col("__left"), 1L).otherwise(0L))
        .as("alloc"))
  }

  /** EXACT TRIMMED MEAN per group — the robust location estimate that
    * DROPS the top and bottom `trimBp` basis points before averaging
    * (q204's winsorize CLAMPS; trimming discards, the textbook robust
    * mean). No per-row sort: values collapse to the per-group VALUE
    * DOMAIN, the cumulative window walks that domain-sized frame, and
    * each tie group contributes v · overlap where overlap is the exact
    * integer intersection of the group's rank interval (c−t, c] with
    * the kept band (l, n−l] — so ties straddling the trim boundary are
    * apportioned EXACTLY, the case rank-filter formulations get wrong.
    * Integer cents in, one double division out.
    */
  def trimmedMean(
      df: DataFrame,
      groupCol: String,
      vCentsCol: String,
      trimBp: Int): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000, "trim each side must be < 50%")
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val byVG = df
      .groupBy(col(groupCol).as("g"), col(vCentsCol).cast("long").as("v"))
      .agg(count(lit(1)).as("t"))
    val wg = Window.partitionBy(col("g"))
    val cum = wg.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVG
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(wg))
      .withColumn("l", expr(s"(n * $trimBp) div 10000"))
      .withColumn("keep",
        greatest(lit(0L), least(col("c"), col("n") - col("l")) -
          greatest(col("c") - col("t"), col("l"))))
    ranked.groupBy(col("g"))
      .agg(max(col("n")).as("n"), max(col("l")).as("n_trimmed_each"),
        sum(col("v").cast(d38) * col("keep").cast(d38)).as("__ts"),
        sum(col("v").cast(d38) * col("t").cast(d38)).as("__rs"))
      .select(col("g"), col("n"), col("n_trimmed_each"),
        round(dbl(col("__ts")) /
          (dbl(col("n")) - lit(2.0) * dbl(col("n_trimmed_each"))), 6)
          .as("trimmed_mean"),
        round(dbl(col("__rs")) / dbl(col("n")), 6).as("raw_mean"))
  }

  /** DISTRIBUTION-FREE MEDIAN with its order-statistic CONFIDENCE
    * INTERVAL per group — the answer to "is this median real or noise"
    * without any normality assumption: the CI is the pair of order
    * statistics at ranks ⌊(n − z√n)/2⌋ and 1 + ⌈(n + z√n)/2⌉ (z = 1.96,
    * the binomial normal approximation; clamped to [1, n]), a textbook
    * nonparametric interval. Ranks resolve to values on the VALUE
    * DOMAIN (min value whose cumulative count reaches the rank — the
    * q124 discrete-rank discipline, no per-row sort); the only doubles
    * are the √n rank arithmetic, pinned identically in the oracle.
    */
  def medianCI(
      df: DataFrame,
      groupCol: String,
      vCentsCol: String): DataFrame = {
    val byVG = df
      .groupBy(col(groupCol).as("g"), col(vCentsCol).cast("long").as("v"))
      .agg(count(lit(1)).as("t"))
    val wg = Window.partitionBy(col("g"))
    val cum = wg.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byVG
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(wg))
      .withColumn("rmed", expr("(n + 1) div 2"))
      .withColumn("rlo", greatest(lit(1L),
        floor((col("n").cast("double") -
          lit(1.959964) * sqrt(col("n").cast("double"))) / 2.0)
          .cast("long")))
      .withColumn("rhi", least(col("n"),
        lit(1L) + ceil((col("n").cast("double") +
          lit(1.959964) * sqrt(col("n").cast("double"))) / 2.0)
          .cast("long")))
    def at(rank: Column): Column = min(when(col("c") >= rank, col("v")))
    ranked.groupBy(col("g"))
      .agg(max(col("n")).as("n"), at(col("rmed")).as("median"),
        at(col("rlo")).as("ci_lo"), at(col("rhi")).as("ci_hi"))
  }

  /** GCRA RATE-LIMIT AUDIT (the token-bucket / leaky-bucket algorithm in
    * its integer form): replay each key's event stream against a limiter
    * of one permit per `emissionSec` with `burst` extra tolerance, and
    * report how many events WOULD have been allowed vs rejected — the
    * capacity-planning question ("what hit rate would this limit cause")
    * answered offline before any limiter ships. GCRA state is one
    * integer: the theoretical arrival time TAT; an event at t is allowed
    * iff t ≥ TAT − burst·T, and then TAT ← max(TAT, t) + T (rejections
    * leave TAT untouched, so `burst`+1 instantaneous events pass, then
    * one per T). Inherently sequential per key → one HOF fold over the
    * collected per-key series (the documented per-key bound), ALL
    * integer seconds — the oracle's recursive CTE replays it exactly.
    */
  def rateLimitAudit(
      df: DataFrame,
      keyCol: String,
      tSecCol: String,
      idCol: String,
      emissionSec: Long,
      burst: Int): DataFrame = {
    require(emissionSec > 0 && burst >= 0)
    val tau = burst * emissionSec
    val folded = aggregate(
      expr("slice(__s, 2, greatest(size(__s) - 1, 0))"),
      struct((element_at(col("__s"), 1).getField("__t") + lit(emissionSec))
        .as("tat"), lit(1L).as("ok")),
      (acc, e) => {
        val t = e.getField("__t")
        val allowed = t >= acc.getField("tat") - lit(tau)
        struct(
          when(allowed, greatest(acc.getField("tat"), t) + lit(emissionSec))
            .otherwise(acc.getField("tat")).as("tat"),
          (acc.getField("ok") + when(allowed, 1L).otherwise(0L)).as("ok"))
      })
    df.select(col(keyCol), col(tSecCol).cast("long").as("__t"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("__t"), col("__id")))).as("__s"))
      .select(col(keyCol), col("n_events"),
        folded.getField("ok").as("n_allowed"),
        (col("n_events") - folded.getField("ok")).as("n_rejected"))
  }

  /** VALIDITY-WINDOW AUDIT for SCD-style [from, to) interval tables —
    * the pre-trust check on a dimension someone ELSE maintains: per key,
    * how many intervals OVERLAP a predecessor (two versions
    * simultaneously "current" — joins fan out) and how many leave a GAP
    * (as-of lookups silently miss). Classification is against the
    * RUNNING MAX of previous ends (the q334 sweep rule — a long interval
    * can swallow a later-starting, earlier-ending one; comparing only
    * the adjacent predecessor would miss that overlap). Intervals are
    * integer bucket ids by contract; one ordered window pass per key,
    * counts per key, zero floating point. First interval of a key is
    * neither gap nor overlap; abutting intervals (from = prev end) are
    * clean.
    */
  def validityAudit(
      df: DataFrame,
      keyCol: String,
      fromCol: String,
      toCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val base = df.select(col(keyCol) +: (Seq(fromCol, toCol) ++ tieCols)
      .map(c => col(c).cast("long").as(c)): _*)
    val order = (Seq(fromCol, toCol) ++ tieCols).map(col)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("__pe", max(col(toCol)).over(wPrev))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col(fromCol) < col("__pe"), 1L).otherwise(0L))
          .as("n_overlaps"),
        sum(when(col(fromCol) > col("__pe"), 1L).otherwise(0L))
          .as("n_gaps"),
        sum(when(col(toCol) <= col(fromCol), 1L).otherwise(0L))
          .as("n_empty"))
      .withColumn("clean",
        col("n_overlaps") + col("n_gaps") + col("n_empty") === 0L)
  }

  /** KENDALL τ-b between two DISCRETE columns — the rank-correlation
    * completing [[spearman]]: concordant-minus-discordant pair counts
    * with BOTH tie corrections, exact to the last pair. Everything runs
    * on the (x, y) CELL CENSUS: concordance is a census self-join
    * (domain² cells, fine for the bucketed/categorical domains τ-b is
    * for — quantities, grades, priorities; NOT continuous doubles),
    * pair counts accumulate in DECIMAL(38,0) (c·S products are O(n²)
    * and overflow long at petabyte row counts), and the single final
    * τ-b division is the only double. Returns one row:
    * (n, concordant, discordant, tau_b).
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val census = df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // probed four ways below
    val other = census.select(col("x").as("x2"), col("y").as("y2"),
      col("c").as("c2"))
    val pairs = census.join(other,
        col("x2") > col("x") && col("y2") =!= col("y"))
      .groupBy(col("x"), col("y"), col("c"))
      .agg(
        sum(when(col("y2") > col("y"), col("c2")).otherwise(0L)).as("gt"),
        sum(when(col("y2") < col("y"), col("c2")).otherwise(0L)).as("lt"))
      .agg(
        sum((col("c").cast(d38) * col("gt").cast(d38))).as("cc"),
        sum((col("c").cast(d38) * col("lt").cast(d38))).as("dd"))
    val margins = census.agg(sum(col("c")).cast(d38).as("n"))
    val tx = census.groupBy(col("x")).agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)).as("tx2"))
    val ty = census.groupBy(col("y")).agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)).as("ty2"))
    // n0/n1/n2 carried DOUBLED (t(t-1), not t(t-1)/2) — the /2 cancels
    pairs.crossJoin(broadcast(margins)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("n").cast("long").as("n"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        round((dbl(col("cc")) - dbl(col("dd"))) /
          sqrt((dbl(col("n")) * (dbl(col("n")) - 1.0) - dbl(col("tx2"))) /
            2.0 * ((dbl(col("n")) * (dbl(col("n")) - 1.0) - dbl(col("ty2"))) /
            2.0)), 6).as("tau_b"))
  }

  /** CRAMÉR'S V — the normalized-χ² association strength for two
    * CATEGORICAL columns, completing the q256 mutual-information pair:
    * MI says how many bits, V says how far from independence on [0, 1].
    * χ² terms run cross-multiplied on exact integers,
    * (o·n − r·c)²/(n·r·c), each landing once on the 1e-9 grid before
    * the order-independent DECIMAL sum; V = √(χ²/(n·min(R−1, C−1))).
    * One contingency census; everything after is R·C rows.
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val tot = Window.partitionBy()
    val census = df.select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // spine + probe reuse
    // FULL R×C spine: an EMPTY cell still owes its e = r·c/n to χ²
    // (census-only terms silently understate dependence)
    val spine = census.select(col("x")).distinct()
      .crossJoin(census.select(col("y")).distinct())
    val t = spine.join(census, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("n", sum(col("o")).over(tot))
      .withColumn("rx", sum(col("o")).over(Window.partitionBy(col("x"))))
      .withColumn("cy", sum(col("o")).over(Window.partitionBy(col("y"))))
      .withColumn("nx", size(collect_set(col("x")).over(tot)).cast("long"))
      .withColumn("ny", size(collect_set(col("y")).over(tot)).cast("long"))
    val diff = col("o").cast(d38) * col("n").cast(d38) -
      col("rx").cast(d38) * col("cy").cast(d38)
    val term = round(dbl(diff) * dbl(diff) /
      (dbl(col("n")) * dbl(col("rx")) * dbl(col("cy"))), 9)
      .cast(DecimalType(18, 9))
    val chi2 = dbl(sum(term).over(tot))
    t.select(col("x"), col("y"), col("o"), col("rx"), col("cy"),
      round(chi2, 6).as("chi2"),
      round(sqrt(chi2 / (dbl(col("n")) *
        dbl(least(col("nx"), col("ny")) - 1))), 6).as("cramers_v"))
  }

  /** L-MOMENTS (λ₁, λ₂, L-CV) per group — the ORDER-STATISTIC moment
    * family: λ₂ = E|X₁−X₂|/2 is a dispersion measure that exists (and
    * stays stable) for heavy-tailed data where the classical variance
    * explodes, and L-CV = λ₂/λ₁ is the robust coefficient of variation
    * hydrology/insurance quote. The unbiased estimator
    * λ̂₂ = Σ x₍ᵢ₎(2i − n − 1) / (n(n−1)) rewrites over the value census
    * with DOUBLED tie ranks: Σ over a tie block of (2i−n−1) is exactly
    * t·r2 − t(n+1) (r2 = 2c−t+1), so the numerator is a pure integer in
    * DECIMAL(38,0) — ties exact by construction; λ₁/λ₂/L-CV are single
    * pinned divisions. Census-domain shuffles only; values integer
    * cents by contract.
    */
  def lMoments(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val census = df.groupBy(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("t"))
    val cum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(Window.partitionBy(col("g"))))
      .withColumn("r2", lit(2L) * col("c") - col("t") + 1L)
    val agg = ranked.groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        sum(col("v").cast(d38) * col("t").cast(d38)).as("s"),
        sum(col("v").cast(d38) *
          (col("t").cast(d38) * col("r2").cast(d38) -
            col("t").cast(d38) * (col("n") + 1L).cast(d38))).as("n2"))
      .filter(col("n") >= 2L)
    val n = dbl(col("n"))
    val l1 = dbl(col("s")) / n
    val l2 = dbl(col("n2")) / (n * (n - 1.0))
    agg.select(col("g"), col("n"),
      round(l1, 6).as("l1"),
      round(l2, 6).as("l2"),
      round(when(l1 =!= lit(0.0), l2 / l1), 6).as("l_cv"))
  }

  /** EXACT SKEWNESS / EXCESS KURTOSIS per group — the shape moments the
    * q83 mean/stddev/corr family stops short of: Fisher g1 = m3/m2^1.5
    * flags asymmetry (revenue tails, latency pile-ups) and excess
    * g2 = m4/m2² − 3 flags tail weight, the two numbers that decide
    * whether a mean±stddev summary is even meaningful for a column.
    *
    * Raw power sums Σv..Σv⁴ accumulate as EXACT DECIMAL(38,0) integers
    * over the integer value domain (cents⁴ · rows must fit 38 digits —
    * stated contract, same class as q470's c·n products), so the sums
    * are order-independent; the central-moment conversion and both
    * ratios are ONE pinned double expression (g1 uses m2·√m2, never
    * pow(x,1.5) — pow's libm varies across engines, multiply+sqrt are
    * IEEE-exact). Degenerate groups (m2 = 0) yield NULL shape stats.
    */
  def skewKurtosis(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val v = col(valueCol).cast(d38)
    val agg = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
      .filter(col("n") >= 2L)
    val n = dbl(col("n"))
    val mean = dbl(col("s1")) / n
    val m2 = dbl(col("s2")) / n - mean * mean
    val m3 = dbl(col("s3")) / n - lit(3.0) * mean * (dbl(col("s2")) / n) +
      lit(2.0) * mean * mean * mean
    val m4 = dbl(col("s4")) / n - lit(4.0) * mean * (dbl(col("s3")) / n) +
      lit(6.0) * mean * mean * (dbl(col("s2")) / n) -
      lit(3.0) * mean * mean * mean * mean
    agg.select(col("g"), col("n"),
      round(mean, 6).as("mean"),
      round(when(m2 > 0.0, m3 / (m2 * sqrt(m2))), 6).as("skew_g1"),
      round(when(m2 > 0.0, m4 / (m2 * m2) - lit(3.0)), 6).as("kurt_g2"))
  }

  /** JARQUE–BERA normality VERDICT per group — the χ²(2) statistic
    * JB = n/6·(g1² + g2²/4) over [[skewKurtosis]]'s exact power sums:
    * q476 describes the shape, this says whether the shape is
    * statistically incompatible with normal (the gate before any
    * ±k·σ rule or t-interval is trusted on the column). Same exact
    * DECIMAL(38,0) power-sum contract (cents⁴·rows within 38 digits);
    * the moments and the one statistic are O(1) doubles per group;
    * zero-variance groups read NULL.
    */
  def jarqueBera(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val v = col(valueCol).cast(d38)
    val agg = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"),
        sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
      .filter(col("n") >= 4L)
    val n = dbl(col("n"))
    val mean = dbl(col("s1")) / n
    val m2 = dbl(col("s2")) / n - mean * mean
    val m3 = dbl(col("s3")) / n - lit(3.0) * mean * (dbl(col("s2")) / n) +
      lit(2.0) * mean * mean * mean
    val m4 = dbl(col("s4")) / n - lit(4.0) * mean * (dbl(col("s3")) / n) +
      lit(6.0) * mean * mean * (dbl(col("s2")) / n) -
      lit(3.0) * mean * mean * mean * mean
    val g1 = m3 / (m2 * sqrt(m2))
    val g2 = m4 / (m2 * m2) - lit(3.0)
    agg.select(col("g"), col("n"),
      round(when(m2 > 0.0, g1), 6).as("skew_g1"),
      round(when(m2 > 0.0, g2), 6).as("kurt_g2"),
      round(when(m2 > 0.0,
        n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)), 6).as("jarque_bera"))
  }

  /** TWO-SAMPLE ANDERSON–DARLING (discrete/bucketed-census form) — the
    * TAIL-WEIGHTED member of the two-sample family: KS (q385) reads one
    * supremum, CvM (q470) integrates squared CDF gaps uniformly, AD
    * re-weights the same gaps by 1/(F(1−F)), so divergence out in the
    * tails — exactly where risk and quality regressions hide — counts
    * hardest.
    *
    *   A² = Σ_v≠last t_v·(c_a·n_b − c_b·n_a)² / (c_v·(N−c_v)) / (n_a·n_b)
    *
    * over the pooled value census (the q470 numerator, per-block tail
    * weight; c = N blocks excluded — zero denominator, zero gap). Each
    * term's numerator is an exact DECIMAL(38,0) integer; the per-term
    * division is pinned, rounded to the 1e-9 grid and DECIMAL-summed
    * (order-independent), one final pinned division by n_a·n_b.
    */
  def andersonDarling(
      df: DataFrame,
      valueCol: String,
      sampleACol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    val d289 = DecimalType(28, 9)
    def dbl(c: Column): Column = c.cast("double")
    val census = df.select(col(valueCol).cast("long").as("v"),
        when(sampleACol, 1L).otherwise(0L).as("ia"))
      .groupBy(col("v"))
      .agg(sum(col("ia")).as("ta"), sum(lit(1L) - col("ia")).as("tb"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val ranked = census
      .withColumn("ca", sum(col("ta")).over(cum))
      .withColumn("cb", sum(col("tb")).over(cum))
      .withColumn("na", sum(col("ta")).over(tot))
      .withColumn("nb", sum(col("tb")).over(tot))
      .withColumn("c", col("ca") + col("cb"))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("d", col("ca").cast(d38) * col("nb").cast(d38) -
        col("cb").cast(d38) * col("na").cast(d38))
    val term = round(
      dbl(col("ta") + col("tb")) * dbl(col("d") * col("d")) /
        (dbl(col("c")) * dbl(col("nn") - col("c"))), 9).cast(d289)
    val agg = ranked.filter(col("c") < col("nn"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(term).as("u"))
    agg.select(col("n_a"), col("n_b"),
      round(when(col("n_a") > 0L && col("n_b") > 0L,
        dbl(col("u")) / (dbl(col("n_a")) * dbl(col("n_b")))), 6)
        .as("ad_a2"))
  }

  /** TWO-SAMPLE CRAMÉR–VON MISES — the INTEGRATED-CDF-difference test
    * completing the two-sample family: q385's KS reads the supremum
    * (one worst point), q393's energy distance the pairwise means; CvM
    * integrates (F_a − F_b)² over the pooled sample, so many small
    * shelf-wide differences that never produce one big KS gap still
    * register.
    *
    *   T = Σ_v (t_a+t_b)·(c_a·n_b − c_b·n_a)² / (n_a·n_b·N²)
    *
    * over the pooled value census — cross-multiplied so every
    * accumulated quantity is an exact integer in DECIMAL(38,0)
    * (bucketed/cents census contract: c·n products must fit 38 digits),
    * one pinned final division. Census-domain shuffles only.
    */
  def cramerVonMises(
      df: DataFrame,
      valueCol: String,
      sampleACol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val census = df.select(col(valueCol).cast("long").as("v"),
        when(sampleACol, 1L).otherwise(0L).as("ia"))
      .groupBy(col("v"))
      .agg(sum(col("ia")).as("ta"),
        sum(lit(1L) - col("ia")).as("tb"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val ranked = census
      .withColumn("ca", sum(col("ta")).over(cum))
      .withColumn("cb", sum(col("tb")).over(cum))
      .withColumn("na", sum(col("ta")).over(tot))
      .withColumn("nb", sum(col("tb")).over(tot))
      .withColumn("d", col("ca").cast(d38) * col("nb").cast(d38) -
        col("cb").cast(d38) * col("na").cast(d38))
    val agg = ranked.agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      sum((col("ta") + col("tb")).cast(d38) * col("d") * col("d"))
        .as("u"))
    val nn = dbl(col("n_a") + col("n_b"))
    val t = dbl(col("u")) /
      (dbl(col("n_a")) * dbl(col("n_b")) * nn * nn)
    agg.select(col("n_a"), col("n_b"),
      round(when(col("n_a") > 0L && col("n_b") > 0L, t), 6).as("cvm_t"))
  }

  /** RBO weights (1−p)·p^(d−1) for p = 0.9, depths 1..10 — EXACT decimal
    * expansions of powers of 0.9, pinned as the same literals on both
    * engines (the q431 DcgW posture).
    */
  val RboW09: Seq[Double] = Seq(0.1, 0.09, 0.081, 0.0729, 0.06561,
    0.059049, 0.0531441, 0.04782969, 0.043046721, 0.0387420489)

  /** RANK-BIASED OVERLAP (Webber et al. 2010, truncated at depth k) —
    * "did my top-k CHANGE": the ranking-drift number between two top-k
    * lists that overlap-at-k alone misreads (RBO weights agreement at
    * the TOP, where dashboard eyes live).
    *
    *   RBO@k = Σ_{d=1..k} (1−p)·p^(d−1) · |A_d ∩ B_d| / d
    *
    * An item sits in both depth-d prefixes iff max(rank_A, rank_B) ≤ d,
    * so one full-outer join + a max-rank census gives every X_d; the
    * weights are pinned literals ([[RboW09]]), per-depth terms land on
    * the 1e-9 grid and decimal-sum. Everything after the two rank
    * windows is k-sized. Callers supply the two ranked lists
    * (item, rank 1..k).
    */
  def rankBiasedOverlap(
      a: DataFrame,
      b: DataFrame,
      itemCol: String,
      rankCol: String,
      k: Int,
      weights: Seq[Double] = RboW09): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(k >= 1 && k <= weights.size,
      s"need 1 <= k <= ${weights.size} pinned weights")
    val d189 = DecimalType(18, 9)
    def dbl(c: Column): Column = c.cast("double")
    val wArr = array(weights.map(lit): _*)
    val j = a.select(col(itemCol).as("item"), col(rankCol).as("ra"))
      .join(b.select(col(itemCol).as("item"), col(rankCol).as("rb")),
        Seq("item"), "full")
      .select(greatest(coalesce(col("ra"), lit(k + 1L)),
        coalesce(col("rb"), lit(k + 1L))).cast("long").as("m"))
      .filter(col("m") <= k)
    val spine = a.sparkSession.range(1, k + 1)
      .select(col("id").cast("long").as("d"))
    val xd = broadcast(spine).join(j, col("m") <= col("d"), "left")
      .groupBy(col("d"))
      .agg(sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("x"))
    val terms = xd.withColumn("term",
      round(element_at(wArr, col("d").cast("int")) * dbl(col("x")) /
        dbl(col("d")), 9).cast(d189))
    terms.agg(lit(k.toLong).as("k"),
      max(when(col("d") === k.toLong, col("x"))).as("overlap_at_k"),
      round(dbl(sum(col("term"))), 6).as("rbo"))
  }

  /** CORRELATION MATRIX — all-pairs Pearson between k entity-level
    * metrics ("which of my features move together"), the numeric
    * companion to the q453 balance table and the many-pairs
    * generalization of q83's single corr. Metrics are melted once and
    * pair rows form by an ENTITY-keyed self-join (k²/2 pairs per
    * entity — k small by contract, stated), then each pair's moments
    * accumulate exactly in DECIMAL(38,0) with one pinned-double r.
    * NULL r on zero-variance sides.
    */
  def corrMatrix(
      df: DataFrame,
      idCol: String,
      metrics: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(metrics.size >= 2)
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val melted = metrics.map { m =>
      df.select(col(idCol).as("id"), lit(m).as("m"),
        col(m).cast("long").as("v"))
    }.reduce(_.unionByName(_))
    val pairs = melted.select(col("id"), col("m").as("ma"),
        col("v").as("x"))
      .join(melted.select(col("id"), col("m").as("mb"), col("v").as("y")),
        Seq("id"))
      .filter(col("ma") < col("mb"))
    val agg = pairs.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"),
        sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
        sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"))
    val num = dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val den = sqrt(dbl(col("n")) * dbl(col("sxx")) -
        dbl(col("sx")) * dbl(col("sx"))) *
      sqrt(dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))
    agg.select(col("ma"), col("mb"), col("n"),
      round(when(den =!= lit(0.0), num / den), 6).as("r"))
  }

  /** CONCENTRATION REPORT per group — Gini coefficient, Herfindahl–
    * Hirschman index, and the top-4 concentration ratio over each
    * group's member values: "how skewed is spend/volume across members"
    * — the inequality census beside q411's Theil decomposition (Theil
    * splits between/within; Gini/HHI/CR4 are the figures a regulator or
    * capacity planner quotes).
    *
    * All three from ONE member frame: Gini's Σ rank·x term uses doubled
    * average ranks off the per-group value census (t·r2·x = 2·Σ i·x_(i)
    * exactly, ties correct by construction), so
    * G = (Σ t·r2·x − (n+1)·S) / (n·S) is pure integers to one pinned
    * division; HHI = Σx²/S² and CR4's top-4 sum are exact
    * integers/windows. Members must be non-negative; group-partitioned
    * windows only.
    */
  def concentration(
      members: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val base = members.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("x"))
    val census = base.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
    val cum = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("r2", lit(2L) * col("c") - col("t") + 1L)
    val cr = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("x").desc)))
      .filter(col("rn") <= 4)
      .groupBy(col("g"))
      .agg(sum(col("x").cast(d38)).as("top4"))
    val agg = ranked.groupBy(col("g"))
      .agg(sum(col("t")).as("n"),
        sum(col("x").cast(d38) * col("t").cast(d38)).as("s"),
        sum(col("x").cast(d38) * col("x").cast(d38) * col("t").cast(d38))
          .as("sxx"),
        sum(col("t").cast(d38) * col("r2").cast(d38) * col("x").cast(d38))
          .as("rx"))
    agg.join(cr, Seq("g"), "left")
      .select(col("g"), col("n"),
        col("s").cast("long").as("total"),
        round(when(col("s") =!= lit(0).cast(d38),
          (dbl(col("rx")) - (dbl(col("n")) + 1.0) * dbl(col("s"))) /
            (dbl(col("n")) * dbl(col("s")))), 6).as("gini"),
        round(when(col("s") =!= lit(0).cast(d38),
          dbl(col("sxx")) / (dbl(col("s")) * dbl(col("s")))), 6).as("hhi"),
        round(when(col("s") =!= lit(0).cast(d38),
          dbl(coalesce(col("top4"), lit(0).cast(d38))) / dbl(col("s"))), 6)
          .as("cr4"))
  }

  /** CURVE KNEE detection — the Kneedle-style elbow of an increasing
    * concave curve: the point maximizing the distance to the chord
    * between the endpoints — "how many top customers before diminishing
    * returns", "which k stops paying" — the cut every ABC/topN policy
    * (q339) eyeballs, made deterministic. The perpendicular-distance
    * argmax reduces to maximizing the CROSS PRODUCT |(yₙ−y₁)(x−x₁) −
    * (xₙ−x₁)(y−y₁)| — pure integers in DECIMAL(38,0) (the chord's
    * constant norm divides out of an argmax), so the knee is exact, no
    * doubles anywhere. Endpoints from one min/max_by pass; argmax one
    * max(struct) with the smaller x breaking ties.
    */
  def curveKnee(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val pts = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
      .localCheckpoint(true) // endpoints pass + argmax pass
    val ends = pts.agg(min(col("x")).as("x1"), min_by(col("y"), col("x")).as("y1"),
      max(col("x")).as("xn"), max_by(col("y"), col("x")).as("yn"))
    def d(c: Column): Column = c.cast(d38)
    val cross =
      (d(col("yn")) - d(col("y1"))) * (d(col("x")) - d(col("x1"))) -
        (d(col("xn")) - d(col("x1"))) * (d(col("y")) - d(col("y1")))
    pts.crossJoin(broadcast(ends))
      .withColumn("dist", abs(cross))
      .agg(max(struct(col("dist"), (-col("x")).as("nx"), col("x"),
        col("y"))).as("b"),
        min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
        count(lit(1)).as("n_points"))
      .select(col("n_points"), col("x_lo"), col("x_hi"),
        col("b.x").as("knee_x"), col("b.y").as("knee_y"),
        col("b.dist").cast("double").as("chord_cross"))
  }

  /** PARTIAL CORRELATION r_xy·z — does x still track y once the common
    * driver z is held fixed? The confounder screen q457's raw correlation
    * matrix can't answer (two metrics both scale with order size and
    * look correlated; partial out size and the "relationship" may
    * vanish). ONE aggregation computes all three pairwise moments
    * exactly in DECIMAL(38,0) (integer-cents contract); each pairwise r
    * is a pinned double rounded to the 1e-9 grid, and the partial
    * formula (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) runs over those
    * GRID values — so the output replays bit-for-bit however the input
    * was partitioned. NULL when either conditioning correlation is ±1
    * (denominator 0: z explains one variable completely).
    */
  def partialCorr(
      df: DataFrame,
      xCol: String,
      yCol: String,
      zCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    def m(c: String): Column = col(c).cast("long").cast(d38)
    def dbl(c: Column): Column = c.cast("double")
    val agg = df.agg(
      count(lit(1)).as("n"),
      sum(m(xCol)).as("sx"), sum(m(yCol)).as("sy"), sum(m(zCol)).as("sz"),
      sum(m(xCol) * m(xCol)).as("sxx"), sum(m(yCol) * m(yCol)).as("syy"),
      sum(m(zCol) * m(zCol)).as("szz"),
      sum(m(xCol) * m(yCol)).as("sxy"), sum(m(xCol) * m(zCol)).as("sxz"),
      sum(m(yCol) * m(zCol)).as("syz"))
    val nD = dbl(col("n"))
    def r(sab: String, sa: String, sb: String, saa: String, sbb: String): Column =
      round((nD * dbl(col(sab)) - dbl(col(sa)) * dbl(col(sb))) /
        sqrt((nD * dbl(col(saa)) - dbl(col(sa)) * dbl(col(sa))) *
          (nD * dbl(col(sbb)) - dbl(col(sb)) * dbl(col(sb)))), 9)
    val staged = agg.select(col("n"),
      r("sxy", "sx", "sy", "sxx", "syy").as("r_xy"),
      r("sxz", "sx", "sz", "sxx", "szz").as("r_xz"),
      r("syz", "sy", "sz", "syy", "szz").as("r_yz"))
    val den = (lit(1.0) - col("r_xz") * col("r_xz")) *
      (lit(1.0) - col("r_yz") * col("r_yz"))
    staged.select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
      when(den > 0.0, round((col("r_xy") - col("r_xz") * col("r_yz")) /
        sqrt(den), 6)).as("r_xy_given_z"))
  }

  /** LIKELIHOOD-RATIO G-TEST for a contingency table — χ²'s
    * information-theoretic twin: G = 2·Σ O·ln(O/E) is additive across
    * nested partitions (sub-tables' G's SUM to the full table's —
    * the property that lets a drill-down reconcile exactly, which
    * Pearson χ² can't) and equals 2n·MI in nats, tying the verdict to
    * q256's mutual information on the same pair. Empty cells
    * contribute 0 (lim x·ln x = 0 — E>0 everywhere by construction).
    * One census; each occupied cell's term is ln over exact integer
    * cross-ratios pinned once at 1e-9 (the q256 discipline).
    */
  def gTest(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d289 = DecimalType(28, 9)
    def dbl(c: Column): Column = c.cast("double")
    val census = df.select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val t = census
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("x"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("nx",
        size(collect_set(col("x")).over(Window.partitionBy())).cast("long"))
      .withColumn("ny",
        size(collect_set(col("y")).over(Window.partitionBy())).cast("long"))
    // O·ln(O·n/(r·c)) on exact integers — E never materializes
    val term = round(dbl(col("o")) *
      log(dbl(col("o")) * dbl(col("n")) /
        (dbl(col("rt")) * dbl(col("ct")))), 9).cast(d289)
    t.groupBy(col("n"), col("nx"), col("ny"))
      .agg(sum(term).as("gs"))
      .select(col("n").cast("long").as("n"),
        ((col("nx") - 1L) * (col("ny") - 1L)).as("df"),
        round(lit(2.0) * dbl(col("gs")), 6).as("g_stat"),
        round(dbl(col("gs")) / dbl(col("n")), 6).as("mi_nats"))
  }

  /** HABERMAN ADJUSTED RESIDUALS — the WHICH-CELL drill-down behind a
    * significant contingency verdict: per cell, (O−E)/√(E(1−r/n)(1−c/n))
    * is asymptotically standard normal, so |adj| > 2 marks the cells
    * that actually carry the dependence (q128's total χ² and q425's V
    * say THAT the table deviates; this says WHERE). FULL R×C spine —
    * an empty cell with a large expectation is exactly the kind of
    * hole this exists to flag. One census, O(R·C) arithmetic after.
    */
  def adjustedResiduals(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val census = df.select(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val spine = census.select(col("x")).distinct()
      .crossJoin(census.select(col("y")).distinct())
    val t = spine.join(census, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("x"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = dbl(col("rt")) * dbl(col("ct")) / dbl(col("n"))
    val denom = e * (lit(1.0) - dbl(col("rt")) / dbl(col("n"))) *
      (lit(1.0) - dbl(col("ct")) / dbl(col("n")))
    val adj = (dbl(col("o")) - e) / sqrt(denom)
    t.select(col("x"), col("y"), col("o"), round(e, 6).as("expected"),
        when(e > 0.0, round((dbl(col("o")) - e) / sqrt(e), 6))
          .as("std_resid"),
        when(denom > 0.0, round(adj, 6)).as("adj_resid"),
        when(denom > 0.0, abs(adj) > 2.0).as("notable"))
      .orderBy(col("x"), col("y"))
  }

  /** LASPEYRES / PAASCHE / FISHER PRICE INDICES between two periods —
    * "how much did the basket's price level move, holding the mix
    * fixed": Laspeyres weights by BASE-period quantities (what the old
    * basket costs now), Paasche by CURRENT-period quantities, Fisher
    * is their geometric mean (the superlative index that bounds the
    * substitution bias both one-sided indices carry). Unit values
    * (Σcents/Σqty per item-period) stand in for prices — the standard
    * trade-data practice. Items must trade in BOTH periods (the
    * matched-sample convention; unmatched items are counted and
    * reported, not silently dropped). One (item, period) census; each
    * item's cross terms land once on the 1e-9 grid before
    * order-independent decimal sums; one O(1) ratio block at the end.
    */
  /** NEWSVENDOR ORDER QUANTITY per key — the inventory decision the
    * demand-model shelf feeds (q670's ZIP, q463's Croston, q464's SBC
    * classes DESCRIBE weekly demand; this prescribes the stock level):
    * q* = the smallest quantity whose empirical demand CDF reaches the
    * critical fractile cu/(cu+co) (underage cost vs overage cost — the
    * classic "how many papers to print" optimum), plus the expected
    * underage/overage/cost AT q* so the trade-off is auditable, not
    * just the argmin.
    *
    * Everything is census arithmetic: one (key, demand) count census,
    * demand-domain windows for the cumulative count and value prefix
    * sums, q* picked as the exact struct-min over threshold-passing
    * census rows, and the expectations from prefix/total sums — pure
    * integers until the final pinned divisions. The threshold compare
    * (cum ≥ r·n) is one double product of exact integers per census
    * row, identical in both engines. O(keys) rows out; no window ever
    * touches raw rows.
    */
  def newsvendor(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      underageCost: Double,
      overageCost: Double): DataFrame = {
    require(underageCost > 0.0 && overageCost > 0.0)
    val ratio = underageCost / (underageCost + overageCost)
    def dbl(c: Column): Column = c.cast("double")
    val cen = df.select(col(keyCol).as("k"),
        col(valueCol).cast("long").as("d"))
      .groupBy(col("k"), col("d")).agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("d"))
    val wAll = Window.partitionBy(col("k"))
    val cum = cen
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("cumv", sum(col("c") * col("d")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("totv", sum(col("c") * col("d")).over(wAll))
    val hit = cum.filter(dbl(col("cum")) >= lit(ratio) * dbl(col("n")))
      .groupBy(col("k"))
      .agg(min(struct(col("d"), col("cum"), col("cumv"), col("n"),
        col("totv"))).as("s"))
      .select(col("k"), col("s.d").as("q"), col("s.cum").as("cq"),
        col("s.cumv").as("vq"), col("s.n").as("n"),
        col("s.totv").as("totv"))
    val n = dbl(col("n"))
    val eu = (dbl(col("totv") - col("vq")) -
      dbl(col("q")) * dbl(col("n") - col("cq"))) / n
    val eo = (dbl(col("q")) * dbl(col("cq")) - dbl(col("vq"))) / n
    hit.select(col("k").as(keyCol), col("n"), col("q").as("q_star"),
        round(dbl(col("cq")) / n, 6).as("service_level"),
        round(eu, 6).as("exp_underage"),
        round(eo, 6).as("exp_overage"),
        round(lit(underageCost) * eu + lit(overageCost) * eo, 6)
          .as("exp_cost"))
      .orderBy(col(keyCol))
  }

  /** ERLANG-C STAFFING per key — the queueing PRESCRIPTION the arrival
    * shelf feeds (q14's hourly volumes, q636's concurrency sweep
    * DESCRIBE load; this answers "how many servers so a job rarely
    * waits"): offered load a = λ·s/3600 Erlangs from the hourly
    * census, then the smallest server count c whose Erlang-C wait
    * probability C(c, a) = c·B/(c − a(1−B)) meets the target, where
    * B = Erlang-B computed from the CLOSED FORM (aᵏ/k!)/Σ_{j≤c} aʲ/j!
    * — the textbook recurrence is a sequential fold, but the ratio
    * form is two PREFIX SUMS over the k-explode, so every candidate c
    * is priced in one window pass (k ≤ maxServers, a bounded explode
    * per key).
    *
    * Exactness: ln a pinned at 1e-9, ln k! per-integer 1e-12-pinned
    * decimals (the q574 discipline), each aᵏ/k! term exp-pinned at
    * 1e-12 and decimal-prefix-summed, the wait probability pinned at
    * 1e-9 BEFORE the threshold compare so both engines pick the same
    * c. Keys whose load is zero, or that no c ≤ maxServers can staff
    * (a ≥ c or wait above target throughout), read NULL c — the
    * "capacity bound too small" refusal, not a silent clamp.
    * O(keys) rows out.
    */
  def erlangStaffing(
      df: DataFrame,
      keyCol: String,
      hourlyCountCol: String,
      serviceTimeSec: Double,
      targetWait: Double,
      maxServers: Int = 40): DataFrame = {
    require(serviceTimeSec > 0.0 && targetWait > 0.0 && targetWait < 1.0 &&
      maxServers >= 1 && maxServers <= 200)
    def dbl(c: Column): Column = c.cast("double")
    val d2812 = DecimalType(28, 12)
    val load = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("hours"), sum(col(hourlyCountCol)).as("tot"))
      .select(col("k"), col("hours"),
        round(dbl(col("tot")) / dbl(col("hours")) *
          lit(serviceTimeSec / 3600.0), 9).as("a"))
    val wk = Window.partitionBy(col("k")).orderBy(col("kk"))
    val terms = load.filter(col("a") > 0.0)
      .select(col("k"), col("hours"), col("a"),
        explode(sequence(lit(0L), lit(maxServers.toLong))).as("kk"))
      .withColumn("lnk", when(col("kk") === 0L, lit(0.0))
        .otherwise(round(log(dbl(col("kk"))), 12)))
      .withColumn("lf",
        sum(col("lnk").cast(d2812)).over(wk).cast("double"))
      .withColumn("t",
        round(exp(dbl(col("kk")) * round(log(col("a")), 9) - col("lf")), 12)
          .cast(d2812))
      .withColumn("s", sum(col("t")).over(wk))
    val b = dbl(col("t")) / dbl(col("s"))
    val cD = dbl(col("kk"))
    val waitP = round(cD * b / (cD - col("a") * (lit(1.0) - b)), 9)
    val cand = terms.filter(col("kk") >= 1L && col("a") < cD)
      .select(col("k"), col("hours"), col("a"), col("kk"), waitP.as("w"))
      .filter(col("w") <= lit(targetWait))
      .groupBy(col("k"))
      .agg(min(struct(col("kk"), col("w"))).as("pick"))
      .select(col("k"), col("pick.kk").as("c_star"), col("pick.w").as("w"))
    load.join(cand, Seq("k"), "left")
      .select(col("k").as(keyCol), col("hours"),
        round(col("a"), 6).as("erlangs"),
        col("c_star"),
        when(col("c_star").isNotNull, round(col("w"), 6)).as("wait_prob"),
        when(col("c_star").isNotNull,
          round(col("a") / dbl(col("c_star")), 6)).as("utilization"))
      .orderBy(col(keyCol))
  }

  /** XYZ DEMAND-VARIABILITY CLASSES per key — the stability axis of the
    * classic ABC/XYZ inventory matrix (q339's ABC ranks by VALUE; this
    * classifies by PREDICTABILITY): coefficient of variation of the
    * dense weekly series, computed from the SPARSE census with the
    * q670 discipline — absent buckets ARE the zeros, so mean = S/T and
    * population variance = SS/T − mean² come from two exact integer
    * sums plus the spine length T, and the key×bucket grid is never
    * materialized. X (cv < 0.5) forecast-friendly, Y (cv < 1.0)
    * seasonal-ish, Z (cv ≥ 1.0) erratic — thresholds compared on the
    * PINNED cv so both engines classify identically. Keys need a
    * positive total; T must cover the observed span (caller passes the
    * global bucket count). O(keys) rows out.
    */
  def xyzClasses(
      sparse: DataFrame,
      keyCol: String,
      valueCol: String,
      totalBuckets: Long): DataFrame = {
    require(totalBuckets >= 2L)
    def dbl(c: Column): Column = c.cast("double")
    val t = lit(totalBuckets).cast("double")
    val agg = sparse.groupBy(col(keyCol).as("k"))
      .agg(sum(col(valueCol).cast("long")).as("s"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long"))
          .as("ss"))
      .filter(col("s") > 0L)
    val mean = dbl(col("s")) / t
    val varP = dbl(col("ss")) / t - mean * mean
    val cv = round(sqrt(varP) / mean, 9)
    agg.select(col("k").as(keyCol), lit(totalBuckets).as("t_buckets"),
        round(mean, 6).as("mean"),
        (round(cv, 6) + lit(0.0)).as("cv"),
        when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise(lit("Z"))
          .as("xyz_class"))
      .orderBy(col(keyCol))
  }

  /** ATKINSON INEQUALITY INDEX (ε = 1) per key — the inequality number
    * with a WELFARE reading the shelf's others lack: q338's Gini is a
    * rank statistic, q411's Theil an entropy; Atkinson(1) = 1 −
    * geomean/mean says directly "society would accept losing this
    * share of total income for perfect equality". The geometric mean
    * comes from the pinned-ln census (per-value ln at 1e-9, exact
    * decimal sum — the corpus ln discipline), the arithmetic mean from
    * exact integer sums; one pinned exp at the end. Non-positive
    * values carry no defined ln and are EXCLUDED but COUNTED (n vs
    * n_pos disclosed — silently dropping them would overstate
    * equality); keys with no positive mass read NULL. O(keys) out.
    */
  def atkinsonIndex(
      df: DataFrame,
      keyCol: String,
      valueCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val d2812 = DecimalType(28, 12)
    val agg = df.select(col(keyCol).as("k"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") > 0L, 1L).otherwise(0L)).as("np"),
        sum(when(col("v") > 0L, col("v")).otherwise(0L)).as("sv"),
        sum(when(col("v") > 0L,
          round(log(dbl(col("v"))), 9)).otherwise(0.0).cast(d2812))
          .as("sl"))
    val np = dbl(col("np"))
    val mean = dbl(col("sv")) / np
    val gm = exp(round(dbl(col("sl")) / np, 9))
    agg.select(col("k").as(keyCol), col("n"), col("np").as("n_pos"),
        when(col("np") >= 1L, round(mean, 6)).as("mean"),
        when(col("np") >= 1L && mean > 0.0,
          round(lit(1.0) - gm / mean, 6) + lit(0.0)).as("atkinson"))
      .orderBy(col(keyCol))
  }

  def priceIndices(
      df: DataFrame,
      itemCol: Column,
      periodCol: Column,
      centsCol: Column,
      qtyCol: Column,
      basePeriod: Long,
      curPeriod: Long): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val d289 = DecimalType(28, 9)
    val cen = df.select(itemCol.cast("long").as("item"),
        periodCol.cast("long").as("p"), centsCol.cast("long").as("cents"),
        qtyCol.cast("long").as("q"))
      .filter(col("p") === basePeriod || col("p") === curPeriod)
      .groupBy(col("item"), col("p"))
      .agg(sum(col("cents")).as("v"), sum(col("q")).as("q"))
    val base = cen.filter(col("p") === basePeriod)
      .select(col("item"), col("v").as("v0"), col("q").as("q0"))
    val cur = cen.filter(col("p") === curPeriod)
      .select(col("item"), col("v").as("v1"), col("q").as("q1"))
    val matched = base.join(cur, Seq("item"))
      .filter(col("q0") > 0L && col("q1") > 0L)
    val p0 = dbl(col("v0")) / dbl(col("q0"))
    val p1 = dbl(col("v1")) / dbl(col("q1"))
    val agg = matched.agg(count(lit(1)).as("n_matched"),
      sum(round(p1 * dbl(col("q0")), 9).cast(d289)).as("l_num"),
      sum(round(p0 * dbl(col("q0")), 9).cast(d289)).as("l_den"),
      sum(round(p1 * dbl(col("q1")), 9).cast(d289)).as("p_num"),
      sum(round(p0 * dbl(col("q1")), 9).cast(d289)).as("p_den"))
    val unmatched = base.join(cur, Seq("item"), "full")
      .agg(sum(when(col("v0").isNull || col("v1").isNull, 1L)
        .otherwise(0L)).as("n_unmatched"))
    val lasp = dbl(col("l_num")) / dbl(col("l_den"))
    val paas = dbl(col("p_num")) / dbl(col("p_den"))
    agg.crossJoin(broadcast(unmatched))
      .select(col("n_matched"), col("n_unmatched"),
        when(dbl(col("l_den")) > 0.0, round(lasp, 6)).as("laspeyres"),
        when(dbl(col("p_den")) > 0.0, round(paas, 6)).as("paasche"),
        when(dbl(col("l_den")) > 0.0 && dbl(col("p_den")) > 0.0,
          round(sqrt(lasp * paas), 6)).as("fisher"))
  }

  /** GOODMAN–KRUSKAL GAMMA and both SOMERS' D's for two ORDINAL columns
    * — the tie-aware association readouts q424's tau-b folds into one
    * number: gamma ignores ties entirely ((C−D)/(C+D): "among pairs
    * that actually order, how lopsided"), Somers' d(Y|X) charges ties
    * on the DEPENDENT side ((C−D)/(C+D+T_y): the asymmetric "does
    * knowing X order Y" that tau-b's symmetric denominator can't say),
    * and d(X|Y) is its converse. Same bounded-census contract as
    * tau-b: one (x, y) census, concordance counted on the census grid
    * (domain², never row pairs), every count an exact DECIMAL(38,0)
    * integer; tie masses carried DOUBLED (t(t−1)) so the /2 stays
    * integer-exact. A pairless degenerate (all rows one cell) NULLs
    * every ratio instead of dividing by zero.
    */
  def gkGamma(df: DataFrame, xCol: String, yCol: String): DataFrame =
    gkGammaFromCensus(df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c")))

  /** [[gkGamma]] from an (x, y, c) census — cell counts ADD across
    * batches (concordance/discordance/ties are all census-grid
    * functionals), so a streaming store's drained census reads
    * identically to the one-pass path and shares the batch oracle
    * verbatim.
    */
  def gkGammaFromCensus(censusDf: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val census = censusDf.groupBy(col("x"), col("y"))
      .agg(sum(col("c")).as("c"))
      .localCheckpoint(true) // probed four ways below
    val other = census.select(col("x").as("x2"), col("y").as("y2"),
      col("c").as("c2"))
    val cd = census.join(other,
        col("x2") > col("x") && col("y2") =!= col("y"))
      .groupBy(col("x"), col("y"), col("c"))
      .agg(
        sum(when(col("y2") > col("y"), col("c2")).otherwise(0L)).as("gt"),
        sum(when(col("y2") < col("y"), col("c2")).otherwise(0L)).as("lt"))
      .agg(
        // an all-ties census empties the join: 0 ordering pairs, not NULL
        coalesce(sum(col("c").cast(d38) * col("gt").cast(d38)),
          lit(0).cast(d38)).as("cc"),
        coalesce(sum(col("c").cast(d38) * col("lt").cast(d38)),
          lit(0).cast(d38)).as("dd"))
    val m = census.agg(sum(col("c")).cast(d38).as("n"),
      sum(col("c").cast(d38) * (col("c").cast(d38) - 1)).as("tb2"))
    val tx = census.groupBy(col("x")).agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)).as("tx2"))
    val ty = census.groupBy(col("y")).agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)).as("ty2"))
    val txOnly = ((col("tx2") - col("tb2")) / 2).cast("long")
    val tyOnly = ((col("ty2") - col("tb2")) / 2).cast("long")
    val s = dbl(col("concordant")) - dbl(col("discordant"))
    cd.crossJoin(broadcast(m)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("n").cast("long").as("n"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        txOnly.as("tied_x_only"), tyOnly.as("tied_y_only"),
        (col("tb2") / 2).cast("long").as("tied_both"))
      .select(col("*"),
        when(col("concordant") + col("discordant") > 0L,
          round(s / (dbl(col("concordant")) + dbl(col("discordant"))), 6))
          .as("gamma"),
        when(col("concordant") + col("discordant") +
            col("tied_y_only") > 0L,
          round(s / (dbl(col("concordant")) + dbl(col("discordant")) +
            dbl(col("tied_y_only"))), 6)).as("somers_d_yx"),
        when(col("concordant") + col("discordant") +
            col("tied_x_only") > 0L,
          round(s / (dbl(col("concordant")) + dbl(col("discordant")) +
            dbl(col("tied_x_only"))), 6)).as("somers_d_xy"))
  }

  /** LORENZ CURVE deciles per group — the distribution TABLE the Gini
    * scalar (q436) summarizes: for each decile d, the share of total
    * value held by the bottom d/10 of units. The chartable inequality
    * report ("the bottom 50% of orders carry 11% of revenue") beside
    * [[concentration]]'s one-number verdicts. EXACT at tie boundaries:
    * the value census's cumulative count brackets each decile cut
    * k_d = ⌊n·d/10⌋, and the straddling tie group contributes
    * x·(k_d − c_before) — integer apportionment, the q391 trimmed-mean
    * rank-interval discipline, never a per-row global sort. Cumulative
    * value in DECIMAL(38,0); one pinned share division per decile row.
    * Census is value-domain-sized per group; the decile spine is 10
    * rows per group. Zero-total groups read NULL shares.
    */
  def lorenzCurve(
      members: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame =
    lorenzFromCensus(
      members.select(col(groupCol).cast("string").as("g"),
          col(valueCol).cast("long").as("x"))
        .groupBy(col("g"), col("x")).agg(count(lit(1)).as("t")))

  /** [[lorenzCurve]] on a pre-aggregated (g, x, t) value census — the
    * mergeable form (censuses ADD across batches), shared by the
    * streaming maintenance store. */
  def lorenzFromCensus(census: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val cum = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = census
      // partials ADD: re-sum so batch-committed census fragments and the
      // one-pass batch census read identically
      .groupBy(col("g"), col("x")).agg(sum(col("t")).as("t"))
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("s", sum(col("x").cast(d38) * col("t").cast(d38))
        .over(cum))
      .localCheckpoint(true) // totals + the decile bracket join read it
    val tot = ranked.groupBy(col("g"))
      .agg(max(col("c")).as("n"), max(col("s")).as("stot"))
    val spine = tot.select(col("g"), col("n"), col("stot"),
        explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("k", expr("n * decile div 10"))
    // bracket join: the census row whose cumulative count first reaches
    // k_d; k_d = 0 (tiny groups' early deciles) short-circuits to zero
    val hit = spine.filter(col("k") > 0L)
      .join(ranked.select(col("g"), col("x"), col("t"), col("c"),
        col("s")), Seq("g"))
      .filter(col("c") - col("t") < col("k") && col("k") <= col("c"))
      .select(col("g"), col("decile"), col("n"), col("stot"), col("k"),
        (col("s") + col("x").cast(d38) * (col("k") - col("c")).cast(d38))
          .as("cumv"))
    val zero = spine.filter(col("k") === 0L)
      .select(col("g"), col("decile"), col("n"), col("stot"),
        col("k"), lit(0).cast(d38).as("cumv"))
    hit.unionByName(zero)
      .select(col("g"), col("decile").cast("long").as("decile"),
        col("n").cast("long").as("n_units"),
        col("k").cast("long").as("k_units"),
        col("cumv").cast("long").as("cum_value"),
        round(dbl(col("decile")) / 10.0, 6).as("pop_share"),
        when(col("stot") =!= lit(0).cast(d38),
          round(dbl(col("cumv")) / dbl(col("stot")), 6)).as("value_share"))
      .orderBy(col("g"), col("decile"))
  }

  /** CONCURRENCY SWEEP + LITTLE'S LAW — the ops-capacity readout over an
    * interval table: average concurrency L = Σduration/span (the exact
    * time-average), arrival rate λ = n/span, mean residence W = Σdur/n,
    * and the sweep-line PEAK (boundary census: +starts −ends per second,
    * one cumulative window over the BOUNDARY domain — never a per-second
    * explode; ties pin to the earliest second). L = λ·W is Little's law;
    * both sides are emitted from their own op orders so the identity is
    * visible, not assumed. Intervals are [s, e) with e > s enforced
    * loudly; all sums exact integers, three pinned divisions.
    */
  def concurrencySweep(
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val iv = intervals.select(col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .localCheckpoint(true) // totals + the boundary census read it
    // an e <= s row would silently corrupt busy_sec, span, lambda and
    // the boundary-sweep peak — refuse loudly (the ffdPlan posture)
    require(iv.filter(col("e") <= col("s")).isEmpty,
      "concurrencySweep needs e > s on every interval")
    val tot = iv.select(lit(1L).as("cnt"), col("s"), col("e"),
      (col("e") - col("s")).cast(d38).as("dur"))
    val bounds = iv.select(col("s").as("sec"), lit(1L).as("d"))
      .unionByName(iv.select(col("e").as("sec"), lit(-1L).as("d")))
    concurrencyFromCensus(tot, bounds)
  }

  /** [[concurrencySweep]] on pre-aggregated partials — the mergeable
    * form (interval totals and boundary deltas both ADD across
    * batches), shared by the streaming maintenance store. `totals`
    * rows: (cnt, s, e, dur); `bounds` rows: (sec, d). */
  def concurrencyFromCensus(
      totals: DataFrame, bounds: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val tot = totals.agg(sum(col("cnt")).as("n"), min(col("s")).as("lo"),
      max(col("e")).as("hi"), sum(col("dur").cast(d38)).as("busy"))
    val cum = Window.orderBy(col("sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = bounds.groupBy(col("sec")).agg(sum(col("d")).as("net"))
      .repartition(1)
      .withColumn("c", sum(col("net")).over(cum))
      .agg(max(struct(col("c"), (-col("sec")).as("ns"), col("sec")))
        .as("p"))
      .select(col("p.c").as("peak"), col("p.sec").as("peak_sec"))
    val span = dbl(col("hi") - col("lo"))
    val ok = col("hi") > col("lo") && col("n") > 0L
    tot.crossJoin(peak)
      .select(col("n").cast("long").as("n"),
        (col("hi") - col("lo")).as("span_sec"),
        col("busy").cast("long").as("busy_sec"),
        when(ok, round(dbl(col("n")) / span, 9)).as("lambda"),
        when(ok, round(dbl(col("busy")) / dbl(col("n")), 6)).as("w_avg"),
        when(ok, round(dbl(col("busy")) / span, 6)).as("l_avg"),
        when(ok, round(dbl(col("n")) / span *
          (dbl(col("busy")) / dbl(col("n"))), 6)).as("l_littles"),
        col("peak"), col("peak_sec"))
  }

  /** LTV ACCUMULATION CURVES per cohort — cumulative value per customer
    * by account age: the "when does a cohort pay back" table behind
    * every acquisition decision, the VALUE-weighted complement to q72's
    * distinct-active retention counts and q560's censoring-correct
    * survival. Cohort = first-activity year, age in whole weeks since
    * each unit's own first activity. Exact integer cents and counts,
    * one cumulative window per cohort over the WEEK domain, one pinned
    * division per row. Census form is mergeable under entity-partitioned
    * batching (each unit's rows land in one batch): per-batch activity
    * and size partials ADD, shared with the streaming store.
    */
  def ltvCurve(
      df: DataFrame,
      unitCol: String,
      dateCol: String,
      centsCol: String): DataFrame = {
    val base = df.select(col(unitCol).as("u"), col(dateCol).as("d"),
        col(centsCol).cast("long").as("v"))
      .withColumn("f", min(col("d")).over(
        Window.partitionBy(col("u"))))
      .select(col("u"), year(col("f")).cast("long").as("cohort"),
        expr("CAST(datediff(d, f) AS BIGINT) div 7").as("age_week"),
        col("v"))
    val census = base.groupBy(col("cohort"), col("age_week"))
      .agg(count_distinct(col("u")).as("act"), sum(col("v")).as("rev"))
    val sizes = base.groupBy(col("cohort"))
      .agg(count_distinct(col("u")).as("sz"))
    ltvFromCensus(census, sizes)
  }

  /** [[ltvCurve]] on pre-aggregated (cohort, age_week, act, rev) and
    * (cohort, sz) partials — the mergeable form the streaming store
    * drains through (partials add when batches are entity-partitioned).
    */
  def ltvFromCensus(census: DataFrame, sizes: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val cen = census.groupBy(col("cohort"), col("age_week"))
      .agg(sum(col("act")).as("n_active"),
        sum(col("rev").cast(d38)).as("rev"))
    val sz = sizes.groupBy(col("cohort")).agg(sum(col("sz")).as("sz"))
    val cum = Window.partitionBy(col("cohort")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cen.withColumn("cum", sum(col("rev")).over(cum))
      .join(broadcast(sz), Seq("cohort"))
      .select(col("cohort"), col("age_week"),
        col("n_active").cast("long").as("n_active"),
        col("rev").cast("long").as("revenue_cents"),
        col("cum").cast("long").as("cum_revenue_cents"),
        col("sz").cast("long").as("cohort_size"),
        when(col("sz") > 0L, round(dbl(col("cum")) / dbl(col("sz")), 6))
          .as("ltv_cents"))
      .orderBy(col("cohort"), col("age_week"))
  }

  /** JOIN-CARDINALITY AUDIT — the exact pre-flight every 100 TB join
    * deserves: from the two sides' KEY CENSUSES alone (never the join
    * itself), the exact output row count Σ n_l(k)·n_r(k), the
    * amplification factor vs the larger input, and the top fan-out keys
    * that would dominate the shuffle — the join-shaped sibling of
    * q166's groupBy skew report (a join that "worked at sf0.1" and
    * explodes at sf100 is caught HERE, census-sized, before any
    * row-level work). Exact DECIMAL(38,0) products; one pinned division.
    */
  def joinCardinalityAudit(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int = 5): DataFrame = {
    require(topK >= 1)
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("nl"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("nr"))
    val prod = lc.join(rc, Seq("k"))
      .select(col("k"), col("nl"), col("nr"),
        (col("nl").cast(d38) * col("nr").cast(d38)).as("out"))
      .localCheckpoint(true) // totals + the top-k scan read it
    // amplification compares against the FULL inputs, not just the
    // matched keys — "6 output rows from a 7-row table" is the honest
    // blow-up figure
    val inTot = lc.agg(sum(col("nl").cast(d38)).as("tl"))
      .crossJoin(rc.agg(sum(col("nr").cast(d38)).as("tr")))
    val tot = prod.agg(sum(col("out")).as("total_out"),
      count(lit(1)).as("n_keys")).crossJoin(inTot)
    prod.withColumn("rk", row_number().over(
        Window.orderBy(col("out").desc, col("k"))).cast("long"))
      .filter(col("rk") <= topK.toLong)
      .crossJoin(broadcast(tot))
      .select(col("rk").as("rank"), col("k").cast("string").as("key"),
        col("nl").cast("long").as("n_left"),
        col("nr").cast("long").as("n_right"),
        col("out").cast("long").as("out_rows"),
        col("total_out").cast("long").as("total_out_rows"),
        col("n_keys").cast("long").as("n_matched_keys"),
        when(greatest(col("tl"), col("tr")) =!= lit(0).cast(d38),
          round(dbl(col("total_out")) /
            dbl(greatest(col("tl"), col("tr"))), 6)).as("amplification"),
        when(col("total_out") =!= lit(0).cast(d38),
          round(dbl(col("out")) / dbl(col("total_out")), 6))
          .as("share_of_out"))
      .orderBy(col("rank"))
  }

  /** SKYLINE (PARETO FRONTIER) — the non-dominated set under
    * (minimize x, maximize y): a cell survives iff nothing is both
    * cheaper-or-equal and better-or-equal with one strict — the
    * "cheap AND popular" shortlist a top-k on either axis can't
    * produce (top-k by price keeps duds, top-k by popularity keeps
    * gold plate). Exact and one-sort cheap: collapse to the (x, y)
    * cell census, keep only each x's best y (same-x lower-y cells are
    * dominated by it), then one ordered sweep — a cell survives iff
    * its y strictly beats every strictly-cheaper x's best y
    * (cheaper-same-y dominates on price). Equal (x, y) members tie
    * onto the frontier together: counts and the min exemplar id ride
    * the cell. No pair joins anywhere; the sweep window runs over the
    * DISTINCT-x domain.
    */
  def skyline(
      df: DataFrame,
      idCol: String,
      minimizeCol: Column,
      maximizeCol: Column): DataFrame = {
    val cells = df.select(col(idCol).as("id"),
        minimizeCol.cast("long").as("x"), maximizeCol.cast("long").as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("exemplar"))
    val bestPerX = cells
      .withColumn("ymax", max(col("y")).over(
        Window.partitionBy(col("x"))))
      .filter(col("y") === col("ymax"))
      .drop("ymax")
    val prev = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bestPerX.repartition(1)
      .withColumn("best_cheaper", max(col("y")).over(prev))
      .filter(col("best_cheaper").isNull ||
        col("y") > col("best_cheaper"))
      .select(col("x"), col("y"), col("n_members"), col("exemplar"))
      .orderBy(col("x"))
  }

  /** ONE-WAY FIXED-EFFECTS (within) ESTIMATOR — the panel answer to
    * "does x move y WITHIN a unit", immune to everything constant
    * about the unit: pooled OLS on (x, y) is confounded by any
    * between-unit difference (heavy users differ in both exposure and
    * outcome); demeaning within each unit removes every unit-level
    * confounder in one algebraic stroke, and the pooled slope is
    * emitted beside it so the between-unit bias is VISIBLE. Exact
    * per-unit integer moments; each unit's within-contribution
    * S_xy − S_x·S_y/n pins once at 1e-9 and decimal-sums
    * (order-independent); σ² on N − k − 1 within degrees of freedom;
    * one pinned finish. Degenerate within-variation NULLs.
    */
  def fixedEffects(
      df: DataFrame,
      unitCol: Column,
      xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val d289 = DecimalType(28, 9)
    def dbl(c: Column): Column = c.cast("double")
    val per = df.select(unitCol.as("u"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("ni"), sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
    val ni = dbl(col("ni"))
    val w = per.select(col("ni"),
      col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"),
      round(dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")) / ni, 9)
        .cast(d289).as("wxy"),
      round(dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) / ni, 9)
        .cast(d289).as("wxx"),
      round(dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")) / ni, 9)
        .cast(d289).as("wyy"))
    val f = w.agg(sum(col("ni")).as("n"), count(lit(1)).as("k"),
      sum(col("wxy")).as("wxy"), sum(col("wxx")).as("wxx"),
      sum(col("wyy")).as("wyy"),
      sum(col("sx")).as("tsx"), sum(col("sy")).as("tsy"),
      sum(col("sxy")).as("tsxy"), sum(col("sxx")).as("tsxx"))
    val n = dbl(col("n"))
    val beta = dbl(col("wxy")) / dbl(col("wxx"))
    val sse = dbl(col("wyy")) - dbl(col("wxy")) * dbl(col("wxy")) /
      dbl(col("wxx"))
    val dfree = n - dbl(col("k")) - lit(1.0)
    val varB = sse / dfree / dbl(col("wxx"))
    val cxxP = n * dbl(col("tsxx")) - dbl(col("tsx")) * dbl(col("tsx"))
    val cxyP = n * dbl(col("tsxy")) - dbl(col("tsx")) * dbl(col("tsy"))
    val ok = dbl(col("wxx")) > 0.0 && sse > 0.0 && dfree > 0.0
    f.select(col("n").cast("long").as("n"),
      col("k").cast("long").as("k_units"),
      when(ok, round(beta, 6)).as("beta_within"),
      when(ok, round(sqrt(varB), 6)).as("se_within"),
      when(ok, round(beta / sqrt(varB), 6)).as("t_within"),
      when(cxxP > 0.0, round(cxyP / cxxP, 6)).as("beta_pooled"))
  }

  /** OAXACA–BLINDER DECOMPOSITION — how much of a two-group outcome
    * gap is COMPOSITION vs TREATMENT: gap = (x̄_A − x̄_B)·β_B
    * (explained — group A simply has more of the covariate, priced at
    * B's rate) + the remainder (unexplained — different intercepts and
    * returns for the SAME covariate). The group-gap sibling of q614's
    * KPI bridge (segments over time) pointed at two populations. Exact
    * per-group moments, closed-form fits, pinned arithmetic; the two
    * parts sum to the gap by construction. Degenerate groups NULL.
    */
  def oaxacaBlinder(
      df: DataFrame,
      groupACol: Column,
      xCol: Column,
      yCol: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val mom = df.select(groupACol.as("isa"), xCol.cast("long").as("x"),
        yCol.cast("long").as("y"))
      .groupBy(col("isa"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"))
      .filter(col("n") >= 3L)
    val n = dbl(col("n"))
    val cxx = n * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val cxy = n * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val fitted = mom.select(col("isa"), col("n"),
      when(cxx > 0.0, round(cxy / cxx, 9)).as("beta"),
      round(dbl(col("sx")) / n, 9).as("xbar"),
      round(dbl(col("sy")) / n, 9).as("ybar"))
    val a = fitted.filter(col("isa"))
      .select(col("n").as("n_a"), col("beta").as("beta_a"),
        col("xbar").as("xbar_a"), col("ybar").as("ybar_a"))
    val b = fitted.filter(!col("isa"))
      .select(col("n").as("n_b"), col("beta").as("beta_b"),
        col("xbar").as("xbar_b"), col("ybar").as("ybar_b"))
    val gap = col("ybar_a") - col("ybar_b")
    val explained = (col("xbar_a") - col("xbar_b")) * col("beta_b")
    val ok = col("beta_a").isNotNull && col("beta_b").isNotNull
    a.crossJoin(b).select(col("n_a"), col("n_b"),
      round(col("beta_a"), 6).as("beta_a"),
      round(col("beta_b"), 6).as("beta_b"),
      round(gap, 6).as("gap"),
      when(ok, round(explained, 6)).as("explained"),
      when(ok, round(gap - explained, 6)).as("unexplained"),
      when(ok && abs(gap) > 0.0, round(explained / gap, 6))
        .as("share_explained"))
  }
}
