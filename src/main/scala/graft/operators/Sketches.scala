package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions
import graft.plans.TextHashExpressions.{xsHash, xsMix}

/** Frequency-sketch and retrieval-scoring operators.
  *
  * Count-Min is the streaming/distributed answer to "which items are hot"
  * when the item domain is too large to count exactly: d×w counters
  * (constant memory) instead of |domain| counters, with one-sided error —
  * estimates only ever OVERcount. Hashing is the engine's portable
  * xorshift family ([[graft.plans.XsHash]]/[[graft.plans.XsMix]]) so the
  * DuckDB oracle replays every bucket assignment bit-for-bit.
  */
object Sketches {

  /** CMS bucket of `word` for sketch row `i`: portable mix, masked to a
    * power-of-two width (mask keeps signed/unsigned mod equivalent across
    * engines).
    */
  private def bucket(word: Column, i: Int, width: Int): Column =
    xsMix(xsHash(word), lit(i.toLong)).bitwiseAND(lit((width - 1).toLong))

  /** Heavy hitters with their Count-Min estimates.
    *
    * One corpus scan builds exact per-word counts (the verification
    * ground truth — at a true 100 TB stream you would feed raw
    * occurrences straight into the d×w cells and skip this aggregate);
    * the d×w counter table then sums those counts per (row, bucket), and
    * each of the top-`k` words probes its d cells, taking the min. The
    * counter table is `depth × width` rows regardless of corpus size, and
    * the probe join broadcasts.
    *
    * Returns (word, true_n, cms_est) with cms_est >= true_n always (CMS
    * never undercounts).
    */
  def cmsHeavyHitters(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 256,
      k: Int = 20): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of two")
    require(depth >= 1 && k >= 1)
    // exact per-word counts: ONE corpus scan, materialized because both
    // the cell table and the top-k probe derive from it (vocab-sized, not
    // corpus-sized)
    val wc = docs
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("true_n"))
      .localCheckpoint(true)
    val rowBuckets = wc.select(col("word"), col("true_n"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("row_i"), bucket(col("word"), i, width).as("bucket"))): _*))
        .as("rb"))
      .select(col("word"), col("true_n"), col("rb.row_i"), col("rb.bucket"))
    val cells = rowBuckets.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("true_n")).as("cell_n"))
    val top = wc.orderBy(col("true_n").desc, col("word")).limit(k)
    rowBuckets.join(broadcast(top.select(col("word"))), Seq("word"))
      .join(cells, Seq("row_i", "bucket"))
      .groupBy(col("word"), col("true_n"))
      .agg(min(col("cell_n")).as("cms_est"))
      .orderBy(col("true_n").desc, col("word"))
  }

  /** Mergeable Count-Min: one sketch per `groupCol` slice (day, source,
    * shard…), then the slices' counter tables SUM into the corpus sketch —
    * the algebraic property that lets a 100 TB pipeline maintain per-day
    * sketches incrementally and answer period-wide heavy-hitter queries
    * by merging d×w tables instead of re-scanning history (the CMS
    * counterpart of the q119 HLL rollup). The merged table is provably
    * identical to a direct whole-corpus sketch (SketchesSpec asserts
    * cell-for-cell equality); estimates keep CMS's one-sided error.
    *
    * Returns (word, true_n, n_groups, cms_est), top `k` by exact count.
    */
  def cmsMergedHeavyHitters(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      depth: Int = 4,
      width: Int = 256,
      k: Int = 20): DataFrame = {
    require(width > 0 && (width & (width - 1)) == 0, "width must be a power of two")
    require(depth >= 1 && k >= 1)
    val wcg = docs
      .select(col(groupCol).as("grp"),
        explode(TextFunctions.words(col(textCol))).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the per-group cells AND the exact rollup
    val rbg = wcg.select(col("grp"), col("word"), col("n"),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("row_i"), bucket(col("word"), i, width).as("bucket"))): _*))
        .as("rb"))
      .select(col("grp"), col("word"), col("n"), col("rb.row_i"), col("rb.bucket"))
    // the per-group sketch store (what a daily pipeline would persist)…
    val groupCells = rbg.groupBy(col("grp"), col("row_i"), col("bucket"))
      .agg(sum(col("n")).as("cell_n"))
    // …and the MERGE: counter tables are union-addable
    val merged = groupCells.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cell_n")).as("cell_n"))
    val wc = wcg.groupBy(col("word"))
      .agg(sum(col("n")).as("true_n"), count_distinct(col("grp")).as("n_groups"))
    val top = wc.orderBy(col("true_n").desc, col("word")).limit(k)
    rbg.select(col("word"), col("row_i"), col("bucket")).distinct()
      .join(broadcast(top), Seq("word"))
      .join(merged, Seq("row_i", "bucket"))
      .groupBy(col("word"), col("true_n"), col("n_groups"))
      .agg(min(col("cell_n")).as("cms_est"))
      .orderBy(col("true_n").desc, col("word"))
  }

  /** BM25 relevance of every document against a fixed term set: the
    * classic retrieval scorer (the usual lexical half of hybrid search
    * over a training corpus).
    *
    * `score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`
    * with `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`.
    *
    * Per-term scores are accumulated in DECIMAL(18,9) so the per-document
    * sum is order-independent (a raw double sum would vary with partial
    * aggregation order); the 1e-9 grid sits far above the double ulp of
    * these O(1..100) scores, so the decimal cast is engine-identical.
    * Plan: one corpus scan for doc lengths + term frequencies, tiny df
    * and length stats broadcast back.
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 100): DataFrame = {
    require(terms.nonEmpty)
    val words = docs
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("w"))
      .localCheckpoint(true) // feeds dl, tf and df below: scan once
    val dl = words.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs.toDouble
    val q = words.filter(col("w").isin(terms: _*))
    val tf = q.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val df_ = q.select(col(idCol), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs.toDouble) - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val tfd = col("tf").cast("double")
    val termScore = idf * (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(df_), Seq("w"))
      .join(dl, Seq(idCol))
      .select(col(idCol), termScore.cast(DecimalType(18, 9)).as("s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("s")).cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Mergeable EXACT distinct counting over a dense integer key domain —
    * the bitmap-index counterpart to the HLL rollup (q119): where HLL
    * trades exactness for constant size, a packed bitmap keeps exactness
    * at one bit per possible key, the ClickHouse/Druid groupBitmap shape.
    *
    * Keys are packed 63 per word (`word = key div 63`, `bit = key mod
    * 63`): 63 rather than 64 keeps every mask non-negative, because a
    * `1 << 63` sign bit trips overflow checks on engines with checked
    * shifts (DuckDB) and signed/unsigned asymmetries elsewhere. The
    * per-group bitmap table is what you persist: distinct counts of any
    * group union then come from bit_or-merging word masks WITHOUT
    * re-scanning facts — the same union-addable contract as the HLL and
    * CMS stores.
    *
    * Both aggregations map-side combine; shuffle cardinality is
    * groups × occupied words, never fact rows.
    */
  /** EXACT pairwise AUDIENCE OVERLAP from the bitmap store — the
    * marketing/segmentation matrix ("how many users do segments A and B
    * share") at bitmap cost: facts are scanned ONCE into per-group word
    * cells ([[bitmapWords]]); every pair's intersection is then
    * popcount(maskₐ AND mask_b) summed over the words the pair shares —
    * a word-aligned equi-join over the CELL table (groups × occupied
    * words), never a fact self-join. Emits (ga, gb, n_a, n_b, n_inter,
    * jaccard) for pairs with n_inter > 0; exact, not estimated — the
    * precision companion to [[kmvJaccard]]'s sketch estimate.
    */
  def bitmapOverlap(
      facts: DataFrame,
      groupCol: String,
      keyCol: String): DataFrame = {
    val cells = bitmapWords(
      facts.select(col(groupCol).as("g"), col(keyCol).as("k")),
      Seq("g"), "k")
    val sizes = cells.groupBy(col("g"))
      .agg(sum(bit_count(col("mask")).cast("long")).as("n"))
    val inter = cells.select(col("g").as("ga"), col("__word"),
        col("mask").as("ma"))
      .join(cells.select(col("g").as("gb"), col("__word"),
        col("mask").as("mb")), Seq("__word"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(sum(bit_count(col("ma").bitwiseAND(col("mb"))).cast("long"))
        .as("n_inter"))
      .filter(col("n_inter") > 0)
    inter
      .join(sizes.select(col("g").as("ga"), col("n").as("n_a")), Seq("ga"))
      .join(sizes.select(col("g").as("gb"), col("n").as("n_b")), Seq("gb"))
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("ga"), col("gb"))
  }

  def bitmapWords(
      facts: DataFrame,
      groupCols: Seq[String],
      keyCol: String): DataFrame = {
    require(groupCols.nonEmpty)
    facts
      .select(groupCols.map(col) :+
        // FLOOR division, in exact integer arithmetic: `div` truncates
        // toward zero, which for a negative key would pair word 0 with a
        // positive bit and silently collide with a positive key (-1 would
        // count as 62). (key - pmod) is always an exact multiple of 63.
        expr(s"($keyCol - pmod($keyCol, 63)) div 63").as("__word") :+
        expr(s"shiftleft(1L, int(pmod($keyCol, 63)))").as("__m"): _*)
      .groupBy((groupCols.map(col) :+ col("__word")): _*)
      .agg(bit_or(col("__m")).as("mask"))
  }

  /** Sliding-window distinct from a standing per-period bitmap store —
    * the dashboard shape "distinct users in the trailing N hours, every
    * hour". `words` is a [[bitmapWords]] table cut by (groupCols…,
    * periodCol); each cell is exploded to the `window` period ticks it
    * contributes to (a BOUNDED ×window fan-out of the cell table — never
    * of the facts), bit_or-merged per tick, pop-counted.
    *
    * This is the sketch-store counterpart of the bounded-explode
    * trailing distinct over facts (q99): facts are scanned ONCE into
    * per-period cells; every re-query, window change, or late-arriving
    * period touches only the cell table, whose size is groups × periods
    * × occupied words. Output ticks are the periods the group itself has
    * a cell for (real activity ticks, matching the direct query's
    * semantics).
    */
  def trailingBitmapDistinct(
      words: DataFrame,
      groupCols: Seq[String],
      periodCol: String,
      window: Int): DataFrame = {
    require(window >= 1 && groupCols.nonEmpty)
    val contrib = words
      .withColumn("__t",
        explode(sequence(col(periodCol), col(periodCol) + lit(window - 1).cast("long"))))
      .drop(periodCol)
    val ticks = words
      .select((groupCols.map(col) :+ col(periodCol).as("__t")): _*)
      .distinct()
    contrib
      .join(ticks, groupCols :+ "__t")
      .groupBy((groupCols.map(col) :+ col("__t") :+ col("__word")): _*)
      .agg(bit_or(col("mask")).as("mask"))
      .groupBy((groupCols.map(col) :+ col("__t")): _*)
      .agg(sum(bit_count(col("mask"))).as("n_distinct"))
      .withColumnRenamed("__t", periodCol)
  }

  /** Set ALGEBRA over the bitmap store: for every pair of groups, the
    * exact intersection / union / difference distinct counts, computed
    * word-by-word from the standing bitmap table — "users active in both
    * click AND purchase" without ever re-touching facts, the query class
    * (audience overlap, cohort intersection) that HLL can only
    * approximate and COUNT(DISTINCT …) INTERSECT re-scans for.
    *
    * Only the intersection needs the word-level AND join; union and
    * differences follow by inclusion–exclusion from the per-group
    * totals, so pairs sharing no word never even join. Shuffle
    * cardinality is groups × occupied words, never facts.
    */
  def bitmapPairCounts(words0: DataFrame, groupCol: String): DataFrame = {
    // re-or per word first: a merged multi-segment store may repeat a
    // word per group, and AND-popcounts only add across disjoint masks
    val words = words0.groupBy(col(groupCol), col("__word"))
      .agg(bit_or(col("mask")).as("mask"))
    val totals = bitmapDistinct(words, Seq(groupCol))
    val a = words.select(col(groupCol).as("ga"), col("__word"), col("mask").as("ma"))
    val b = words.select(col(groupCol).as("gb"), col("__word"), col("mask").as("mb"))
    val both = a.join(b, Seq("__word")).filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb"))
      .agg(sum(bit_count(col("ma").bitwiseAND(col("mb")))).as("nb"))
    totals.select(col(groupCol).as("ga"), col("n_distinct").as("n_a"))
      .join(totals.select(col(groupCol).as("gb"), col("n_distinct").as("n_b")))
      .filter(col("ga") < col("gb"))
      .join(both, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("n_a"), col("n_b"),
        coalesce(col("nb"), lit(0L)).as("n_both"),
        (col("n_a") + col("n_b") - coalesce(col("nb"), lit(0L))).as("n_union"),
        (col("n_a") - coalesce(col("nb"), lit(0L))).as("n_only_a"),
        (col("n_b") - coalesce(col("nb"), lit(0L))).as("n_only_b"))
  }

  /** Exact distinct keys per group from a (possibly merged) bitmap-word
    * table: pop-count each word mask and sum.
    */
  def bitmapDistinct(words: DataFrame, groupCols: Seq[String]): DataFrame =
    words
      // re-or per word first: merged stores may carry the same word from
      // several segments, and popcounts only add across DISJOINT masks
      .groupBy((groupCols.map(col) :+ col("__word")): _*)
      .agg(bit_or(col("mask")).as("mask"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(bit_count(col("mask"))).as("n_distinct"))

  /** 52-bit uniform hash of a key: the first 13 hex chars of md5, as a
    * long in [0, 2^52). Both engines agree on md5 and the hex slice, and
    * 52 bits fit a double exactly — the portable hash for order-statistic
    * sketches.
    */
  private def h52(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  private val H52_SPACE: Double = 4503599627370496.0 // 2^52

  /** KMV (k-minimum-values) distinct-count sketch per group, plus the
    * MERGED union estimate across all groups — the order-statistics
    * alternative to HLL (q37/q119) whose every intermediate is exact and
    * engine-replayable, so the oracle can hash-match it (HLL internals
    * are rows-only-checkable; KMV is not).
    *
    * Per group the sketch is the k smallest distinct 52-bit key hashes;
    * the estimator is (k−1)·2^52 / h_(k) (the classic KMV mean-matching
    * estimate), or the exact distinct count when the group holds fewer
    * than k hashes (the sketch IS the set). Merging sketches = merging
    * k-min lists and re-taking the k smallest — done here across all
    * groups, giving the union estimate without touching raw data again.
    *
    * Scale shape: one distinct-aggregation (the only full shuffle), then
    * per-group top-k via window over k·|groups| rows at most, then a
    * metadata-sized merge. At 100 TB the distinct can itself be
    * partial-aggregated map-side; nothing downstream sees more than
    * k rows per group.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 2)
    import org.apache.spark.sql.expressions.Window
    val hashes = df
      .select(col(groupCol).as("g"), h52(col(idCol)).as("h"))
      .distinct()
    val rn = row_number().over(Window.partitionBy(col("g")).orderBy(col("h")))
    val mins = hashes.withColumn("rn", rn).filter(col("rn") <= k)
    def estimate(d: DataFrame): DataFrame =
      d.groupBy(col("g"))
        .agg(count(lit(1)).as("nk"),
          max(when(col("rn") === k, col("h"))).as("hk"))
        .select(col("g"),
          round(when(col("nk") < k, col("nk").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(H52_SPACE) /
              col("hk").cast("double")), 4).as("est"))
    val union = mins.select(col("h")).distinct()
      .withColumn("rn",
        row_number().over(Window.partitionBy(lit(1)).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .withColumn("g", lit("__union__"))
    estimate(mins).unionByName(estimate(union)).orderBy(col("g"))
  }

  /** Pairwise Jaccard estimates between groups' id-sets from their KMV
    * sketches ALONE — sketch set-algebra, the [[kmvDistinct]] companion:
    * for each group pair, merge the two k-min lists, keep the k smallest
    * of the union, and count how many of those sit in BOTH sketches;
    * that count over k is the standard KMV Jaccard estimator (and with
    * the union estimate gives intersection sizes by J·|A∪B|). Everything
    * after the per-group sketch pass is sketch-sized: pairs are |G|²
    * metadata, each union frame holds ≤ 2k rows — re-running against new
    * group pairings never re-touches the fact table. md5-derived hashes,
    * so the oracle replays the estimator EXACTLY.
    */
  def kmvJaccard(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 2)
    import org.apache.spark.sql.expressions.Window
    val hashes = df
      .select(col(groupCol).as("g"), h52(col(idCol)).as("h"))
      .distinct()
    val rn = row_number().over(Window.partitionBy(col("g")).orderBy(col("h")))
    val mins = hashes.withColumn("rn", rn).filter(col("rn") <= k)
      .select(col("g"), col("h"))
    val groups = mins.select(col("g")).distinct()
    val pairs = groups.as("x").join(groups.as("y"), col("x.g") < col("y.g"))
      .select(col("x.g").as("ga"), col("y.g").as("gb"))
    // membership of each union hash in either sketch via two equi-joins
    // (no OR-join, which would plan as a nested loop)
    val fromA = pairs.join(mins, col("g") === col("ga"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val fromB = pairs.join(mins, col("g") === col("gb"))
      .select(col("ga"), col("gb"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val uni = fromA.unionByName(fromB)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // the window frame is one pair's merged sketch: ≤ 2k rows
    val rnu = row_number()
      .over(Window.partitionBy(col("ga"), col("gb")).orderBy(col("h")))
    uni.withColumn("rn", rnu).filter(col("rn") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("kk"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"))
      .select(col("ga"), col("gb"), col("kk"), col("n_both"),
        round(col("n_both").cast("double") / col("kk").cast("double"), 6)
          .as("jaccard_est"))
      .orderBy(col("ga"), col("gb"))
  }

  /** Mergeable QUANTILE sketch by BOTTOM-k-BY-HASH sampling — the
    * sketch-shelf answer to "p99 across a period without re-scanning
    * facts" next to HLL/KMV (distinct), CMS (frequency) and bitmaps
    * (membership). Each segment keeps the k rows with the smallest
    * 52-bit id hashes (a uniform without-replacement sample); merging
    * sketches = union + re-take the k smallest — EXACTLY the global
    * bottom-k, so per-day sketches compose to the period sample with no
    * approximation beyond the sampling itself (rank error O(1/√k)).
    * Chosen over KLL deliberately: KLL's level-compactor coin flips
    * can't be replayed cross-engine, while bottom-k is a pure function
    * of the md5 hashes — every intermediate here is engine-exact and the
    * oracle hash-matches the whole pipeline (the q249 KMV discipline
    * applied to quantiles; the engine's exact-oracle bar beats KLL's
    * ~2× tighter constant).
    *
    * Scale shape: BUILD is one fact pass (per-segment window over
    * segment-local rows, map-side prunable to k per partition); MERGE
    * touches only the ≤ k·|segments| sketch rows (the one unpartitioned
    * window runs over that sketch-sized frame, never the corpus);
    * estimation reads the ≤ k merged sample into one sorted array.
    */
  /** Hash-keyed sample rows (h, id, v) — the working form every
    * bottom-k pass below orders by. Exposed so incremental maintainers
    * (streaming micro-batches) can hash THEIR rows identically.
    */
  def hashedSample(df: DataFrame, idCol: String, vCol: String): DataFrame =
    df.select(h52(col(idCol)).as("h"), col(idCol).cast("long").as("id"),
      col(vCol).cast("double").as("v"))

  /** Bottom-k of an arbitrarily LARGE (h, id, v) frame without a
    * single-partition window: partition-local bottom-k first, then the
    * global re-take over the ≤ k·partitions survivors.
    */
  def bottomKLarge(hashed: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = hashed
      .withColumn("__p", spark_partition_id())
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__p")).orderBy(col("h"), col("id"))))
      .filter(col("__rn") <= k)
      .drop("__p", "__rn")
    bottomKSmall(local, k)
  }

  /** Bottom-k of a SKETCH-SIZED (h, id, v) frame — the merge step; the
    * unpartitioned window is fine because the input is already ≤
    * k·segments rows by contract.
    */
  def bottomKSmall(samples: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    samples
      .withColumn("__rn", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("h"), col("id"))))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Quantile estimates from a merged bottom-k sample: the sorted value
    * array picked at rank ⌈q·k'⌉. `nTotal` is a one-row (n_total) frame.
    */
  def quantileEstimate(
      sample: DataFrame, nTotal: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val packed = sample.agg(
      sort_array(collect_list(col("v"))).as("vals"),
      count(lit(1)).as("sample_k"))
    val spine = sample.sparkSession.createDataFrame(qs.map(Tuple1(_)))
      .toDF("quantile")
    packed.crossJoin(broadcast(nTotal)).crossJoin(broadcast(spine))
      .select(col("quantile"),
        element_at(col("vals"),
          greatest(lit(1L), ceil(col("quantile") * col("sample_k")))
            .cast("int")).as("est"),
        col("sample_k"), col("n_total"))
      .orderBy(col("quantile"))
  }

  /** GROUPED quantile sketches — [[quantileSketch]] per key: every group
    * gets its own per-segment bottom-k samples, merge, and p-estimates
    * (the per-tenant / per-metric latency-dashboard shape). All windows
    * are (group, segment)- or group-keyed — parallel across groups, ≤ k
    * rows per group after the build; the estimate reads each group's ≤ k
    * sample into one sorted array.
    */
  def quantileSketchGrouped(
      df: DataFrame,
      groupCol: String,
      segmentCol: Column,
      idCol: String,
      vCol: String,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    require(k >= 2, "sample size k must be at least 2")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(groupCol).as("g"), segmentCol.as("seg"),
      h52(col(idCol)).as("h"), col(idCol).cast("long").as("id"),
      col(vCol).cast("double").as("v"))
    val segSketch = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("seg")).orderBy(col("h"), col("id"))))
      .filter(col("rn") <= k)
    val merged = segSketch
      .withColumn("grn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"), col("id"))))
      .filter(col("grn") <= k)
    val totals = hashed.groupBy(col("g")).agg(count(lit(1)).as("n_total"))
    val packed = merged.groupBy(col("g"))
      .agg(sort_array(collect_list(col("v"))).as("vals"),
        count(lit(1)).as("sample_k"))
      .join(totals, Seq("g"))
    val spine = df.sparkSession.createDataFrame(qs.map(Tuple1(_)))
      .toDF("quantile")
    packed.crossJoin(broadcast(spine))
      .select(col("g").as(groupCol), col("quantile"),
        element_at(col("vals"),
          greatest(lit(1L), ceil(col("quantile") * col("sample_k")))
            .cast("int")).as("est"),
        col("sample_k"), col("n_total"))
      .orderBy(col(groupCol), col("quantile"))
  }

  def quantileSketch(
      df: DataFrame,
      segmentCol: Column,
      idCol: String,
      vCol: String,
      k: Int,
      qs: Seq[Double]): DataFrame = {
    require(k >= 2, "sample size k must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(segmentCol.as("seg"), h52(col(idCol)).as("h"),
      col(idCol).cast("long").as("id"), col(vCol).cast("double").as("v"))
    // BUILD: one fact pass → per-segment bottom-k sample (+ counts)
    val segSketch = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("h"), col("id"))))
      .filter(col("rn") <= k)
      .drop("rn", "seg")
    val totals = hashed.groupBy(col("seg")).agg(count(lit(1)).as("n"))
    // MERGE: sketches only — union the per-segment samples and re-take
    // the global bottom-k (== the bottom-k of the raw union, exactly);
    // the unpartitioned window frame is the k·|segments| sketch, never
    // the corpus
    val merged = bottomKSmall(segSketch, k)
    quantileEstimate(merged, totals.agg(sum(col("n")).as("n_total")), qs)
  }

  /** REPLAYABLE HyperLogLog registers (Flajolet et al. 2007) per group:
    * the register-based distinct sketch the built-in
    * approx_count_distinct hides (its HLL++ internals make q37/q119
    * rows-only-checkable; THIS one is a pure md5 function, so every
    * register and the estimate hash-match cross-engine — the q249/q316
    * discipline applied to HLL itself). m = 256 registers: bucket =
    * low 8 bits of the 52-bit hash, register value = leading-zero rank
    * ρ of the remaining 44 bits (45 − bitlength, integer-exact via the
    * binary string — no log2 anywhere). One map-side-combined MAX per
    * (group, bucket): the fact pass emits ≤ 256 rows per group
    * regardless of scale, and registers MERGE by the same MAX — see
    * [[hllEstimate]].
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val h = h52(col(keyCol))
    val w = expr("__h div 256")
    df.select(col(groupCol).as("g"), h.as("__h"))
      .withColumn("j", pmod(col("__h"), lit(256L)))
      .withColumn("rho",
        when(w === 0L, 45).otherwise(lit(45) - length(bin(w))).cast("int"))
      .groupBy(col("g"), col("j"))
      .agg(max(col("rho")).as("m"))
  }

  /** AMS second-moment (F₂) sketch (Alon–Matias–Szegedy 1996), fully
    * replayable: F₂ = Σ c_u² is EXACTLY the self-join size [[q386]]'s
    * fanout audit computes — the AMS sketch estimates it with k counters
    * instead of the key domain: Z_j = Σ_u s_j(u)·c_u with md5-derived
    * ±1 signs, E[Z²] = F₂. Returns the exact F₂, the k-estimator mean
    * of Z², and the relative error — every intermediate an exact
    * integer/decimal (signs and counts are integers; the only doubles
    * are the final casts), so the oracle replays the sketch hash for
    * hash. The per-key cost is k sign hashes AFTER the count census —
    * key-domain sized, never fact-sized.
    */
  def amsF2(
      df: DataFrame,
      keyCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1)
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val counts = df.groupBy(col(keyCol).cast("string").as("u"))
      .agg(count(lit(1)).as("c"))
    val signed = counts.select(col("c"),
      explode(array((0 until k).map { j =>
        val s = lit(1L) - lit(2L) * pmod(
          conv(substring(md5(concat(lit(s"$salt:$j:"), col("u"))
            .cast("binary")), 1, 13), 16, 10).cast("long"), lit(2L))
        struct(lit(j).as("j"), (s * col("c")).as("zc"))
      }: _*)).as("e"))
    val z = signed.groupBy(col("e.j").as("j"))
      .agg(sum(col("e.zc").cast(d38)).as("z"))
      .agg(sum(col("z") * col("z")).as("zz"), count(lit(1)).as("nk"))
    val exact = counts.agg(sum(col("c").cast(d38) * col("c").cast(d38))
      .as("f2"), count(lit(1)).as("n_keys"))
    exact.crossJoin(z)
      .select(col("n_keys"), dbl(col("f2")).as("f2_exact"),
        round(dbl(col("zz")) / dbl(col("nk")), 6).as("f2_ams"),
        round((dbl(col("zz")) / dbl(col("nk")) - dbl(col("f2"))) /
          dbl(col("f2")), 6).as("rel_error"))
  }

  /** SLIDING-WINDOW HLL cells: [[hllRegisters]] extended with the MAX
    * EVENT TIME per (group, bucket, ρ) cell — the classic trick that
    * makes one register store answer "distinct in ANY suffix window":
    * at query time keep only cells with ts ≥ cutoff, re-take the max ρ
    * per bucket, and estimate. The store is ≤ 256·45 cells per group
    * at any scale, maintained by a MAX that commutes (streaming-safe),
    * and the answer for EVERY cutoff comes from the same store — no
    * per-window re-scan of facts.
    */
  def slidingHllCells(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tsCol: String): DataFrame = {
    val h = h52(col(keyCol))
    val w = expr("__h div 256")
    df.select(col(groupCol).as("g"), h.as("__h"),
        col(tsCol).cast("long").as("ts"))
      .withColumn("j", pmod(col("__h"), lit(256L)))
      .withColumn("rho",
        when(w === 0L, 45).otherwise(lit(45) - length(bin(w))).cast("int"))
      .groupBy(col("g"), col("j"), col("rho"))
      .agg(max(col("ts")).as("max_ts"))
  }

  /** HLL ESTIMATE from [[hllRegisters]] rows: raw E = α·m²/Σ2^(−M_j)
    * (empty registers contribute 1), with the linear-counting
    * small-range correction m·ln(m/V) when E ≤ 2.5m and empty registers
    * remain. Exactness: every 2^(−M) is a power of two (exact in
    * double), landed on the 1e-18 decimal grid and summed exactly; the
    * α/harmonic finish is pinned doubles rounded once. The input is
    * register-domain sized (≤ 256 rows per group) — estimating costs
    * nothing at any scale, and merging groups is a MAX per bucket
    * upstream of this function.
    */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val m = 256
    val d3818 = DecimalType(38, 18)
    def dbl(c: Column): Column = c.cast("double")
    val agg = regs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_regs"),
        sum(round(pow(lit(2.0), -col("m")), 18).cast(d3818)).as("s_present"))
      .withColumn("v_empty", lit(m.toLong) - col("n_regs"))
      .withColumn("s", dbl(col("s_present") +
        col("v_empty").cast(d3818)))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val eRaw = alpha * lit(65536.0) / col("s")
    val e = when(eRaw <= lit(2.5 * m) && col("v_empty") > 0L,
      lit(256.0) * log(lit(256.0) / dbl(col("v_empty")))).otherwise(eRaw)
    agg.select(col("g"), col("n_regs"), col("v_empty"),
      round(e, 6).as("estimate"))
  }

  /** CHAPMAN CAPTURE–RECAPTURE — estimate a POPULATION you only sample:
    * two overlapping observation windows ("captures") of the same
    * universe give N̂ = (n₁+1)(n₂+1)/(m+1) − 1 with m the overlap — the
    * coverage estimator for "how many distinct users/entities exist,
    * including the ones neither window saw" that a plain
    * count-distinct (q37's HLL, q366's bitmaps) structurally cannot
    * answer. Assumes equal catchability across windows (stated).
    *
    * One distinct-per-window census; the estimate is exact integer
    * arithmetic to one pinned division, with the closed-form Chapman
    * variance for a CI. Output one row per key domain split.
    */
  def captureRecapture(
      sample1: DataFrame,
      sample2: DataFrame,
      idCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val s1 = sample1.select(col(idCol).as("id")).distinct()
      .withColumn("in1", lit(1L))
    val s2 = sample2.select(col(idCol).as("id")).distinct()
      .withColumn("in2", lit(1L))
    val j = s1.join(s2, Seq("id"), "full")
      .agg(sum(coalesce(col("in1"), lit(0L))).as("n1"),
        sum(coalesce(col("in2"), lit(0L))).as("n2"),
        sum(when(col("in1").isNotNull && col("in2").isNotNull, 1L)
          .otherwise(0L)).as("m"),
        count(lit(1)).as("n_seen"))
    val nh = dbl(col("n1") + 1L) * dbl(col("n2") + 1L) /
      dbl(col("m") + 1L) - lit(1.0)
    val varN = dbl(col("n1") + 1L) * dbl(col("n2") + 1L) *
      dbl(col("n1") - col("m")) * dbl(col("n2") - col("m")) /
      (dbl(col("m") + 1L) * dbl(col("m") + 1L) * dbl(col("m") + 2L))
    j.select(col("n1"), col("n2"), col("m"), col("n_seen"),
      round(nh, 6).as("n_hat"),
      round(sqrt(varN), 6).as("se"),
      round(nh - lit(1.959964) * sqrt(varN), 6).as("ci_lo"),
      round(nh + lit(1.959964) * sqrt(varN), 6).as("ci_hi"))
  }
}
