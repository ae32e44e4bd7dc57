package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Composed corpus-cleaning pipeline — the standard pre-training data
  * shape: quality gates → language gate → exact dedup, as ONE declarative
  * plan (single scan feeding filters, one hash shuffle for the dedup).
  */
object TextPipeline {

  /** Sliding-window (RAG-style) chunking: one row per `(input row,
    * chunk_idx)` with the chunk's offset and text. Character windows of
    * `win` chars every `hop` chars; a document shorter than one window
    * still yields its single (short) chunk. The explode scales chunk rows
    * out; offsets are engine-portable (char-based `substring`).
    */
  def slidingChunks(
      df: DataFrame,
      textCol: String,
      win: Int = 400,
      hop: Int = 160): DataFrame = {
    require(win > 0 && hop > 0, "win and hop must be positive")
    df
      .withColumn("__len", length(col(textCol)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          greatest(ceil((col("__len") - lit(win)).cast("double") / hop).cast("long"),
            lit(0L)))))
      .withColumn("chunk_off", col("chunk_idx") * hop)
      .withColumn("chunk", expr(s"substring($textCol, chunk_off + 1, $win)"))
      .drop("__len")
  }

  /** Per-document repetition (boilerplate) stats — the Gopher/C4-family
    * quality rule "drop documents dominated by one repeated n-gram". For
    * each document: its word `n`-gram count, the repeat count of the
    * single most frequent n-gram, and the ratio between them. One explode
    * + one (doc, gram) count + one per-doc aggregate; gram rows scale out
    * with corpus size, nothing is corpus-global.
    */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1)
    val grams = docs
      .withColumn("__w", TextFunctions.words(col("text")))
      .filter(size(col("__w")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(__w) - ${n - 1}), i -> array_join(slice(__w, i, $n), ' '))"))
          .as("gram"))
    grams
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"), max(col("cnt")).as("max_rep"))
      .select(col("doc_id"), col("n_grams"), col("max_rep"),
        round(col("max_rep").cast("double") / col("n_grams").cast("double"), 6)
          .as("rep_ratio"))
  }

  /** PII redaction over a text column: emails first (their local parts
    * contain digits), then standalone digit runs, each replaced by a
    * fixed tag; returns the redacted column plus per-row match counts.
    * Patterns stay in the lookaround-free regex subset that Java regex
    * and RE2-family engines interpret identically.
    */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val DigitRunRe = """[0-9]{3,}"""

  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("__noEmail",
        regexp_replace(col(textCol), EmailRe, "<EMAIL>"))
      .withColumn("n_digit_runs",
        regexp_count(col("__noEmail"), lit(DigitRunRe)))
      .withColumn("redacted",
        regexp_replace(col("__noEmail"), DigitRunRe, "<NUM>"))
      .drop("__noEmail")

  /** Benchmark-contamination check — the train/test hygiene pass every
    * pre-training pipeline needs: the share of each candidate document's
    * DISTINCT word `n`-gram shingles that also occur anywhere in the
    * held-out benchmark set. Shingles join on their text (at 100 TB the
    * join key would be a 64-bit shingle hash — same plan shape, smaller
    * shuffle); the benchmark side is the small side and hash-joins.
    */
  def contamination(
      docs: DataFrame,
      benchPred: org.apache.spark.sql.Column,
      n: Int = 8): DataFrame = {
    val shingles = docs
      .withColumn("__w", TextFunctions.words(col("text")))
      .filter(size(col("__w")) >= n)
      .select(col("doc_id"), benchPred.as("is_bench"),
        explode(expr(
          s"transform(sequence(1, size(__w) - ${n - 1}), i -> array_join(slice(__w, i, $n), ' '))"))
          .as("gram"))
      .distinct()
    val bench = shingles.filter(col("is_bench")).select(col("gram")).distinct()
    shingles.filter(!col("is_bench"))
      .join(bench.withColumn("__hit", lit(1)), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 6)
          .as("contamination"))
  }

  /** Concat-and-chunk sequence packing — the pre-training batch-prep
    * step: all documents' tokens are notionally concatenated in doc_id
    * order and cut every `capacity` tokens; each document lands at a
    * global token offset, from which its pack id, offset within the pack,
    * and the number of packs it straddles follow arithmetically.
    *
    * The global prefix sum is the scale-relevant part and is computed in
    * TWO PHASES: an intra-bucket running sum (window partitioned by a
    * doc_id bucket — parallel) plus per-bucket base offsets from
    * [[GlobalOrder.prefixSums]] (range shuffle + O(partitions) driver
    * longs — the bucket table is corpus/bucketSize-sized, so an
    * unpartitioned cumulative window over it would still be a
    * corpus-proportional single task at 10¹² docs). No unpartitioned
    * window ever touches a data-sized row set.
    */
  def packSequences(
      docs: DataFrame,
      capacity: Long = 2048,
      bucketSize: Long = 4096): DataFrame = {
    require(capacity >= 1 && bucketSize >= 1)
    val toks = docs
      .select(col("doc_id"), TextFunctions.wordCount(col("text")).as("tokens"))
      .filter(col("tokens") >= 1)
      .withColumn("bucket", expr(s"doc_id div $bucketSize"))
    val intra = toks.withColumn("run",
      sum(col("tokens")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bases = GlobalOrder.prefixSums(
        toks.groupBy(col("bucket")).agg(sum(col("tokens")).as("bsum")),
        Seq(col("bucket")), "bsum", "__pfx")
      .select(col("bucket"), (col("__pfx") - col("bsum")).as("base"))
    // no broadcast hint: the bucket table is corpus/bucketSize-sized, so
    // the equi-join must be free to shuffle at scale (AQE broadcasts it
    // whenever it is actually small)
    intra.join(bases, Seq("bucket"))
      .withColumn("off", col("base") + col("run") - col("tokens"))
      .select(col("doc_id"), col("tokens"),
        expr(s"off div $capacity").as("pack_id"),
        expr(s"off % $capacity").as("pack_offset"),
        (expr(s"(off + tokens - 1) div $capacity") -
          expr(s"off div $capacity") + lit(1L)).as("n_spans"))
  }

  /** Leakage-safe train/val/test split: the split is decided per
    * DUPLICATE GROUP (exact-fingerprint), not per document, so a document
    * and its duplicates can never straddle splits — the train/test
    * contamination vector naive row-hash splitting leaves open. Group
    * key is the group's min doc_id; the split hash is the engine's
    * portable md5 recipe. Near-dup-safe splitting plugs a MinHash
    * cluster id in as the group key — same shape.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val grouped = docs
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .withColumn("gkey",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    val pct = conv(
      substring(md5(col("gkey").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100
    grouped
      .withColumn("split",
        when(pct < trainPct, "train")
          .when(pct < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("gkey"), col("split"))
  }

  /** Quality + language + dedup filter.
    *
    * Keeps documents with at least `minWords` words and `minAlphaRatio`
    * alphabetic character ratio, whose deterministic language guess is in
    * `langs` (empty set = keep all), deduplicated on the normalized-text
    * fingerprint keeping the smallest id.
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      minAlphaRatio: Double = 0.5,
      langs: Set[String] = Set.empty): DataFrame = {
    val t = col(textCol)
    val gated = df
      .withColumn("n_words", TextFunctions.wordCount(t))
      .withColumn("alpha_ratio",
        TextFunctions.alphaChars(t).cast("double") / length(t).cast("double"))
      .withColumn("lang_pred", TextFunctions.langId(t))
      .filter(col("n_words") >= minWords && col("alpha_ratio") >= minAlphaRatio)
    val langGated =
      if (langs.isEmpty) gated
      else gated.filter(col("lang_pred").isin(langs.toSeq: _*))
    val w = Window
      .partitionBy(TextFunctions.fingerprint(t))
      .orderBy(col(idCol))
    langGated
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Corpus vocabulary with rank-assigned token ids — the tokenizer-prep
    * step: the `topN` most frequent words (ties broken lexicographically),
    * each with its corpus frequency, document frequency, and the running
    * share of all corpus tokens the vocabulary covers up to that rank.
    *
    * Scale shape: the word counting is a map-side-combined hash aggregate
    * over exploded words (corpus-sized, fully distributed); the top-N cut
    * is a distributed TakeOrderedAndProject (per-partition top-N, merge of
    * N·partitions survivors — a web corpus has billions of DISTINCT
    * tokens, so even the vocab domain must never hit a single-partition
    * sort); only the topN-row result sees a ranking window.
    */
  /** POSITIONAL inverted index — the retrieval structure BM25/TF-IDF
    * scoring (q85/q96) can't provide: per (term, doc), the sorted word
    * positions. Build is one corpus explode + one aggregation (the index
    * scales with corpus token count and shuffles by term — the natural
    * partitioning for a term-addressed probe); phrase queries then touch
    * only the phrase's term rows.
    */
  def positionalIndex(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextFunctions.words(col("text"))).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))

  /** Exact phrase match against a [[positionalIndex]]: docs containing
    * `terms` CONSECUTIVELY, with the occurrence count. The classic
    * positions-intersection walk — start from the first term's
    * positions, and for each next term keep `prev+1 ∩ positions(term)`;
    * whatever survives marks a full phrase occurrence. Each step is an
    * equi-join on doc_id over ONLY the term's index rows (the index
    * prunes by term before any join), with local array arithmetic — no
    * text is ever re-scanned.
    */
  def phraseMatch(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val first = index.filter(col("term") === terms.head)
      .select(col("doc_id"), col("positions").as("cur"))
    terms.tail.foldLeft(first) { (acc, t) =>
      acc.join(index.filter(col("term") === t)
          .select(col("doc_id"), col("positions").as("nxt")), Seq("doc_id"))
        .select(col("doc_id"),
          array_intersect(transform(col("cur"), p => p + 1), col("nxt")).as("cur"))
        .filter(size(col("cur")) > 0)
    }.select(col("doc_id"), size(col("cur")).cast("long").as("n_occ"))
  }

  def vocabulary(docs: DataFrame, topN: Int = 1000): DataFrame = {
    // localCheckpoint so the total-tokens branch and the top-N branch both
    // read the materialized vocab domain instead of re-running the corpus
    // scan + word explode (the domain is distinct-word-sized, distributed)
    val counts = docs
      .select(col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"), count_distinct(col("doc_id")).as("df"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("cnt")).cast("double").as("__total"))
    // TakeOrderedAndProject: each partition keeps its own top-N, then the
    // N·partitions survivors merge — no full-domain single-partition sort
    // ever forms (the r8 scale-cliff fix); the ranking window below runs
    // over the ALREADY-LIMITED topN-row frame, which is parameter-sized.
    val top = counts.orderBy(col("cnt").desc, col("w")).limit(topN)
    val rk = Window.orderBy(col("cnt").desc, col("w"))
    val cum = Window.orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .crossJoin(broadcast(total))
      .withColumn("rn", row_number().over(rk))
      .select(
        (col("rn") - 1).cast("long").as("token_id"), col("w"), col("cnt"),
        col("df"),
        round(sum(col("cnt")).over(cum).cast("double") / col("__total"), 9)
          .as("coverage"))
  }

  /** Tokenizer-coverage audit: per-language OOV rate against the topN
    * frequency vocabulary ([[vocabulary]]'s ranking rule — count desc,
    * word asc) — the number a tokenizer build is judged by before it
    * ships, and the per-language fairness lens (a shared vocab
    * under-serves low-resource languages first). Two corpus passes by
    * design (count, then apply — the same split a production vocab
    * build/apply pipeline has); the vocab side is topN rows and
    * broadcasts, so the apply pass is a map-side join. Rates derive from
    * exact integer token counts; the only double op is the final
    * division.
    */
  def oovRate(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(TextFunctions.words(col("text"))).as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // distributed top-N (TakeOrderedAndProject) — membership needs no rank
    // column at all, so no window touches the word domain (q156 posture)
    val vocab = counts.orderBy(col("cnt").desc, col("w")).limit(topN)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1).otherwise(0)).cast("long").as("n_oov"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
  }

  /** First-iteration BPE merge statistics: the frequency of every adjacent
    * character pair inside words, weighted by word frequency — the pair
    * counts a byte-pair-encoding trainer ranks to pick its next merge.
    * Returns the `topN` pairs with their total weighted count and the
    * number of distinct words containing them.
    *
    * The quadratic-looking step is linear: pairs explode per CHARACTER of
    * the distinct-word table (already aggregated, tiny vs the corpus), and
    * the corpus itself is read once for the word counts.
    */
  def bpePairStats(docs: DataFrame, topN: Int = 100): DataFrame = {
    val wordCounts = docs
      .select(explode(TextFunctions.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val pairs = wordCounts
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("cnt"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("w"), col("cnt"))
      .groupBy(col("pair"))
      .agg(sum(col("cnt")).as("total"), count_distinct(col("w")).as("n_words"))
    pairs.orderBy(col("total").desc, col("pair")).limit(topN)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("total").desc, col("pair"))).cast("long"))
      .select(col("rk"), col("pair"), col("total"), col("n_words"))
  }

  /** Pinned Gopher-rule stopword list (Rae et al. 2021's "must contain
    * at least 2 of" set) — shared verbatim with the oracle SQL.
    */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER-STYLE RULE GATE — the composite heuristic filter battery of
    * the Gopher/MassiveText cleaning stage, complementing the engine's
    * single-signal gates (q29 surface stats, q176 entropy, q139
    * repetition, q241 lexicon): per document, mean word length (3–10
    * band), the share of words containing an alphabetic character
    * (≥ 0.8), the symbol-to-word ratio (# and … hashes/ellipses,
    * ≤ 0.1), and the must-contain-2-of-8-stopwords rule — plus the
    * single pass/fail verdict the pipeline actually branches on.
    *
    * One corpus scan, all signals as array expressions over the split
    * word list (no explode — nothing leaves the row), ratios rounded
    * once to the 1e-6 grid; thresholds are pinned literals shared with
    * the oracle.
    */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10): DataFrame = {
    val ws = TextFunctions.words(col(textCol))
    val nWords = size(ws).cast("long")
    val meanLen = aggregate(transform(ws, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x).cast("double") / nWords.cast("double")
    val alphaShare = size(filter(ws, w => w.rlike("[a-z]"))).cast("double") /
      nWords.cast("double")
    val symbols = (regexp_count(col(textCol), lit("#")) +
      regexp_count(col(textCol), lit("\\.\\.\\."))).cast("long")
    val symbolRatio = symbols.cast("double") / nWords.cast("double")
    val stopHits = size(filter(
      array(GopherStops.map(lit): _*), s => array_contains(ws, s)))
      .cast("long")
    docs.select(col(idCol).as("doc_id"), nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(alphaShare, 6).as("alpha_word_share"),
        symbols.as("n_symbols"),
        round(symbolRatio, 6).as("symbol_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("pass",
        col("n_words") >= minWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("alpha_word_share") >= 0.8 &&
          col("symbol_ratio") <= 0.1 &&
          col("stop_hits") >= 2L)
  }

  /** DSIR-STYLE IMPORTANCE WEIGHTS for data selection (hashed-feature
    * importance resampling, Xie et al. 2023) — the principled upgrade of
    * threshold quality gates: score every raw document by how much more
    * likely its hashed-unigram profile is under the TARGET distribution
    * (e.g. the wiki-like slice you want more of) than under the raw
    * corpus, then sample by weight. log w(doc) = Σ_tokens [ln p̂_t(b) −
    * ln p̂_s(b)] over `buckets` hashed word buckets with add-one
    * smoothing — the bucket trick that makes the estimator work at any
    * vocabulary size with two fixed-size censuses.
    *
    * Scale shape: ONE corpus explode lands on the (doc, bucket) census
    * (localCheckpoint'd — bounded by docs × buckets), from which both
    * global bucket censuses AND the per-doc probe read; the log-ratio
    * table is `buckets` rows and broadcasts. Exactness: each bucket's
    * log-ratio is ln over EXACT DECIMAL(38,0) integer cross-products
    * ((ct+1)·(Ns+B) vs (cs+1)·(Nt+B) — the q256/q466 discipline),
    * rounded once to the 1e-9 grid; per-doc log-weights are then
    * count×grid-decimal products — order-independent exact sums.
    */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2, "need at least 2 hash buckets")
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val dcb = docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"),
        explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("b",
        conv(substring(md5(col("w")), 1, 13), 16, 10).cast("long")
          % buckets)
      .groupBy(col("doc_id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // three readers, one corpus explode
    val srcC = dcb.groupBy(col("b")).agg(sum(col("cnt")).as("cs"))
    val tgtC = dcb.filter(col("is_target"))
      .groupBy(col("b")).agg(sum(col("cnt")).as("ct"))
    val totals = srcC.agg(sum(col("cs"))).head() ->
      tgtC.agg(sum(col("ct"))).head()
    require(!totals._1.isNullAt(0) && !totals._2.isNullAt(0),
      "dsirWeights: empty corpus or empty target slice")
    val (ns, nt) = (totals._1.getLong(0), totals._2.getLong(0))
    val lr = srcC.join(tgtC, Seq("b"), "left")
      .select(col("b"),
        round(log(
          dbl((coalesce(col("ct"), lit(0L)) + 1L).cast(d38) *
            lit(ns + buckets).cast(d38)) /
          dbl((col("cs") + 1L).cast(d38) * lit(nt + buckets).cast(d38))),
          9).cast(DecimalType(18, 9)).as("lr"))
    dcb.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt").cast(DecimalType(18, 0)) * col("lr")).as("__lw"))
      .select(col("doc_id"), col("n_tokens"),
        round(dbl(col("__lw")), 6).as("log_weight"),
        (dbl(col("__lw")) > 0.0).as("target_like"))
  }

  /** MULTI-ITERATION BPE TRAINER — the actual tokenizer-prep artifact
    * [[bpePairStats]] only computes the first step of: `merges` rounds of
    * (count adjacent symbol pairs weighted by word frequency → pick the
    * most frequent pair → merge it everywhere), returning the ordered
    * merge table (rank, lft, rgt, merged, total) a BPE tokenizer ships.
    *
    * Representation: each word's symbol sequence is ONE delimited string
    * (`\u001F tok \u001E` per symbol, both wrappers from outside any text
    * alphabet), so the greedy LEFT-TO-RIGHT NON-OVERLAPPING merge is a
    * single literal `replace` — the semantics `replace` has in both
    * engines, and exactly BPE's scan rule (a merged token can never
    * immediately re-merge with itself: merged = lft||rgt ≠ lft).
    *
    * Scale shape: state is the DISTINCT-WORD table (domain-sized, never
    * the corpus — the corpus is read once for the frequency census); each
    * round is one pair-explode aggregate + a 1-row driver collect (the
    * argmax pair, O(1)) + one map-side replace, with a lineage cut per
    * round. Tie-break: total desc, then (lft, rgt) text asc — total
    * order, so the merge sequence is deterministic and the oracle replays
    * it as `merges` unrolled CTE rounds.
    */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64, "merges must be in [1, 64]")
    val spark = docs.sparkSession
    val sepL = "\u001f"
    val sepR = "\u001e"
    var state = docs
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("seq", concat_ws("",
        transform(split(col("w"), ""),
          c => concat(lit(sepL), c, lit(sepR)))))
      .localCheckpoint(true)
    val log = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (k <- 1 to merges) {
      val toks = state.select(col("cnt"),
        filter(split(col("seq"), s"[$sepR$sepL]"), x => x =!= lit("")).as("t"))
      val top = toks.filter(size(col("t")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("l"),
            element_at(col("t"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("l"), col("r"))
        .limit(1).collect()
      require(top.nonEmpty, s"bpeTrain: no adjacent pairs left at merge $k")
      val (l, r, tot) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      log += ((k.toLong, l, r, l + r, tot))
      state = state.withColumn("seq",
        org.apache.spark.sql.functions.replace(col("seq"),
          lit(sepL + l + sepR + sepL + r + sepR), lit(sepL + l + r + sepR)))
        .localCheckpoint(true)
    }
    import spark.implicits._
    log.toSeq.toDF("rank", "lft", "rgt", "merged", "total")
  }

  /** Character-distribution quality scoring: per-document Shannon entropy
    * of the character histogram, the standard cheap gibberish/boilerplate
    * detector in pretraining filters (near-zero entropy = one repeated
    * character, ~log2(alphabet) = uniform noise; natural English sits
    * around 4–4.5 bits).
    *
    * Plan shape: one corpus scan, explode to (doc, char), a map-side
    * combined count on that pair, then a per-doc rollup — both
    * aggregations shuffle on keys whose cardinality is bounded by
    * docs × alphabet, never by total characters.
    *
    * Parity: entropy = log2(N) - Σ n·log2(n) / N. Each n·log2(n) term is
    * rounded to 9 decimals and accumulated in DECIMAL, so the sum is
    * order-independent and engine-portable; the final statistic is rounded
    * to 6, far above the accumulated error.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(split(col(textCol), "")).as("c"))
      .groupBy(col(idCol), col("c"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).as("n_chars"),
        count(lit(1)).as("n_distinct"),
        sum(round(col("n").cast("double") * log2(col("n").cast("double")), 9)
          .cast(DecimalType(28, 9))).cast("double").as("__s"))
    terms.select(
      col(idCol), col("n_chars"), col("n_distinct"),
      round(log2(col("n_chars").cast("double")) - col("__s") / col("n_chars"), 6)
        .as("entropy"))
  }

  /** Greedy longest-match (maximal-munch) TOKENIZER APPLY — the
    * subword-tokenization step a pre-training pipeline runs over the whole
    * corpus. The vocabulary is the `topWords` most frequent corpus words
    * plus every single character (the guaranteed-progress base alphabet,
    * the WordPiece/BPE fallback convention); each word then tokenizes by
    * repeatedly taking the LONGEST vocabulary entry prefixing its
    * remaining suffix.
    *
    * Scale shape — the q156/q157 discipline: tokenization runs over the
    * DISTINCT-WORD table (vocabulary-sized, not corpus-sized) and joins
    * back by word; the vocabulary itself is broadcast (a tokenizer vocab
    * is constant-size by construction, so the prefix theta-join is a
    * broadcast against a bounded list, never a shuffle). The iteration
    * count is the longest word's length, with per-step lineage cuts.
    *
    * Determinism: two same-length vocabulary entries prefixing the same
    * suffix are the same string, so the longest match is unique; the
    * (length, token) struct-max makes the argmax explicit anyway.
    */
  def tokenizeGreedy(
      docs: DataFrame,
      textCol: String,
      topWords: Int = 15): DataFrame = {
    val words = docs.select(explode(TextFunctions.words(col(textCol))).as("w"))
    val freq = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .localCheckpoint(true)
    val top = freq.orderBy(col("freq").desc, col("w")).limit(topWords)
      .select(col("w").as("tok"))
    val chars = freq
      .select(explode(split(col("w"), "")).as("tok"))
      .filter(length(col("tok")) === 1).distinct()
    val vocab = top.unionByName(chars).distinct().localCheckpoint(true)
    val maxLen = freq.agg(max(length(col("w")))).head().getInt(0)
    var state = freq.select(col("w"), col("freq"), col("w").as("rest"),
      expr("cast(array() as array<string>)").as("toks"))
    for (_ <- 0 until maxLen) {
      val matched = state.filter(length(col("rest")) > 0)
        .join(broadcast(vocab), expr("startswith(rest, tok)"))
        .groupBy(col("w"))
        .agg(max(struct(length(col("tok")).as("l"), col("tok").as("t"))).as("m"))
        .select(col("w"), col("m.t").as("take"))
      state = state.join(matched, Seq("w"), "left")
        .select(col("w"), col("freq"),
          when(col("take").isNotNull,
            expr("substring(rest, length(take) + 1)")).otherwise(col("rest"))
            .as("rest"),
          when(col("take").isNotNull, concat(col("toks"), array(col("take"))))
            .otherwise(col("toks")).as("toks"))
        .localCheckpoint(true)
    }
    // the single-character alphabet makes progress certain; a leftover
    // suffix means the input grew past the measured max length mid-plan
    require(state.filter(length(col("rest")) > 0).isEmpty,
      "tokenizer failed to consume every word")
    state.select(col("w"), col("freq"),
      size(col("toks")).cast("long").as("n_tokens"),
      array_join(col("toks"), "|").as("tokens"))
  }

  /** Line-level boilerplate removal — the CCNet-shaped dedup pass that
    * works at LINE granularity instead of document granularity: any line
    * whose distinct-document frequency reaches `maxDocFreq` is boilerplate
    * (navigation bars, cookie banners, license headers) and is stripped
    * from every document; survivors are reassembled in original order.
    *
    * The corpus here carries no newlines, so "lines" are the deterministic
    * `lineWords`-word windows of the normalized text (declared input
    * synthesis, the q140/q158 pattern) — on real data the split column
    * would be the newline-separated line itself.
    *
    * Plan shape: one corpus scan explodes to (doc, line_no, line); the
    * document-frequency aggregate shuffles on the line value (cardinality =
    * distinct lines, which a hash-partitioned count-distinct handles at any
    * scale); the per-document reassembly is one more shuffle on doc_id with
    * a sorted in-group collect whose size is the document's own line count.
    * Nothing is corpus-global, no window spans the corpus.
    *
    * Output: (doc_id, n_lines, n_kept, clean_md5) where clean_md5 hashes
    * the space-joined surviving lines ('' when every line was boilerplate).
    */
  def lineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lineWords: Int = 8,
      maxDocFreq: Long = 2): DataFrame = {
    require(lineWords > 0 && maxDocFreq > 1,
      "need a positive line width and a boilerplate threshold above 1")
    val lines = docs
      .withColumn("__w", TextFunctions.words(col(textCol)))
      .select(col(idCol).as("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, cast(floor((size(__w) - 1) / $lineWords) as int)),
             |          i -> array_join(slice(__w, i * $lineWords + 1, $lineWords), ' '))"""
            .stripMargin)).as(Seq("line_no", "line")))
    val lineDf = lines
      .groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("line_df"))
    lines
      .join(lineDf, Seq("line"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line_df") < maxDocFreq, 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(
          expr("transform(array_sort(collect_list(" +
            s"CASE WHEN line_df < $maxDocFreq THEN struct(line_no, line) END)), x -> x.line)"),
          " ")).as("clean_md5"))
  }

  /** Per-document lexical diversity: token count, type (distinct-word)
    * count, type/token ratio, and hapax-legomena ratio (words occurring
    * exactly once). Low TTR flags boilerplate and template spam; a
    * degenerate hapax profile flags machine-generated filler — both
    * standard corpus-quality gates beside q29's surface stats. One
    * per-(doc, word) combine then a per-doc fold: the two-level
    * aggregation is map-side combinable at any scale, no windows.
    */
  /** GAZETTEER TAGGING — dictionary-lookup entity marking, the
    * retrieval-free tagger every extraction pipeline starts with: given
    * a TERM LIST (product vocabulary, place names, a blocklist), mark
    * each document with how much of it is dictionary mass — matched
    * token count, distinct matched terms, coverage share, and the
    * dominant term. The routing signal beside q30's language-ID and
    * q241's lexicon flags: "which catalog concepts does this doc talk
    * about, and how hard".
    *
    * Scale shape: the gazetteer is BROADCAST (dictionaries are
    * answer-sized; a billion-row corpus streams past it map-side), both
    * aggregations are map-side combinable, and the only window runs
    * over per-doc MATCHED-TERM rows (doc-bounded, never corpus-keyed).
    * Tokenization is the corpus-standard whitespace fold shared with
    * [[lexicalDiversity]] so coverage composes with q31's token counts.
    * The dominant term breaks count ties LEXICOGRAPHICALLY (row_number
    * over (count desc, term) — deterministic in both engines, where an
    * arg_max tie would be engine-arbitrary). Unmatched docs read zero
    * counts and a NULL top term. O(docs) rows out.
    */
  def gazetteerTag(
      df: DataFrame,
      idCol: String,
      textCol: String,
      gazetteer: DataFrame,
      termCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("did"),
      explode(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
        " ")).as("w"))
    val dict = gazetteer
      .select(lower(trim(col(termCol))).as("term")).distinct()
    val tot = toks.groupBy(col("did")).agg(count(lit(1)).as("n_tokens"))
    val mc = toks.join(broadcast(dict), col("w") === col("term"))
      .groupBy(col("did"), col("w")).agg(count(lit(1)).as("c"))
    val byDoc = Window.partitionBy(col("did"))
      .orderBy(col("c").desc, col("w"))
    val stats = mc.withColumn("rn", row_number().over(byDoc))
      .groupBy(col("did"))
      .agg(sum(col("c")).as("n_matched"), count(lit(1)).as("n_terms"),
        max(when(col("rn") === 1, col("w"))).as("top_term"),
        max(when(col("rn") === 1, col("c"))).as("top_count"))
    tot.join(stats, Seq("did"), "left")
      .select(col("did").as(idCol), col("n_tokens"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        round(coalesce(col("n_matched"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("coverage"),
        col("top_term"),
        coalesce(col("top_count"), lit(0L)).as("top_count"))
      .orderBy(col(idCol))
  }

  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val words = df.select(col(idCol),
      explode(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
        " ")).as("w"))
    words.groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("hapax_ratio",
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6))
  }

  /** Zipf-law fit over the corpus frequency spectrum: OLS of ln(count) on
    * ln(rank) for the top `topN` words — slope ≈ -1 is the healthy
    * natural-text signature; a flat slope flags templated/duplicated
    * corpora and a cliff flags a vocabulary dominated by boilerplate.
    *
    * Exactness discipline (the q256 pattern): each per-rank term is
    * rounded to 9 decimals and cast to DECIMAL(18,9) BEFORE summing, so
    * the four OLS sums are order-independent exact decimal adds — a raw
    * double sum would hash differently under different partition orders.
    * The rank window runs over the topN-sized aggregate, not the corpus.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = df.select(explode(split(
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // distributed top-N first (TakeOrderedAndProject), then the rank
    // window runs over the topN-row frame only — never the word domain
    val ranked = counts.orderBy(col("cnt").desc, col("w").asc).limit(topN)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("w").asc)))
    val lx = log(col("rn").cast("double"))
    val ly = log(col("cnt").cast("double"))
    def term(c: Column): Column = round(c, 9).cast(DecimalType(18, 9))
    val sums = ranked.agg(
      count(lit(1)).as("n"),
      sum(term(lx)).as("sx"), sum(term(ly)).as("sy"),
      sum(term(lx * lx)).as("sxx"), sum(term(lx * ly)).as("sxy"))
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    sums.select(col("n"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / nD, 6).as("intercept"))
  }

  /** LANGUAGE-MIXTURE profile — the CODE-SWITCHING detector q30's
    * argmax hides: per doc, the marker-score posterior over the language
    * set, its entropy, and a mixed flag (≥ 2 languages hit AND no
    * language holds > 75% of the marker mass). Mixed documents are the
    * rows a per-language pipeline silently mangles (wrong tokenizer,
    * wrong quality thresholds) — route them, don't argmax them. Same
    * replace-shrinkage marker counts as q30 (exact integers), per-row
    * fixed-order entropy terms on the 1e-9 grid; zero-marker docs emit
    * NULL entropy and mixed = false.
    */
  def langMixture(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = TextFunctions.langMarkers.map(_._1)
    val scored = docs.select(col(idCol) +: langs.map(l =>
      TextFunctions.langScore(col(textCol), l).cast("long").as(s"s_$l")): _*)
    val total = langs.map(l => col(s"s_$l")).reduce(_ + _)
    val nLangs = langs.map(l =>
      when(col(s"s_$l") > 0L, 1L).otherwise(0L)).reduce(_ + _)
    def dbl(c: Column): Column = c.cast("double")
    val entropy = langs.map { l =>
      val p = dbl(col(s"s_$l")) / dbl(col("total"))
      when(col(s"s_$l") > 0L, round(-(p * log(p)), 9)
        .cast(DecimalType(18, 9)))
        .otherwise(lit(0).cast(DecimalType(18, 9)))
    }.reduce(_ + _)
    val maxShare = dbl(greatest(langs.map(l => col(s"s_$l")): _*)) /
      dbl(col("total"))
    scored.withColumn("total", total)
      .select(col(idCol), col("total").as("total_markers"),
        nLangs.as("n_langs"),
        when(col("total") > 0L, entropy.cast("double")).as("mix_entropy"),
        (col("total") > 0L && nLangs >= 2L && maxShare <= 0.75)
          .as("mixed"))
  }

  /** HEAPS'-LAW fit — vocabulary growth V(T) ≈ K·T^β over the corpus in
    * document order: the sub-linearity exponent that says how fast NEW
    * types keep arriving as tokens accumulate (β near 1 = vocabulary
    * still exploding, the signature of leaking junk/IDs past the quality
    * gates; ~0.4–0.6 = healthy natural-language growth) — the capacity
    * planner beside q510's fixed-corpus coverage curve and q377's
    * unseen-mass estimate. Distributed shape: doc positions and both
    * running totals ride [[graft.operators.GlobalOrder]] (range-
    * partitioned rank + prefix sums — never a global rank window); each
    * type's FIRST position is one census, V(n) is the prefix sum of the
    * per-position new-type counts; the log-log OLS uses the q277 grid
    * discipline over the doc-position domain.
    */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("d"),
        size(TextFunctions.words(col(textCol))).cast("long").as("nw"))
    val pos = graft.operators.GlobalOrder
      .rowNumbers(perDoc, Seq(col("d")), idCol = "pos")
      .localCheckpoint(true) // doc-domain frame, three readers below
    val toks = graft.operators.GlobalOrder
      .prefixSums(pos, Seq(col("pos")), "nw", outCol = "toks")
    val firstPos = docs
      .select(col(idCol).as("d"),
        explode(TextFunctions.words(col(textCol))).as("w"))
      .join(pos.select(col("d"), col("pos")), Seq("d"))
      .groupBy(col("w")).agg(min(col("pos")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("nn"))
    val curve = graft.operators.GlobalOrder.prefixSums(
      toks.join(firstPos, toks("pos") === firstPos("fp"), "left")
        .select(col("pos"), col("toks"), coalesce(col("nn"), lit(0L)).as("nn")),
      Seq(col("pos")), "nn", outCol = "vocab")
    val lx = log(col("toks").cast("double"))
    val ly = log(col("vocab").cast("double"))
    def term(c: Column): Column = round(c, 9).cast(DecimalType(18, 9))
    val sums = curve.filter(col("toks") > 0L && col("vocab") > 0L).agg(
      count(lit(1)).as("n_docs"),
      max(col("toks")).as("n_tokens"), max(col("vocab")).as("vocab"),
      sum(term(lx)).as("sx"), sum(term(ly)).as("sy"),
      sum(term(lx * lx)).as("sxx"), sum(term(lx * ly)).as("sxy"))
    val nD = col("n_docs").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    sums.select(col("n_docs"), col("n_tokens"), col("vocab"),
      round(slope, 6).as("beta"),
      round((sy - slope * sx) / nD, 6).as("ln_k"))
  }

  /** GOOD–TURING unseen-mass estimate per language slice: the fraction
    * of the NEXT token expected to be a never-seen type, estimated by
    * the singleton mass N₁/N (Good 1953) — the "how much of this
    * language's vocabulary does my corpus still not know" number that
    * ranks slices by coverage risk before a tokenizer or LM trains on
    * them (OOV rate q262 measures against a FIXED vocab; this needs no
    * vocab at all). Two map-side-combined censuses — tokens to the
    * (lang, type) domain, then type frequencies to the count-of-counts
    * domain — so nothing past the first aggregate is corpus-sized.
    * Integer counts throughout, one final division on the 1e-6 grid.
    */
  def goodTuring(docs: DataFrame, langCol: String): DataFrame = {
    val types = docs
      .select(col(langCol).as("lang"),
        explode(TextFunctions.words(col("text"))).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
    types.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        col("n_singletons"), col("n_doubletons"),
        round(col("n_singletons").cast("double") /
          col("n_tokens").cast("double"), 6).as("unseen_mass"))
  }

  /** Interpolated KNESER–NEY bigram scoring — the real-LM upgrade of the
    * raw-MLE bigram surprisal: every in-doc transition (per-doc BOS
    * sentinel) is scored −ln P_KN(w|prev) with absolute discount D and
    * the CONTINUATION-count back-off that makes KN the standard n-gram
    * smoother:
    *
    *   P_KN(w|prev) = ( max(c(prev,w) − D, 0)
    *                    + D · N1+(prev,·) · N1+(·,w) / N1+(··) ) / c(prev)
    *
    * N1+(prev,·)/N1+(·,w) are DISTINCT follower/predecessor type counts
    * and N1+(··) the bigram-type total — "how many contexts has w opened"
    * rather than "how often has w occurred", the correction that stops
    * frequent-but-context-bound words (the "San Francisco" effect) from
    * dominating the back-off.
    *
    * Scale shape: everything derives from ONE bigram-type census
    * (map-side-combined, type-domain-sized, localCheckpoint'd because
    * four downstream branches reuse it); the corpus-sized work is the
    * census scan and the final probe join. The probability is ONE pinned
    * double expression — identical literal order both engines — rounded
    * to the 1e-9 grid before the order-independent per-doc DECIMAL sum
    * (§6 discipline). Every observed type has N1+(·,w) >= 1 (each token
    * is somebody's successor, BOS included), so the back-off term is
    * never zero and the log is total.
    */
  def knBigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0,1)")
    val words = docs.select(col(idCol).as("doc_id"),
      posexplode(split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
        " ")).as(Seq("pos", "w")))
    val big = words
      .withColumn("prev", coalesce(
        lag(col("w"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))),
        lit("<s>")))
      .select(col("doc_id"), col("prev"), col("w"))
    val cPair = big.groupBy(col("prev"), col("w"))
      .agg(count(lit(1)).as("c_pair"))
      .localCheckpoint(true) // reused by cf / ct / the type total / probe
    val cFirst = cPair.groupBy(col("prev"))
      .agg(sum(col("c_pair")).as("c_first"), count(lit(1)).as("n_after"))
    val cont = cPair.groupBy(col("w")).agg(count(lit(1)).as("n_prec"))
    val nTypes = cPair.agg(count(lit(1)).as("n_types"))
    def dbl(c: Column): Column = c.cast("double")
    val p = (greatest(dbl(col("c_pair")) - lit(discount), lit(0.0)) +
      lit(discount) * dbl(col("n_after")) *
        (dbl(col("n_prec")) / dbl(col("n_types")))) / dbl(col("c_first"))
    big.join(cPair, Seq("prev", "w")).join(cFirst, Seq("prev"))
      .join(cont, Seq("w")).crossJoin(broadcast(nTypes))
      .select(col("doc_id"),
        round(-log(p), 9).cast(DecimalType(28, 9)).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6)
          .as("avg_nll"))
  }

  /** PMI COLLOCATIONS — ordered adjacent word pairs that co-occur far
    * more than their margins predict: PMI = ln(N·c_xy / (c_x·c_y)) with
    * c_x / c_y the bigram LEFT/RIGHT margins (so the contingency sums
    * close; documented convention). The phrase-DISCOVERY tool beside
    * [[rakeKeywords]] (which scores stopword-free runs) — PMI finds
    * "san francisco" even when both words are common, because it
    * corrects for the margins.
    *
    * One explode + lead pass builds bigrams (doc-partitioned window);
    * everything after is bigram-domain-sized. PMI is ln over EXACT
    * integer cross-products (DECIMAL38, the q256 discipline), min-count
    * support keeps noise pairs out, ties rank by pair text.
    */
  def pmiCollocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int = 3,
      topN: Int = 30): DataFrame = {
    require(minCount >= 1 && topN >= 1)
    val d38 = DecimalType(38, 0)
    def dbl(c: Column): Column = c.cast("double")
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val bigrams = docs.select(col(idCol).as("id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(w))
      .filter(col("w2").isNotNull && col("w1") =!= "" && col("w2") =!= "")
      .select(col("w1"), col("w2"))
    val pairC = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))
    val leftC = pairC.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
    val rightC = pairC.groupBy(col("w2")).agg(sum(col("c_xy")).as("c_y"))
    val scored = pairC.filter(col("c_xy") >= minCount.toLong)
      .join(leftC, "w1").join(rightC, "w2")
    // margins and N come from the FULL bigram census (not the supported
    // subset) or PMI would be biased upward
    val nAll = pairC.agg(sum(col("c_xy")).as("n_all"))
    val pmi = log(dbl(col("n_all").cast(d38) * col("c_xy").cast(d38)) /
      dbl(col("c_x").cast(d38) * col("c_y").cast(d38)))
    scored.crossJoin(broadcast(nAll))
      .withColumn("pmi", round(pmi, 6))
      // distributed top-N over the supported-bigram domain, then rank the
      // topN-row survivors — no full-domain unpartitioned window
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c_xy"), col("pmi"))
  }

  /** Pinned RAKE stopword/delimiter list — shared verbatim with the
    * oracle SQL so candidate segmentation is engine-identical.
    */
  val RakeStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for",
    "with", "as", "by", "at", "or", "be", "this", "that", "it", "from")

  /** RAKE keyword extraction (Rose et al. 2010) — the PHRASE-level
    * keyword ranker beside q423's single-word TextRank: candidate
    * phrases are maximal stopword-free word runs, each word scores
    * degree/frequency over the candidate corpus (degree = Σ lengths of
    * the phrases containing it — co-occurrence credit that favors words
    * living in longer collocations), and a phrase scores the sum of its
    * words' scores. Top-N distinct phrases by score.
    *
    * Scale: one explode pass; phrase segmentation is a per-doc
    * stopword-prefix-sum island (doc-partitioned windows only); word
    * stats and the final ranking live on the word/phrase DOMAIN, never
    * the corpus. Exactness: degree/freq is one IEEE division quantized
    * to DECIMAL(18,9) per word, phrase scores are order-independent
    * decimal sums, identical phrase text ⇒ identical score (word stats
    * are corpus-global), so the cross-doc dedup's MAX(score) is exact;
    * ties rank by phrase text.
    */
  def rakeKeywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1)
    val toks = docs.select(col(idCol).as("id"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "w")))
      .withColumn("stop",
        col("w").isin(RakeStopwords: _*) || col("w") === "")
    val run = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ph = toks
      .withColumn("grp", sum(when(col("stop"), 1L).otherwise(0L)).over(run))
      .filter(!col("stop"))
      .withColumn("plen",
        count(lit(1)).over(Window.partitionBy(col("id"), col("grp"))))
    val wstats = ph.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore",
        round(col("deg").cast("double") / col("freq").cast("double"), 9)
          .cast(DecimalType(18, 9)))
    val phrases = ph.join(wstats.select(col("w"), col("wscore")), "w")
      .groupBy(col("id"), col("grp"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          _.getField("w")), " ").as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("wscore")).as("score"))
    phrases.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score"))
      // distributed top-N over the phrase domain, then rank the topN rows
      .orderBy(col("score").desc, col("phrase")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("phrase"))).cast("long"))
      .select(col("rank"), col("phrase"), col("n_words"),
        col("n_occurrences"), round(col("score").cast("double"), 6)
          .as("score"))
  }

  /** VOCABULARY COVERAGE curve — what share of corpus TOKENS the top-K
    * vocabulary types cover, at each candidate K: the table that sizes
    * a tokenizer's vocab budget (q156 builds the vocab, q262 reads the
    * OOV rate at ONE cut; this is the whole curve the cut is chosen
    * from). The top-K cut is a distributed TakeOrderedAndProject (never
    * a full-domain rank window — the retired-q156-plan lesson); only the
    * parameter-sized K_max frame meets a ranking window; coverage is an
    * exact token-count ratio per K.
    */
  def vocabCoverage(
      docs: DataFrame,
      textCol: String,
      ks: Seq[Int]): DataFrame =
    vocabCoverageFromCensus(
      docs.select(explode(TextFunctions.words(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n")), ks)

  /** [[vocabCoverage]] computed from a (w, n) TOKEN CENSUS — rows of
    * partials (e.g. the streaming store's per-batch commits). Counts
    * ADD, so however the partials were batched the merged census — and
    * every output bit — equals the one-pass [[vocabCoverage]]; the
    * property that lets the streaming surface share the batch oracle.
    */
  def vocabCoverageFromCensus(censusDf: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.size <= 16,
      "a handful of candidate vocab sizes")
    val census = censusDf
      .groupBy(col("w")).agg(sum(col("n")).as("n"))
      .localCheckpoint(true) // the total AND the top-K cut both read it
    val total = census.agg(sum(col("n")).as("total_tokens"))
    val ord = Window.orderBy(col("n").desc, col("w"))
    val ranked = census.orderBy(col("n").desc, col("w")).limit(ks.max)
      .withColumn("rk", row_number().over(ord).cast("long"))
      .withColumn("cumn", sum(col("n")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true) // one reader per candidate K
    val rows = ks.sorted.map(k => ranked.filter(col("rk") <= k)
      .agg(lit(k.toLong).as("k"), max(col("rk")).as("vocab_used"),
        max(col("cumn")).as("top_tokens")))
      .reduce(_ unionByName _)
    rows.crossJoin(broadcast(total))
      .select(col("k"), col("vocab_used"), col("top_tokens"),
        col("total_tokens"),
        round(col("top_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("coverage"))
  }

  /** LANGID CONFUSION MATRIX — the "measured, not assumed" loop closed
    * for the language gate (q30): predicted vs labeled language as
    * confusion cells with per-cell share-of-label (row-normalized
    * recall decomposition) and the global accuracy broadcast onto every
    * row. A language gate that silently routes 30% of German to
    * `unknown` starves that slice of training data — this is the table
    * that catches it BEFORE the corpus ships. One doc-level scan, then
    * language-domain-sized windows only.
    */
  def langidConfusion(
      docs: DataFrame,
      labelCol: String,
      textCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val cells = docs
      .select(col(labelCol).as("label"),
        TextFunctions.langId(col(textCol)).as("pred"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val byLabel = Window.partitionBy(col("label"))
    val tot = Window.partitionBy()
    cells
      .withColumn("label_n", sum(col("n")).over(byLabel))
      .withColumn("share_of_label",
        round(dbl(col("n")) / dbl(col("label_n")), 6))
      .withColumn("accuracy",
        round(dbl(sum(when(col("label") === col("pred"), col("n"))
          .otherwise(0L)).over(tot)) / dbl(sum(col("n")).over(tot)), 6))
      .select(col("label"), col("pred"), col("n"), col("label_n"),
        col("share_of_label"), col("accuracy"))
  }

  /** TOKENIZER FERTILITY report — the tokenizer-choice audit a
    * multilingual training run starts from: per language, how many
    * BPE-style tokens each whitespace word costs (fertility — the
    * compression-quality number that decides whether a language is
    * over-paying context window) and chars per token, with the exact
    * per-language p90 of per-document fertility so a fat tail of
    * pathological documents can't hide behind the mean.
    *
    * Exactness: per-document fertility is the INTEGER micro-ratio
    * bpe·10⁶ div words (no doubles in the census), the p90 is an exact
    * order statistic from the (lang, fert_ppm) value-domain census with
    * integer ceiling rank (the q318 form — never a per-row sort), and
    * corpus ratios are single pinned divisions over exact long sums.
    * Shape: one doc-level scan, then language-domain-sized everything.
    */
  def tokenizerFertility(
      docs: DataFrame,
      langCol: String,
      textCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val perDoc = docs.select(col(langCol).as("lang"),
        TextFunctions.wordCount(col(textCol)).as("w"),
        TextFunctions.bpeishTokenCount(col(textCol)).as("b"),
        length(col(textCol)).cast("long").as("nchars"))
      .filter(col("w") > 0L)
      .withColumn("fert_ppm", expr("(b * 1000000) div w"))
      .localCheckpoint(true) // feeds the totals AND the p90 census
    val totals = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
        sum(col("b")).as("bpe_tokens"), sum(col("nchars")).as("chars"))
    val census = perDoc.groupBy(col("lang"), col("fert_ppm"))
      .agg(count(lit(1)).as("t"))
    val cum = Window.partitionBy(col("lang")).orderBy(col("fert_ppm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p90 = census
      .withColumn("c", sum(col("t")).over(cum))
      .withColumn("n", sum(col("t")).over(Window.partitionBy(col("lang"))))
      .filter(col("c") >= expr("(9 * n + 9) div 10")) // ceil(0.9 n)
      .groupBy(col("lang"))
      .agg(min(col("fert_ppm")).as("p90_fert_ppm"))
    totals.join(p90, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("words"), col("bpe_tokens"),
        round(dbl(col("bpe_tokens")) / dbl(col("words")), 6).as("fertility"),
        round(dbl(col("chars")) / dbl(col("bpe_tokens")), 6)
          .as("chars_per_token"),
        col("p90_fert_ppm"))
  }

  /** FLESCH READABILITY per document — the classic reading-ease and
    * grade-level meters from three regexp censuses: whitespace words,
    * sentence-terminator runs (floored at 1 — a fragment is one
    * sentence, not a division by zero), and vowel-group runs as the
    * engine-portable syllable proxy (the dictionary-true count needs a
    * lexicon; vowel groups are the standard deterministic stand-in and
    * BOTH engines count them with the same regex). The
    * quality-filtering shelf's interpretable complement to q176's
    * entropy and q482's Gopher gates: a 206.835-scale number editors
    * recognize. Per-row scalar arithmetic, no shuffle — corpus-scan
    * cost at any scale.
    */
  /** FUNCTION-WORD STYLOMETRY between groups — authorship's classic
    * signal: content words track TOPIC, function words track HABIT, so
    * two sources writing about different things in the same house
    * style still read near-identical here (and a style change inside
    * one source is a provenance flag). Per group, the exact count
    * vector over a fixed 10-marker function-word list (replace-
    * shrinkage counting — no tokenize, no explode), then pairwise
    * cosine on the raw count vectors (scale-invariant, so corpus-size
    * imbalance between sources doesn't move it). The census is
    * (groups × 10) rows; the pair sweep runs on that grid, never on
    * text. All-integer until the final cosine division.
    */
  val StyleMarkers: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  def stylometryCosine(
      df: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def dbl(c: Column): Column = c.cast("double")
    val d38 = DecimalType(38, 0)
    val counts = StyleMarkers.zipWithIndex.map { case (m, i) =>
      sum(TextFunctions.markerCount(col(textCol), s" $m ").cast("long"))
        .as(s"m$i")
    }
    val perG = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(counts.head, counts.tail: _*)
    val melted = StyleMarkers.indices.map { i =>
      perG.select(col("g"), lit(i.toLong).as("marker"),
        col(s"m$i").as("cnt"))
    }.reduce(_.unionByName(_)).localCheckpoint(true) // grid: norms + pairs
    val norms = melted.groupBy(col("g"))
      .agg(sum(col("cnt").cast(d38) * col("cnt").cast(d38)).as("nrm2"),
        sum(col("cnt")).as("total"))
    val b = melted.select(col("g").as("g_b"), col("marker"),
      col("cnt").as("cnt_b"))
    val dots = melted.join(b, Seq("marker"))
      .filter(col("g") < col("g_b"))
      .groupBy(col("g").as("g_a"), col("g_b"))
      .agg(sum(col("cnt").cast(d38) * col("cnt_b").cast(d38)).as("dot"))
    dots
      .join(broadcast(norms.select(col("g").as("g_a"),
        col("nrm2").as("n2a"), col("total").as("tot_a"))), Seq("g_a"))
      .join(broadcast(norms.select(col("g").as("g_b"),
        col("nrm2").as("n2b"), col("total").as("tot_b"))), Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("tot_a"), col("tot_b"),
        when(dbl(col("n2a")) > 0.0 && dbl(col("n2b")) > 0.0,
          round(dbl(col("dot")) /
            (sqrt(dbl(col("n2a"))) * sqrt(dbl(col("n2b")))), 6))
          .as("style_cosine"))
      .orderBy(col("g_a"), col("g_b"))
  }

  def readability(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def dbl(c: Column): Column = c.cast("double")
    val base = df.select(col(idCol),
      TextFunctions.wordCount(col(textCol)).as("n_words"),
      greatest(lit(1L),
        regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
        .as("n_sentences"),
      regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
        .as("n_syllables"))
    base.select(col(idCol), col("n_words"), col("n_sentences"),
      col("n_syllables"),
      when(col("n_words") > 0L,
        round(lit(206.835) -
          lit(1.015) * (dbl(col("n_words")) / dbl(col("n_sentences"))) -
          lit(84.6) * (dbl(col("n_syllables")) / dbl(col("n_words"))), 6))
        .as("flesch"),
      when(col("n_words") > 0L,
        round(lit(0.39) * (dbl(col("n_words")) / dbl(col("n_sentences"))) +
          lit(11.8) * (dbl(col("n_syllables")) / dbl(col("n_words"))) -
          lit(15.59), 6)).as("fk_grade"))
  }

  /** SKIP-GRAM PAIR GENERATION with deterministic negative sampling —
    * the word2vec-style training-example factory: every (center,
    * context) token pair within a ±`window` offset, censused across the
    * corpus, plus `negK` hash-drawn negative tokens per surviving pair.
    * The pair census is DOC-KEYED (positions self-join inside one doc —
    * per-doc cost len·window, never corpus²); the vocabulary is ranked
    * (count desc, token asc) once, and each negative is
    * md5('ng:'+center+':'+context+':'+i) mod |V| looked up by rank — a
    * pure function of the pair, so retries, re-partitions and the
    * oracle all draw the SAME negatives (the q268 counter-based-RNG
    * discipline; no RNG state anywhere). Collisions with the positive
    * pair are allowed and documented (standard practice — unigram
    * draws hit positives too). Whitespace tokenization (shared
    * `docwords` convention). Output: top `limit` pairs by (n desc,
    * center, context) with their negatives as columns.
    */
  def skipgramPairs(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      window: Int = 2,
      negK: Int = 2,
      limit: Int = 200): DataFrame = {
    require(window >= 1 && negK >= 1 && limit >= 1)
    val toks = docs.select(col(docIdCol).as("did"),
        posexplode(split(regexp_replace(lower(trim(col(textCol))),
          "\\s+", " "), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
      .localCheckpoint(true) // vocab census + both pair sides read it
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val ranked = vocab.select(col("w").as("vw"),
      (row_number().over(Window.orderBy(col("cnt").desc, col("w"))) - 1)
        .cast("long").as("vid"))
    val vsize = ranked.agg(count(lit(1)).as("vn"))
    val other = toks.select(col("did"), col("pos").as("pos2"),
      col("w").as("ctx"))
    // true equi-join on (did, pos + off): each center row explodes into
    // its 2·window candidate offsets and the join key pins the context
    // position — len·window pair candidates per doc. A doc-id-only join
    // filtered on |pos2 − pos| afterwards would materialize len² rows
    // per doc first (the r11 ADVICE item: exactly the quadratic shape
    // long documents blow up on).
    val offs = ((-window to -1) ++ (1 to window)).map(o => lit(o))
    val pairs = toks
      .withColumn("off", explode(array(offs: _*)))
      .withColumn("pos2", col("pos") + col("off"))
      .join(other, Seq("did", "pos2"))
      .groupBy(col("w").as("center"), col("ctx"))
      .agg(count(lit(1)).as("n"))
    val top = pairs
      .orderBy(col("n").desc, col("center"), col("ctx"))
      .limit(limit)
      .crossJoin(broadcast(vsize))
    val negs = (1 to negK).foldLeft(top) { (acc, i) =>
      val vidCol = pmod(
        conv(substring(md5(concat(lit("ng:"), col("center"), lit(":"),
          col("ctx"), lit(":"), lit(i.toString))), 1, 13), 16, 10)
          .cast("long"),
        col("vn")).as(s"nid$i")
      acc.withColumn(s"nid$i", vidCol)
        .join(broadcast(ranked.select(col("vid").as(s"nid$i"),
          col("vw").as(s"neg$i"))), Seq(s"nid$i"))
    }
    negs.select(Seq(col("center"), col("ctx").as("context"), col("n")) ++
        (1 to negK).map(i => col(s"neg$i")): _*)
      .orderBy(col("n").desc, col("center"), col("context"))
  }

  /** WORD BURSTINESS (Church–Gale adaptation) — the property that
    * separates TOPIC words from FUNCTION words even at equal corpus
    * frequency: topical words CLUMP (if a document mentions a word
    * once it likely repeats it), so per word the census reads cf/df
    * (mean in-document count among containing docs) and the
    * ADAPTATION df2/df = P(repeats | occurs). High-burst words are
    * content anchors; burst ≈ 1 words are glue — the
    * keyword/stopword prior q85's tf-idf assumes but never measures.
    * One word×doc census pass, two pinned divisions per word, df
    * floor, deterministic (burst desc, word) top-k. Whitespace
    * tokenization (the shared `docwords` convention).
    */
  def wordBurstiness(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      minDf: Long = 5L,
      topK: Int = 200): DataFrame = {
    require(minDf >= 1L && topK >= 1)
    def dbl(c: Column): Column = c.cast("double")
    val perDoc = docs.select(col(docIdCol).as("did"),
        explode(split(regexp_replace(lower(trim(col(textCol))),
          "\\s+", " "), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("did"), col("w")).agg(count(lit(1)).as("c"))
    val cen = perDoc.groupBy(col("w"))
      .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("df2"))
      .filter(col("df") >= minDf)
    cen.select(col("w").as("word"), col("cf"), col("df"), col("df2"),
        round(dbl(col("cf")) / dbl(col("df")), 6).as("burst"),
        round(dbl(col("df2")) / dbl(col("df")), 6).as("adaptation"))
      .orderBy(col("burst").desc, col("word"))
      .limit(topK)
  }
}
