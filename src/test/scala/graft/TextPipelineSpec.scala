package graft

import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

class TextPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("repetitionStats finds the dominant n-gram") {
    // "a b a b a b" → 3-grams: "a b a", "b a b", "a b a", "b a b" → 4 grams,
    // max repeat 2; "x y z w" → 2 distinct grams, max 1
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z w"), (3L, "one two"))
      .toDF("doc_id", "text")
    val out = TextPipeline.repetitionStats(docs, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (4L, 2L), 2L -> (2L, 1L)))
    assert(!out.contains(3L), "a doc shorter than one n-gram yields no row")
  }

  test("gazetteerTag: exact match counts, lexicographic tie-break, " +
    "unmatched docs read zeros and a NULL top term") {
    val docs = Seq(
      (1L, "red widget blue bolt red"), // red x2, bolt x1 of 5 tokens
      (2L, "nothing matches here"),
      (3L, "red bolt")) // count tie -> lexicographic first = bolt
      .toDF("doc_id", "text")
    val gaz = Seq("Red", "bolt", "bolt").toDF("term") // dedup + case fold
    val out = TextPipeline.gazetteerTag(docs, "doc_id", "text", gaz, "term")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 5L && d1.getLong(2) == 3L && d1.getLong(3) == 2L,
      s"5 tokens, 3 matched, 2 terms: $d1")
    assert(d1.getDouble(4) == 0.6 && d1.getString(5) == "red" &&
      d1.getLong(6) == 2L, s"coverage and dominant term: $d1")
    val d2 = out(2L)
    assert(d2.getLong(2) == 0L && d2.isNullAt(5) && d2.getLong(6) == 0L,
      s"unmatched doc: $d2")
    assert(out(3L).getString(5) == "bolt",
      s"count tie breaks lexicographically: ${out(3L)}")
  }

  test("redactPii masks emails before digit runs and counts both") {
    val docs = Seq((1L, "mail me at jo.doe+x@site-a.org or call 0123456"))
      .toDF("id", "text")
    val r = TextPipeline.redactPii(docs, "text").head()
    assert(r.getAs[Int]("n_emails") == 1)
    assert(r.getAs[Int]("n_digit_runs") == 1)
    assert(r.getAs[String]("redacted") ==
      "mail me at <EMAIL> or call <NUM>")
  }

  test("contamination scores distinct-shingle overlap against the benchmark") {
    // bench doc 0 carries "p q r s"; doc 1 shares exactly that one of its
    // two distinct 4-grams; doc 2 shares nothing
    val docs = Seq(
      (0L, "p q r s"),
      (1L, "p q r s t"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    val out = TextPipeline.contamination(docs, col("doc_id") === 0, n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (2L, 1L), 2L -> (2L, 0L)))
  }

  test("leakageSafeSplit keeps duplicate groups in one split") {
    // docs 1/5/9 are exact duplicates (one group keyed by 1); 2 and 3
    // are singletons; WHICH split each lands in is hash-determined, the
    // invariant is that the group never straddles
    val docs = Seq(
      (1L, "same words here"), (5L, "same  WORDS here"),
      (9L, " same words HERE "), (2L, "other text"), (3L, "third doc"))
      .toDF("doc_id", "text")
    val out = TextPipeline.leakageSafeSplit(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val group = out.filter(r => Set(1L, 5L, 9L).contains(r._1))
    assert(group.map(_._2).toSet == Set(1L), "group key must be the min id")
    assert(group.map(_._3).toSet.size == 1,
      "duplicates must never straddle splits")
    assert(out.map(_._3).forall(Set("train", "val", "test")))
  }

  test("packSequences offsets are the global prefix sum, straddles counted") {
    // tokens: 3, 4, 2 at capacity 4 → offsets 0, 3, 7:
    //   doc 1: pack 0 offset 0, fits      (spans 1)
    //   doc 2: pack 0 offset 3, runs into pack 1 (spans 2)
    //   doc 3: pack 1 offset 3, last token in pack 2 (spans 2)
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i"))
      .toDF("doc_id", "text")
    val out = TextPipeline.packSequences(docs, capacity = 4, bucketSize = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      1L -> (0L, 0L, 1L), 2L -> (0L, 3L, 2L), 3L -> (1L, 3L, 2L)))
  }

  test("vocabulary ranks by frequency with running coverage") {
    // counts: b=3, a=2, c=1 (6 tokens); ties impossible here
    val docs = Seq((1L, "a b b"), (2L, "b a c")).toDF("doc_id", "text")
    val out = TextPipeline.vocabulary(docs, topN = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, "b", 3L, 2L, 0.5), (1L, "a", 2L, 2L, 0.833333333)),
      "rank order, doc frequency and 9-dp cumulative coverage must all hold")
  }

  test("bpePairStats weights char pairs by word frequency") {
    // words: "ab" ×3 → pair ab=3; "abc" ×1 → ab+1, bc=1; "z" has no pair
    val docs = Seq((1L, "ab ab abc"), (2L, "ab z")).toDF("doc_id", "text")
    val out = TextPipeline.bpePairStats(docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("ab") == ((1L, 4L, 2L)), "rank 1: weight 3+1 over 2 words")
    assert(out("bc") == ((2L, 1L, 1L)))
    assert(out.size == 2, "single-char words contribute no pair")
  }

  test("phraseMatch: consecutive-position intersection, repeats counted") {
    val docs = Seq(
      (1L, "to be or not to be that is"), // "to be" twice
      (2L, "be to or to"),                // words present, never consecutive
      (3L, "to be"),                      // exactly once
      (4L, "nothing here")).toDF("doc_id", "text")
    val idx = TextPipeline.positionalIndex(docs)
    val two = TextPipeline.phraseMatch(idx, Seq("to", "be")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 2L, 3L -> 1L))
    val three = TextPipeline.phraseMatch(idx, Seq("not", "to", "be")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three == Map(1L -> 1L), "the 3-term walk chains two intersections")
  }

  test("tokenizeGreedy: maximal munch with the char-alphabet fallback") {
    // "abc" dominates the frequency ranking (topWords=1), so the vocab is
    // {abc, a, b, c, d}; "abcd" must tokenize abc|d (longest match wins
    // over a|b|c|d), "dab" has no multi-char prefix → d|a|b
    val docs = Seq((1L, "abc abc abc abcd dab")).toDF("doc_id", "text")
    val out = TextPipeline.tokenizeGreedy(docs, "text", topWords = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out("abc") == ((3L, 1L, "abc")))
    assert(out("abcd") == ((1L, 2L, "abc|d")))
    assert(out("dab") == ((1L, 3L, "d|a|b")))
  }

  test("lineDedup strips corpus-frequent lines, reassembles the rest in order") {
    // 2-word "lines": "aa bb" appears in docs 1 and 2 → boilerplate at
    // maxDocFreq=2; "cc dd" repeats within doc 1 only → kept (distinct-DOC
    // frequency, not occurrence count); doc 3 is all boilerplate → md5('')
    val docs = Seq(
      (1L, "aa bb cc dd cc dd"),
      (2L, "aa bb ee ff"),
      (3L, "aa bb")).toDF("doc_id", "text")
    val out = TextPipeline.lineDedup(docs, "doc_id", "text", lineWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == ((3L, 2L, h("cc dd cc dd"))))
    assert(out(2L) == ((2L, 1L, h("ee ff"))))
    assert(out(3L) == ((1L, 0L, h(""))))
  }

  test("charEntropy: 0 bits for one repeated char, exactly 2 for 4 uniform") {
    val docs = Seq((1L, "aaaaaaaa"), (2L, "abcdabcd"), (3L, "ab"))
      .toDF("doc_id", "text")
    val out = TextPipeline.charEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((8L, 1L, 0.0)), "degenerate distribution has 0 bits")
    assert(out(2L) == ((8L, 4L, 2.0)), "4 equiprobable chars = log2(4) bits")
    assert(out(3L) == ((2L, 2L, 1.0)))
  }

  test("oovRate: tokens outside the topN vocab count per language") {
    import spark.implicits._
    // vocab (topN=2, count desc then word asc) = {"aa" x4, "bb" x3};
    // "zz" and "yy" are OOV. en: 5 tokens 1 OOV; fr: 4 tokens 2 OOV.
    val docs = Seq(
      (1L, "en", "aa aa bb zz bb"),
      (2L, "fr", "aa bb yy zz"),
      (3L, "en", "aa aa")).toDF("doc_id", "lang", "text")
    val out = graft.operators.TextPipeline.oovRate(docs, topN = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      "en" -> ((2L, 7L, 1L, BigDecimal(1.0 / 7.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      "fr" -> ((1L, 4L, 2L, 0.5))))
  }

  test("goodTuring: singleton mass per language, cross-doc type merge") {
    import spark.implicits._
    // en: tokens a a b c → types {a:2, b:1, c:1}: N=4, V=3, N1=2, N2=1
    // fr: x x  (one type seen twice): N=2, V=1, N1=0, N2=1
    val docs = Seq(
      (1L, "en", "a a b"), (2L, "en", "c"),
      (3L, "fr", "x x")).toDF("doc_id", "lang", "text")
    val out = graft.operators.TextPipeline.goodTuring(docs, "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out("en") == ((4L, 3L, 2L, 1L, 0.5)))
    assert(out("fr") == ((2L, 1L, 0L, 1L, 0.0)))
  }

  test("knBigram: discounted mass + continuation back-off, hand-checked") {
    import spark.implicits._
    // bigrams (BOS sentinel): d1 (<s>,a)(a,b); d2 (<s>,b)(b,b)
    // types: 4; followers: <s>→2, a→1, b→1; predecessors: a←1, b←3
    // Pcont(a)=1/4 Pcont(b)=3/4, D=0.75:
    //   P(a|<s>) = (0.25 + 0.75·2·0.25)/2  = 0.3125
    //   P(b|a)   = (0.25 + 0.75·1·0.75)/1  = 0.8125
    //   P(b|<s>) = (0.25 + 0.75·2·0.75)/2  = 0.6875
    //   P(b|b)   = (0.25 + 0.75·1·0.75)/1  = 0.8125
    val docs = Seq((1L, "a b"), (2L, "b b")).toDF("doc_id", "text")
    val out = graft.operators.TextPipeline.knBigram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val d1 = (math.log(0.3125) + math.log(0.8125)) / -2.0
    val d2 = (math.log(0.6875) + math.log(0.8125)) / -2.0
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2 - d1) < 1e-6)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - d2) < 1e-6)
    // unseen-successor mass: for any prev, the discounted leftover
    // D·N1+(prev,·)/c(prev) routes through Pcont, so the model's mass
    // over the OBSERVED vocab sums to exactly 1 per context
    // (hand-check for prev=b: P(a|b)=0.1875, P(b|b)=0.8125)
  }
  test("rakeKeywords: degree/frequency scores, phrase ranking, dedup") {
    // corpus word stats: deep freq 3 deg 7 -> 7/3; learning freq 3 deg 7;
    // models freq 1 deg 3 -> 3. Phrases: "deep learning models" = 2*(7/3)+3,
    // "deep learning" = 2*(7/3) (occurs twice), "models" single
    val docs = Seq(
      (1L, "deep learning models of deep learning"),
      (2L, "deep learning")).toDF("doc_id", "text")
    val got = TextPipeline.rakeKeywords(docs, "doc_id", "text", topN = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "deep learning models", 3L, 1L, 7.666667),
      (2L, "deep learning", 2L, 2L, 4.666667)))
  }

  test("pmiCollocations: margins from the FULL census, support gate, ties") {
    // (new,york) and (a,b) each occur 3x with margins 3/3 over N=10
    // bigrams -> PMI = ln(10/3); sub-support reversals drop
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "a b a b a b")).toDF("doc_id", "text")
    val got = TextPipeline.pmiCollocations(docs, "doc_id", "text",
        minCount = 3, topN = 10)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(0), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size == 2, "the reversed sub-support pairs must drop")
    val pmi = math.rint(math.log(10.0 / 3.0) * 1e6) / 1e6
    assert(got(("a", "b")) == ((1L, 3L, pmi)))
    assert(got(("new", "york")) == ((2L, 3L, pmi)))
  }

  test("gopherRules: clean doc passes, symbol-heavy doc fails on ratio") {
    import org.apache.spark.sql.Row
    val clean = "the cat and the dog have fun with all of that stuff here"
    val spam = "the of ### and ... that ### have ... with ### be to"
    val docs = Seq((1L, clean), (2L, spam)).toDF("doc_id", "text")
    val out = graft.operators.TextPipeline
      .gopherRules(docs, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    val c: Row = out(1L)
    assert(c.getAs[Boolean]("pass"), s"clean doc must pass: $c")
    assert(c.getAs[Long]("stop_hits") >= 2L && c.getAs[Long]("n_symbols") == 0L)
    val sp: Row = out(2L)
    assert(!sp.getAs[Boolean]("pass"), "symbol spam must fail")
    // '#' counts per CHARACTER (### = 3) — 9 hash chars + 2 ellipses
    assert(sp.getAs[Long]("n_symbols") == 11L, s"unexpected symbols: $sp")
  }

  test("bpeTrain: merge sequence hand-traced, later merges build on earlier") {
    // corpus: "abab" x3, "abc" x2 -> pair census round 1 over chars:
    // "abab" holds (a,b) twice and (b,a) once, "abc" holds (a,b), (b,c)
    // -> (a,b): 2*3 + 1*2 = 8; (b,a): 3; (b,c): 2 -> merge 1 = ab (8)
    // round 2 symbols: [ab,ab] x3, [ab,c] x2 -> (ab,ab): 3; (ab,c): 2
    //   -> merge 2 = abab (3) — built FROM merge 1's token
    // round 3: [abab] x3, [ab,c] x2 -> only (ab,c): 2 -> merge 3 = abc
    val docs = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val got = graft.operators.TextPipeline.bpeTrain(docs, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "ab", "c", "abc", 2L)))
    // overlap rule: "aaa" merges left-to-right non-overlapping -> (a,a)
    // counts 2 per word occurrence, and ONE merge leaves [aa, a]
    val aaa = Seq((1L, "aaa")).toDF("doc_id", "text")
    val g2 = graft.operators.TextPipeline.bpeTrain(aaa, "text", 2)
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(g2.toSeq == Seq(("aa", 2L), ("aaa", 1L)))
  }

  test("vocabCoverage: exact cumulative shares at each candidate K") {
    import spark.implicits._
    val docs = Seq("a a a b b c").toDF("text")
    val got = graft.operators.TextPipeline
      .vocabCoverage(docs, "text", Seq(1, 2, 5))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(2) == 3L && got(1L).getDouble(4) == 0.5)
    assert(got(2L).getDouble(4) == 0.833333)
    assert(got(5L).getLong(1) == 3L, "vocab smaller than K reports its size")
    assert(got(5L).getDouble(4) == 1.0)
  }

  test("vocabCoverageFromCensus: batch-split token censuses equal one pass") {
    import spark.implicits._
    val docs = Seq("a a b", "a b c d").toDF("text")
    val onePass = graft.operators.TextPipeline
      .vocabCoverage(docs, "text", Seq(2, 4))
      .orderBy(col("k")).collect().toSeq
    def cen(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val census = graft.operators.TextPipeline.vocabCoverageFromCensus(
        cen(docs.limit(1)).unionByName(cen(docs.exceptAll(docs.limit(1)))),
        Seq(2, 4))
      .orderBy(col("k")).collect().toSeq
    assert(census == onePass)
  }

  test("langidConfusion: cells, row shares, global accuracy") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and a dog the end"), // scores en
      ("en", "der hund und der mann"),     // mislabeled as en, reads de
      ("de", "der hund und der mann")).toDF("lang", "text")
    val got = graft.operators.TextPipeline
      .langidConfusion(docs, "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("en", "en")).getLong(2) == 1L)
    assert(got(("en", "de")).getLong(2) == 1L)
    assert(got(("de", "de")).getLong(2) == 1L)
    assert(got(("en", "de")).getDouble(4) == 0.5) // half of en routes wrong
    assert(got.values.forall(r => math.abs(r.getDouble(5) - 0.666667) < 1e-9))
  }

  test("tokenizerFertility: hand counts, exact ceiling-rank p90") {
    import spark.implicits._
    // lang a: "ab cd" = 2 words / 2 bpe tokens (fert 1.0, ppm 1000000)
    //         "a-b x" = 2 words / 4 bpe tokens (a,-,b,x → ppm 2000000)
    // p90 rank over 2 docs = ceil(1.8) = 2 → second value
    val docs = Seq(("a", "ab cd"), ("a", "a-b x"), ("b", "q")).toDF("lang", "text")
    val got = graft.operators.TextPipeline
      .tokenizerFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 2L) // n_docs
    assert(a.getLong(2) == 4L && a.getLong(3) == 6L) // words, bpe tokens
    assert(a.getDouble(4) == 1.5) // 6 bpe / 4 words
    assert(a.getLong(6) == 2000000L)
    assert(got("b").getLong(6) == 1000000L)
  }

  test("heapsLaw: hand doc-order growth curve and OLS fit") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextPipeline.heapsLaw(docs, "doc_id", "text")
      .head()
    // T = 2,4,8; V = 2,3,4
    assert(r.getLong(0) == 3L && r.getLong(1) == 8L && r.getLong(2) == 4L)
    // replicate the grid OLS by hand
    def t9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val pts = Seq((2.0, 2.0), (4.0, 3.0), (8.0, 4.0))
      .map { case (t, v) => (math.log(t), math.log(v)) }
    // decimal-exact sums of the grid terms, like the engine's aggregation
    val sx = pts.map(p => t9(p._1)).sum.toDouble
    val sy = pts.map(p => t9(p._2)).sum.toDouble
    val sxx = pts.map(p => t9(p._1 * p._1)).sum.toDouble
    val sxy = pts.map(p => t9(p._1 * p._2)).sum.toDouble
    val slope = (3.0 * sxy - sx * sy) / (3.0 * sxx - sx * sx)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == r6(slope))
    assert(r.getDouble(4) == r6((sy - slope * sx) / 3.0))
  }

  test("langMixture: pure doc reads 1 lang, code-switched doc flags mixed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog a x"),
      (2L, "le chat et the dog"),
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val got = graft.operators.TextPipeline
      .langMixture(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val pure = got(1L)
    assert(pure.getLong(1) == 3L && pure.getLong(2) == 1L)
    assert(pure.getDouble(3) == 0.0 && !pure.getBoolean(4))
    val mixed = got(2L) // fr 2 markers, en 1 -> shares 2/3, 1/3
    assert(mixed.getLong(1) == 3L && mixed.getLong(2) == 2L)
    assert(mixed.getDouble(3) == 0.636514168 && mixed.getBoolean(4))
    val none = got(3L)
    assert(none.getLong(1) == 0L && none.isNullAt(3) && !none.getBoolean(4))
  }

  test("readability: hand censuses land Flesch; fragments floor at one " +
    "sentence") {
    import spark.implicits._
    // "The cat sat. It ran!": 5 words, 2 sentence runs, 5 vowel groups
    // → flesch = 206.835 − 1.015·2.5 − 84.6·1 = 119.6975
    val df = Seq((1L, "The cat sat. It ran!"), (2L, "tsk brr"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextPipeline.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = got(1L)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((5L, 2L, 5L)))
    assert(a.getDouble(4) == 119.6975)
    assert(a.getDouble(5) == math.rint((0.39 * 2.5 + 11.8 - 15.59) * 1e6)
      / 1e6)
    // no terminator, no vowels: the sentence floor keeps ratios finite
    val b = got(2L)
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) == ((2L, 1L, 0L)))
    assert(b.getDouble(4) == math.rint((206.835 - 1.015 * 2.0) * 1e6) / 1e6)
  }

  test("stylometryCosine: same habit reads 1 at any volume, disjoint 0") {
    import spark.implicits._
    // g1 and g2 use only 'the' (different volumes); g3 only 'for'
    val df = Seq(("g1", "the cow the dog the"), ("g2", "the end the"),
      ("g3", "for x for y for z")).toDF("source", "text")
    val got = graft.operators.TextPipeline.stylometryCosine(df,
      "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("g1", "g2")).getDouble(4) == 1.0)
    assert(got(("g1", "g3")).getDouble(4) == 0.0)
    assert(got(("g2", "g3")).getDouble(4) == 0.0)
  }

  test("skipgramPairs: the ±window pair census is exact and the " +
    "negative draws are a pure function of the pair") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = TextPipeline.skipgramPairs(docs, "doc_id", "text",
      window = 2, negK = 2, limit = 100).collect()
    val pairs = got.map(r => (r.getString(0), r.getString(1))).toSet
    // distance-3 pairs are out; every within-2 ordered pair is in
    assert(!pairs.contains(("a", "d")) && !pairs.contains(("d", "a")))
    assert(pairs == Set(("a","b"),("a","c"),("b","a"),("b","c"),("b","d"),
      ("c","a"),("c","b"),("c","d"),("d","b"),("d","c")))
    assert(got.forall(_.getLong(2) == 1L))
    val vocab = Set("a", "b", "c", "d")
    assert(got.forall(r => vocab(r.getString(3)) && vocab(r.getString(4))))
    // determinism: a second run draws the identical negatives
    val again = TextPipeline.skipgramPairs(docs, "doc_id", "text",
      window = 2, negK = 2, limit = 100).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("wordBurstiness: clumping words read high burst and " +
    "adaptation, glue words read 1") {
    import spark.implicits._
    val docs = (1 to 6).map { i =>
      (i.toLong, if (i <= 4) "the topic topic topic filler"
      else "the filler other words here")
    }
    val got = TextPipeline.wordBurstiness(docs.toDF("doc_id", "text"),
      "doc_id", "text", minDf = 4L, topK = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val t = got("topic")
    assert(t.getLong(1) == 12L && t.getLong(2) == 4L && t.getLong(3) == 4L)
    assert(t.getDouble(4) == 3.0 && t.getDouble(5) == 1.0)
    val g = got("the")
    assert(g.getDouble(4) == 1.0 && g.getDouble(5) == 0.0)
    assert(!got.contains("other"), "df floor drops rare words")
  }
}
