package graft

import graft.operators.Sketches

class SketchesSpec extends SparkSuite {

  test("CMS heavy hitters: estimates never undercount the true counts") {
    val out = SparkEntry.queries("q95_cms_heavy_hitters")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
    }
  }

  test("merged per-group CMS equals the direct whole-corpus sketch") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val direct = graft.operators.Sketches
      .cmsHeavyHitters(docs, "text")
      .select(col("word"), col("true_n"), col("cms_est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val merged = graft.operators.Sketches
      .cmsMergedHeavyHitters(docs, "source", "text")
      .select(col("word"), col("true_n"), col("cms_est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // counter tables are union-addable: summing per-source sketches must
    // reproduce the direct sketch's estimates exactly, word for word
    assert(merged == direct)
  }

  test("quantile sketch: segmentation-invariant merge and bounded rank error") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // 10k distinct values, ids scrambled so hash sampling is exercised
    val base = (1 to 10000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val qs = Seq(0.5, 0.9, 0.99)
    def run(seg: org.apache.spark.sql.Column): Seq[(Double, Double, Long, Long)] =
      Sketches.quantileSketch(base, seg, "id", "v", 256, qs)
        .collect().map(r =>
          (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    val one = run(lit("all"))
    val many = run((col("id") % 7).cast("string"))
    // per-segment bottom-k samples merge to EXACTLY the global bottom-k:
    // how the data is segmented must not change a single estimate
    assert(one == many, s"segmentation changed the sketch: $one vs $many")
    one.foreach { case (q, est, k, n) =>
      assert(k == 256L && n == 10000L)
      // uniform sample of 256: observed rank must sit within ±0.1 of q
      val rank = est / 10000.0
      assert(math.abs(rank - q) <= 0.1,
        s"q=$q estimated value $est (rank $rank) outside the error bound")
    }
  }

  test("containment catches the exact-duplicate pair symmetrically") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val out = graft.operators.Dedup
      .ngramContainmentPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ab, ba) = (r.getDouble(2), r.getDouble(3))
      assert(ab >= 0.0 && ab <= 1.0 && ba >= 0.0 && ba <= 1.0)
      assert(math.max(ab, ba) >= 0.5, "threshold must hold on every row")
    }
    // the corpus carries engineered exact dups: both directions 1.0
    assert(out.exists(r => r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0))
  }

  test("quantizedKnn rejects a degenerate (constant) embedding range") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    val flat = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, Seq(2.0f, 2.0f)), Row(2L, Seq(2.0f, 2.0f))), schema)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.quantizedKnn(flat, flat, "id", "v")
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("approx quantiles stay within rank tolerance of the exact answer") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q112_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1).head, r.getSeq[Double](1)(1)))).toMap
    approx.foreach { case (g, (a50, a90)) =>
      val (e50, e90) = exact(g)
      // GK accuracy 10000 → rank error ~1e-4; generous value-space bound
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$g p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.02, s"$g p90 $a90 vs $e90")
    }
  }

  test("HLL rollup: merged sketch estimate tracks the exact distinct") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q119_hll_rollup")(spark, sf).collect()
    val (days, all) = out.partition(_.getString(0) != "ALL")
    assert(days.nonEmpty && all.length == 1)
    days.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: $approx vs $exact")
    }
    val exactTotal = spark.read.parquet(s"$sf/events.parquet")
      .agg(count_distinct(col("user_id"))).head().getLong(0).toDouble
    val mergedApprox = all.head.getLong(1).toDouble
    assert(math.abs(mergedApprox - exactTotal) / exactTotal < 0.05,
      s"merged $mergedApprox vs exact $exactTotal")
  }

  test("BM25: positive descending scores over the term set") {
    val out = SparkEntry.queries("q96_bm25")(spark, sf).collect()
    assert(out.length == 100)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
  }

  test("bitmap distinct: OR-merged halves equal the exact distinct count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    // keys straddle word boundaries (62|63|64) and overlap across halves —
    // the overlap is exactly what a popcount-sum-without-re-or would
    // double count
    val h1 = Seq(("a", 1L), ("a", 62L), ("a", 63L), ("b", 10L), ("b", -1L))
      .toDF("g", "k")
    // -1 and 62 share a bit position under truncating division (word 0,
    // bit 62); floor semantics must keep them distinct
    val h2 = Seq(("a", 63L), ("a", 64L), ("a", 1L), ("b", 10L), ("b", 200L),
      ("b", 62L)).toDF("g", "k")
    val merged = Sketches.bitmapWords(h1, Seq("g"), "k")
      .unionByName(Sketches.bitmapWords(h2, Seq("g"), "k"))
    val got = Sketches.bitmapDistinct(merged, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 4L, "b" -> 4L),
      "a: {1,62,63,64}; b: {-1,10,62,200} — no double counts, no -1/62 collision")
  }

  test("bitmapPairCounts: exact pairwise set algebra, disjoint pairs included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    // a={1,2,63}, b={2,63,100}, c={200} (disjoint from both; never joins)
    val facts = Seq(("a", 1L), ("a", 2L), ("a", 63L), ("b", 2L), ("b", 63L),
      ("b", 100L), ("c", 200L)).toDF("g", "k")
    // merged two-segment store: the re-or guard is load-bearing
    val words = Sketches.bitmapWords(facts.filter(col("k") < 63L), Seq("g"), "k")
      .unionByName(Sketches.bitmapWords(facts.filter(col("k") >= 63L), Seq("g"), "k"))
    val got = Sketches.bitmapPairCounts(words, "g").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toMap
    assert(got(("a", "b")) == ((3L, 3L, 2L, 4L, 1L, 1L)))
    assert(got(("a", "c")) == ((3L, 1L, 0L, 4L, 3L, 1L)))
    assert(got(("b", "c")) == ((3L, 1L, 0L, 4L, 3L, 1L)))
  }

  test("trailingBitmapDistinct equals the direct trailing distinct, batch-split invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    // periods 1,2,4,7 for group a (gap at 3, window re-entry at 7);
    // user 62/63 straddle a word boundary inside the merge
    val facts = Seq(
      ("a", 1L, 62L), ("a", 1L, 63L), ("a", 2L, 63L), ("a", 2L, 10L),
      ("a", 4L, 62L), ("a", 7L, 99L), ("b", 2L, 1L), ("b", 3L, 1L))
      .toDF("g", "p", "k")
    def direct(window: Int) = {
      val pairs = facts.select(col("g"), col("p"), col("k")).distinct().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      pairs.map { case (g, p, _) => (g, p) }.distinct.map { case (g, p) =>
        (g, p) -> pairs.collect {
          case (g2, p2, k) if g2 == g && p2 > p - window && p2 <= p => k
        }.distinct.size.toLong
      }.toMap
    }
    for (window <- Seq(1, 3)) {
      // the store built in one pass and from two merged half-batches must
      // both reproduce the direct answer — the union-addable contract
      val whole = Sketches.bitmapWords(facts, Seq("g", "p"), "k")
      val halves = Sketches.bitmapWords(facts.filter(col("k") % 2 === 0), Seq("g", "p"), "k")
        .unionByName(Sketches.bitmapWords(facts.filter(col("k") % 2 =!= 0), Seq("g", "p"), "k"))
      for (cells <- Seq(whole, halves)) {
        val got = Sketches.trailingBitmapDistinct(cells, Seq("g"), "p", window)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == direct(window), s"window=$window")
      }
    }
  }

  test("kmvDistinct: exact below k, bounded error above, union from merged sketches") {
    import spark.implicits._
    // group a: 2000 distinct ids (sketch saturates at k=64);
    // group b: 30 distinct ids (the sketch IS the set → exact count)
    val df = ((1 to 2000).map(i => ("a", i.toLong)) ++
      (1 to 30).map(i => ("b", (100000 + i).toLong))).toDF("g", "id")
    val got = Sketches.kmvDistinct(df, "g", "id", 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("b") == 30.0, "below-k groups must be exact")
    assert(math.abs(got("a") - 2000.0) / 2000.0 < 0.3,
      s"k=64 estimate off: ${got("a")}")
    // the union estimate is computed purely from the two k-min lists —
    // disjoint groups, so truth is 2030
    assert(math.abs(got("__union__") - 2030.0) / 2030.0 < 0.3,
      s"union estimate off: ${got("__union__")}")
  }

  test("kmvJaccard: identical sets estimate 1, disjoint sets 0, overlap in between") {
    import spark.implicits._
    val a = (1 to 500).map(i => ("a", i.toLong))
    val sameAsA = (1 to 500).map(i => ("b", i.toLong))
    val disjoint = (1 to 500).map(i => ("c", (100000 + i).toLong))
    val half = (251 to 750).map(i => ("d", i.toLong)) // J(a,d) = 250/750 = 1/3
    val df = (a ++ sameAsA ++ disjoint ++ half).toDF("g", "id")
    val got = Sketches.kmvJaccard(df, "g", "id", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got(("a", "b")) == 1.0, "identical sets share every k-min hash")
    assert(got(("a", "c")) == 0.0, "disjoint sets share none")
    assert(math.abs(got(("a", "d")) - 1.0 / 3.0) < 0.2,
      s"overlap estimate off: ${got(("a", "d"))}")
    // every unordered pair appears exactly once, ordered lexicographically
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("bitmapOverlap: exact pairwise intersections vs a brute set compare") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val facts = (0 until 3000).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val got = Sketches.bitmapOverlap(facts.toDF("g", "k"), "g", "k")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val sets = facts.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    for { a <- sets.keys; b <- sets.keys if a < b } {
      val inter = (sets(a) & sets(b)).size.toLong
      if (inter > 0) {
        val (na, nb, ni, j) = got((a, b))
        assert((na, nb, ni) == ((sets(a).size.toLong, sets(b).size.toLong, inter)),
          s"pair ($a,$b)")
        val expJ = math.rint(inter.toDouble /
          (sets(a).size + sets(b).size - inter) * 1e6) / 1e6
        assert(j == expJ)
      } else assert(!got.contains((a, b)), "zero-overlap pairs are absent")
    }
  }

  test("hllRegisters: hand-checked bucket and rho from the md5 arithmetic") {
    import spark.implicits._
    def h52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }
    val regs = Sketches.hllRegisters(Seq(("g1", "42")).toDF("g", "k"),
      "g", "k").as[(String, Long, Int)].collect()
    val h = h52("42")
    val w = h / 256
    val rho = if (w == 0) 45 else 45 - java.lang.Long.toBinaryString(w).length
    assert(regs.toSeq == Seq(("g1", h % 256, rho)))
  }

  test("hllEstimate: ~2% error at 5k keys; merge law is exact") {
    import spark.implicits._
    val facts = (1 to 5000).map(i => ("u", i.toString)).toDF("g", "k")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(facts, "g", "k"))
      .select("estimate").as[Double].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15,
      s"HLL(m=256) should land within ~3sigma of 5000, got $est")
    // mergeability: max-per-bucket over two overlapping halves must give
    // EXACTLY the union's registers (and hence the union's estimate)
    val partA = (1 to 3000).map(i => ("a", i.toString))
    val partB = (2000 to 5000).map(i => ("b", i.toString))
    val halves = Sketches.hllRegisters(
      (partA ++ partB).toDF("g", "k"), "g", "k")
    val merged = halves.groupBy($"j")
      .agg(org.apache.spark.sql.functions.max($"m").as("m"))
      .select($"j", $"m").as[(Long, Int)].collect().toMap
    val union = Sketches.hllRegisters(facts, "g", "k")
      .select($"j", $"m").as[(Long, Int)].collect().toMap
    assert(merged == union, "register merge must equal the union sketch")
  }

  test("amsF2: exact moment on a hand census, JVM-replayed estimator") {
    import spark.implicits._
    def sign(j: Int, u: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"x:$j:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      1L - 2L * (java.lang.Long.parseLong(hex.substring(0, 13), 16) % 2)
    }
    val facts = (Seq.fill(3)("a") ++ Seq.fill(4)("b")).toDF("k")
    val r = Sketches.amsF2(facts, "k", k = 16, salt = "x").head()
    assert(r.getLong(0) == 2L && r.getDouble(1) == 25.0)
    val zz = (0 until 16).map { j =>
      val z = sign(j, "a") * 3 + sign(j, "b") * 4
      z * z
    }.sum
    assert(r.getDouble(2) == math.rint(zz.toDouble / 16 * 1e6) / 1e6)
  }

  test("slidingHllCells: suffix-window registers equal a direct rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val facts = (1 to 200).map(i =>
      ("g", i.toString, 1L + rnd.nextInt(100).toLong))
      .toDF("g", "k", "t")
    val cells = Sketches.slidingHllCells(facts, "g", "k", "t")
    val cutoff = 50L
    val fromCells = cells.filter($"max_ts" >= cutoff)
      .groupBy($"j").agg(org.apache.spark.sql.functions.max($"rho").as("m"))
      .as[(Long, Int)].collect().toMap
    val direct = Sketches.hllRegisters(
      facts.filter($"t" >= cutoff), "g", "k")
      .select($"j", $"m").as[(Long, Int)].collect().toMap
    assert(fromCells == direct,
      "cell store must answer any suffix window exactly")
  }

  test("hllEstimate: linear-counting regime for tiny cardinalities") {
    import spark.implicits._
    // 3 distinct keys: E_raw is far below 2.5m with empty registers, so
    // the estimate must be the m*ln(m/V) correction — near-exact here
    val est = Sketches.hllEstimate(Sketches.hllRegisters(
        Seq("x", "y", "z").map(("g", _)).toDF("g", "k"), "g", "k"))
      .select("v_empty", "estimate").as[(Long, Double)].head()
    assert(est._1 == 253L)
    assert(est._2 == math.rint(256.0 * math.log(256.0 / 253.0) * 1e6) / 1e6)
  }
}
