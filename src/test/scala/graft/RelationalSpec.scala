package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSuite {
  import spark.implicits._

  test("asofJoin picks the latest right row <= left ts, inclusive") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 9L, 102L))
      .toDF("k", "rts", "attr")
    val out = Relational.asofJoin(left, right, "k", "ts", "rts", Seq("attr"))
      .select("name", "attr").as[(String, Option[Long])].collect().toMap
    assert(out("p1").contains(100L)) // equal ts matches (inclusive)
    assert(out("p2").contains(101L)) // latest prior
    assert(out("p3").isEmpty)        // no prior right row
  }

  test("asofJoin: a matching right row with NULL carry value yields null, not a stale value") {
    val left = Seq((1L, 30L, "p1")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, Some(100L)), (1L, 20L, None))
      .toDF("k", "rts", "attr")
    val out = Relational.asofJoin(left, right, "k", "ts", "rts", Seq("attr"))
      .select("name", "attr").as[(String, Option[Long])].collect().toMap
    // latest right row (rts=20) matches and its attr is legitimately null —
    // must NOT fall back to the older row's 100
    assert(out("p1").isEmpty)
  }

  test("saltedSum equals the naive aggregate") {
    val ev = Tables.load(spark, sf, "events")
    val salted = Relational.saltedSum(ev, "user_id", "value")
    val naive = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    assert(salted.except(naive).isEmpty && naive.except(salted).isEmpty)
  }

  test("rangeJoin matches overlapping intervals, hi-exclusive, across bucket sizes") {
    val fact = Seq((1L, 5.0), (2L, 20.0), (3L, 25.0), (4L, 99.0), (5L, 100.0))
      .toDF("id", "v")
    val intervals = Seq(("a", 0.0, 25.0), ("b", 20.0, 100.0), ("c", 90.0, 200.0))
      .toDF("name", "lo", "hi")
    // expected matches: 5→a; 20→a,b; 25→b (hi of a is exclusive); 99→b,c;
    // 100→c only (hi of b is exclusive)
    val expected = Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
      (4L, "b"), (4L, "c"), (5L, "c"))
    for (bs <- Seq(7.0, 25.0, 1000.0)) {
      val got = Relational.rangeJoin(fact, "v", intervals, "lo", "hi", bs)
        .select("id", "name").as[(Long, String)].collect().toSet
      assert(got == expected, s"bucketSize=$bs")
    }
  }

  test("rangeJoin ignores empty intervals (hi <= lo) instead of exploding descending buckets") {
    val fact = Seq((1L, 50.0)).toDF("id", "v")
    val intervals = Seq(("empty", 50.0, 50.0), ("inverted", 80.0, 20.0))
      .toDF("name", "lo", "hi")
    assert(Relational.rangeJoin(fact, "v", intervals, "lo", "hi", 25.0).isEmpty)
  }

  test("rangeJoin emits each match exactly once even when an interval spans many buckets") {
    val fact = Seq((1L, 50.0)).toDF("id", "v")
    val intervals = Seq(("wide", 0.0, 1000.0)).toDF("name", "lo", "hi")
    val got = Relational.rangeJoin(fact, "v", intervals, "lo", "hi", 10.0)
    assert(got.count() == 1L)
  }

  test("saltedJoin is row-identical to the plain join, including skewed keys") {
    val big = ((1 to 200).map(i => (1L, i.toDouble)) ++ // hot key
      (1 to 50).map(i => (2L + i % 3, i * 10.0))).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (9L, "unmatched"))
      .toDF("k", "tag")
    val salted = Relational.saltedJoin(big, small, "k")
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("discretePercentiles selects the ceil(p*n)-th value") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = Relational.discretePercentiles(df, "g", "v", "id", Seq(0.5, 0.9))
      .head()
    assert(out.getAs[Double]("p50") == 50.0)
    assert(out.getAs[Double]("p90") == 90.0)
    assert(out.getAs[Long]("n") == 100L)
  }

  test("weightedPercentiles cuts on cumulative weight, not row count") {
    // values 1..4 with weights 1,1,1,7: total 10 — the row-median is 2.5
    // territory but 50% of the WEIGHT is only reached at value 4
    val df = Seq(("g", 1.0, 1L, 1L), ("g", 2.0, 1L, 2L),
      ("g", 3.0, 1L, 3L), ("g", 4.0, 7L, 4L)).toDF("g", "v", "w", "id")
    val out = Relational.weightedPercentiles(df, "g", "v", "w", "id", Seq(30, 50, 90))
      .head()
    assert(out.getAs[Double]("p30_w") == 3.0, "cum 3 of 10 at value 3")
    assert(out.getAs[Double]("p50_w") == 4.0)
    assert(out.getAs[Double]("p90_w") == 4.0)
    assert(out.getAs[Long]("total_weight") == 10L)
  }

  test("dynamicGapSessions merges overlapping per-event intervals") {
    // key u: events at 0 (gap 100), 50 (gap 10), 200 (gap 10) — the first
    // two overlap into [0,100]; 200 > 100 starts a new session. The short
    // mid-event must NOT shrink the session (interval merge keeps the
    // running MAX end, not the last end): event at 90 would still chain.
    val df = Seq(
      ("u", 0L, 1L, 100L), ("u", 50L, 2L, 10L), ("u", 90L, 3L, 5L),
      ("u", 200L, 4L, 10L),
      ("v", 7L, 5L, 1L)).toDF("k", "sec", "id", "gap")
    val out = Relational.dynamicGapSessions(df, "k", col("sec"), col("id"), col("gap"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("u", 1L) -> ((3L, 0L, 100L)),
      ("u", 2L) -> ((1L, 200L, 210L)),
      ("v", 1L) -> ((1L, 7L, 8L))))
  }

  test("globalRowNumbers equals the single-partition window and plans no SinglePartition exchange") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("n_chars"))
    val out = graft.operators.GlobalOrder.rowNumbers(
      docs, Seq(col("n_chars").desc, col("doc_id")), numPartitions = 7)
    val oracle = docs.withColumn("global_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
    assert(out.except(oracle).isEmpty && oracle.except(out).isEmpty)
    // ids are contiguous 1..n
    val n = docs.count()
    assert(out.agg(min(col("global_id")), max(col("global_id")), count(lit(1)))
      .collect().head.toSeq == Seq(1L, n, n))
    // the numbering path never funnels data through one partition
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("ntiles equals NTILE over a single-partition window, incl. n < k and ties") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"), col("lang"))
    for (k <- Seq(4, 7)) {
      val got = graft.operators.GlobalOrder.ntiles(
        docs, Seq(col("lang"), col("doc_id")), k, "t")
      val exp = docs.withColumn("t",
        ntile(k).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("lang"), col("doc_id"))).cast("long"))
      assert(got.except(exp).isEmpty && exp.except(got).isEmpty, s"k=$k")
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"), plan.take(2000))
    }
    // n < k: each row its own tile, in order
    import spark.implicits._
    val tiny = Seq(30L, 10L, 20L).toDF("v")
    val t = graft.operators.GlobalOrder.ntiles(tiny, Seq(col("v")), 5, "t")
      .orderBy(col("v")).select($"t").as[Long].collect().toSeq
    assert(t == Seq(1L, 2L, 3L))
  }

  test("skewReport flags only hot keys with the right salt factor") {
    val df = (Seq.fill(1000)("hot") ++ Seq.fill(150)("warm") ++ Seq.fill(10)("cold"))
      .toDF("k")
    val out = Relational.skewReport(df, "k", threshold = 100, targetPerTask = 300)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("hot" -> ((1000L, 4L)), "warm" -> ((150L, 1L))),
      "cold keys below the threshold must not appear; ceil(1000/300)=4")
  }

  test("skyline2d matches brute-force dominance, equal points all survive") {
    import spark.implicits._
    val pts = Seq( // (group, id, x, y)
      ("g", 1L, 1L, 9L), ("g", 2L, 2L, 7L), ("g", 3L, 3L, 7L), // 3 dominated by 2
      ("g", 4L, 3L, 4L), ("g", 5L, 5L, 4L), // 5 dominated by 4
      ("g", 6L, 6L, 1L), ("g", 7L, 6L, 1L), // duplicates: both survive
      ("g", 8L, 7L, 1L), // dominated by 6/7
      ("h", 9L, 50L, 50L)) // other group: trivially on its frontier
    val df = pts.toDF("grp", "id", "x", "y")
    val got = Relational.skyline2d(df, Seq("grp"), col("x"), col("y"))
      .select($"id").as[Long].collect().toSet
    val brute = pts.filter { case (g, _, x, y) =>
      !pts.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._2).toSet
    assert(got == brute)
    assert(got == Set(1L, 2L, 4L, 6L, 7L, 9L))
  }

  test("intervalOverlapJoin equals the brute theta-join, one row per pair") {
    // spans crafted around bucket boundaries (width 10): multi-bucket
    // spans, exact-touch endpoints, and disjoint pairs
    val lefts = Seq((1L, 0L, 25L), (2L, 5L, 9L), (3L, 30L, 40L),
      (4L, 18L, 22L))
    val rights = Seq((10L, 20L, 35L), (11L, 9L, 9L), (12L, 41L, 50L),
      (13L, 7L, 19L))
    val l = lefts.toDF("lid", "lo", "hi")
    val r = rights.toDF("rid", "rlo", "rhi")
    val got = Relational
      .intervalOverlapJoin(l, r, "lo", "hi", "rlo", "rhi", bucketWidth = 10L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val brute = for {
      (lid, lo, hi) <- lefts
      (rid, rlo, rhi) <- rights
      if lo <= rhi && rlo <= hi
    } yield (lid, rid)
    assert(got == brute.sorted) // equality of SEQUENCES: no duplicate pairs
    assert(got.contains((2L, 11L)), "closed intervals: touching endpoints match")
    assert(!got.contains((3L, 12L)), "adjacent-but-disjoint must not match")
  }

  test("clampedBalance: floors, ceilings and hit counts, hand-computed") {
    import spark.implicits._
    // deltas +10, -5, -20 (short), +600 (overflow), +3 (overflow: 103>100)
    val df = Seq((1L, 10L), (2L, -5L), (3L, -20L), (4L, 600L), (5L, 3L))
      .map { case (t, d) => ("k", t, d) }.toDF("k", "t", "d")
    val r = Relational.clampedBalance(df, "k", "t", "d", cap = 100L).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((5L, 100L, 1L, 2L)))
    // the unclamped cumsum would say 588 — the clamp is not a formality
  }

  test("prorateCents: allocations sum exactly to the total, ties by line id") {
    import spark.implicits._
    // total 10 over equal weights: floors 3+3+3, leftover 1 -> lowest line
    val eq = Seq((1L, 1L, 7L, 10L), (1L, 2L, 7L, 10L), (1L, 3L, 7L, 10L))
      .toDF("g", "l", "w", "t")
    val gotEq = Relational.prorateCents(eq, "g", "l", "w", "t")
      .orderBy(col("l")).collect().map(_.getLong(3)).toSeq
    assert(gotEq == Seq(4L, 3L, 3L))
    // skewed weights still reconcile exactly on every group
    val rnd = new scala.util.Random(3)
    val lines = for { g <- 1L to 20L; l <- 1L to (1 + rnd.nextInt(6)).toLong }
      yield (g, l, (1 + rnd.nextInt(9999)).toLong, 100000L + g)
    val out = Relational.prorateCents(lines.toDF("g", "l", "w", "t"),
      "g", "l", "w", "t")
    val sums = out.groupBy(col("g")).agg(sum(col("alloc")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach(g =>
      assert(sums(g) == 100000L + g, s"group $g must reconcile exactly"))
  }

  test("medianCI: discrete ranks on 1..100, bounds clamp on tiny n") {
    val vals = (1L to 100L).map(("g", _)).toDF("g", "v")
    val r = Relational.medianCI(vals, "g", "v").head()
    // rmed=50; rlo=floor(40.200)=40; rhi=1+ceil(59.800)=61
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((100L, 50L, 40L, 61L)))
    // n=2: bounds clamp into [1, n]
    val tiny = Seq(("t", 10L), ("t", 20L)).toDF("g", "v")
    val r2 = Relational.medianCI(tiny, "g", "v").head()
    assert((r2.getLong(2), r2.getLong(3), r2.getLong(4)) ==
      ((10L, 10L, 20L)))
  }

  test("trimmedMean: drops tails exactly, apportions boundary ties") {
    // [0, 1..8, 100] trim 10% each side: drop 0 and 100 → mean 4.5
    val vals = (Seq(0L, 100L) ++ (1L to 8L)).map(("g", _)).toDF("g", "v")
    val r = Relational.trimmedMean(vals, "g", "v", 1000).head()
    assert((r.getLong(1), r.getLong(2)) == ((10L, 1L)))
    assert(r.getDouble(3) == 4.5)
    assert(r.getDouble(4) == math.rint(136.0 / 10.0 * 1e6) / 1e6)
    // tie straddling the trim boundary: [1,1,1,2,3] trim 20% → l=1,
    // keep ranks 2..4 → two of the 1s + the 2 → mean 4/3
    val tied = Seq(1L, 1L, 1L, 2L, 3L).map(("t", _)).toDF("g", "v")
    val r2 = Relational.trimmedMean(tied, "g", "v", 2000).head()
    assert(r2.getDouble(3) == math.rint(4.0 / 3.0 * 1e6) / 1e6)
  }

  test("rateLimitAudit: burst passes, steady-state spacing, recovery") {
    // T=60, burst=4: five instantaneous events pass, the sixth is
    // rejected; after a long quiet gap the budget is back
    val burst = (1L to 6L).map(i => ("u", 1000L, i)) :+ (("u", 5000L, 7L))
    val got = Relational.rateLimitAudit(burst.toDF("k", "t", "id"),
      "k", "t", "id", 60L, 4).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) ==
      ((7L, 6L, 1L)))
    // exactly-spaced arrivals at the emission interval: all pass
    val paced = (0L until 10L).map(i => ("p", i * 60L, i))
    val g2 = Relational.rateLimitAudit(paced.toDF("k", "t", "id"),
      "k", "t", "id", 60L, 4).head()
    assert((g2.getLong(1), g2.getLong(2), g2.getLong(3)) == ((10L, 10L, 0L)))
    // twice-too-fast arrivals: after the burst drains, every other one
    // is rejected (TAT grows 60 per accept, arrivals come every 30)
    val fast = (0L until 20L).map(i => ("f", i * 30L, i))
    val g3 = Relational.rateLimitAudit(fast.toDF("k", "t", "id"),
      "k", "t", "id", 60L, 4).head()
    assert(g3.getLong(2) < 20L && g3.getLong(2) >= 12L,
      s"some but not all should pass, got ${g3.getLong(2)}")
  }

  test("waterfill: saturation prefix, exact reconciliation, fair split") {
    // demands (1, 2, 10, 10), cap 16: lines 1 & 2 saturate (1+2=3), the
    // two big lines split 13 as 7/6 with the +1 to the LOWER line id
    val df = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 3L, 10L),
      ("A", 4L, 10L)).toDF("g", "l", "d").withColumn("cap", lit(16L))
    val got = Relational.waterfill(df, "g", "l", "d", "cap")
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 7L, 4L -> 6L))
    // non-binding capacity: everyone gets their demand
    val loose = Relational.waterfill(
      df.withColumn("cap", lit(100L)), "g", "l", "d", "cap")
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    assert(loose == Map(1L -> 1L, 2L -> 2L, 3L -> 10L, 4L -> 10L))
    // random groups: allocs sum to min(cap, sum d), never exceed demand
    val rnd = new scala.util.Random(7)
    val lines = (1 to 200).map { i =>
      (i % 20, i.toLong, 1L + rnd.nextInt(50).toLong)
    }
    val caps = lines.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._3).sum * 2 / 3 }
    val rdf = lines.map { case (g, l, d) => (g, l, d, caps(g)) }
      .toDF("g", "l", "d", "cap")
    val out = Relational.waterfill(rdf, "g", "l", "d", "cap")
      .as[(Int, Long, Long, Long)].collect()
    out.foreach { case (_, l, d, a) =>
      assert(a <= d && a >= 0, s"line $l alloc $a vs demand $d") }
    out.groupBy(_._1).foreach { case (g, xs) =>
      val total = lines.filter(_._1 == g).map(_._3).sum
      assert(xs.map(_._4).sum == math.min(caps(g), total), s"group $g") }
    // negative capacity is refused loudly, never silently allocated
    intercept[IllegalArgumentException] {
      Relational.waterfill(Seq(("g", 1L, 5L, -1L)).toDF("g", "l", "d", "cap"),
        "g", "l", "d", "cap").collect()
    }
  }

  test("validityAudit: overlap vs gap vs abut vs swallow, per key") {
    // key A: [0,10) then [5,12) overlap, then [12,15) abuts (clean),
    // then [20,25) gap — 1 overlap, 1 gap
    // key B: [0,100) swallows [10,20) (overlap even though it ends
    // earlier than the running max), then [30,40) ALSO overlaps the
    // running max 100 — the sweep rule, not adjacent-pair comparison
    // key C: a single interval and an empty [5,5) — 1 empty
    val iv = Seq(
      ("A", 0L, 10L, 1L), ("A", 5L, 12L, 2L), ("A", 12L, 15L, 3L),
      ("A", 20L, 25L, 4L),
      ("B", 0L, 100L, 1L), ("B", 10L, 20L, 2L), ("B", 30L, 40L, 3L),
      ("C", 0L, 3L, 1L), ("C", 5L, 5L, 2L))
      .toDF("k", "f", "t", "ok")
    val got = Relational.validityAudit(iv, "k", "f", "t", Seq("ok"))
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 4L, 1L, 1L, 0L, false)))
    assert(got("B") == (("B", 3L, 2L, 0L, 0L, false)))
    assert(got("C") == (("C", 2L, 0L, 1L, 1L, false)))
  }

  test("kendallTauB: perfect concordance, ties, and the textbook half") {
    import spark.implicits._
    // strictly increasing -> tau = 1
    val inc = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val r1 = graft.operators.Relational.kendallTauB(inc, "x", "y").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getDouble(3)) ==
      ((3L, 3L, 0L, 1.0)))
    // (1,1),(1,2),(2,2): one concordant pair, one x-tie, one y-tie ->
    // tau_b = 1 / sqrt(2*2) = 0.5
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val r2 = graft.operators.Relational.kendallTauB(tied, "x", "y").head()
    assert((r2.getLong(1), r2.getLong(2), r2.getDouble(3)) == ((1L, 0L, 0.5)))
  }

  test("cramersV: perfect association reads 1, empty cells pay chi2") {
    import spark.implicits._
    // x == y perfectly on a 2x2: chi2 = n, V = 1 — but ONLY if the two
    // empty off-diagonal cells contribute their expected counts
    val df = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("u", "v")
    val rows = graft.operators.Relational.cramersV(df, "u", "v").collect()
    assert(rows.length == 4, "full R x C spine incl. empty cells")
    val r = rows.head
    assert(r.getDouble(5) == 4.0 && r.getDouble(6) == 1.0)
    // independence: uniform 2x2 -> chi2 = 0, V = 0
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("u", "v")
    val r0 = graft.operators.Relational.cramersV(ind, "u", "v").head()
    assert(r0.getDouble(5) == 0.0 && r0.getDouble(6) == 0.0)
  }

  test("cochranArmitage: hand-computed dose trend") {
    import spark.implicits._
    // scores 0,1,2 with n = 4 each, successes 1,2,3:
    // N=12 Y=6 Swy=8 Swn=12 Swwn=20
    // T*N = 12*8 - 6*12 = 24; Var*N^3 = 6*6*(12*20-144) = 3456
    // Z = 24*sqrt(12)/sqrt(3456)
    val rows = (0 until 4).flatMap(i => Seq(
      (0L, i < 1), (1L, i < 2), (2L, i < 3))).toDF("w", "s")
    val got = graft.operators.Drift.cochranArmitage(rows, "w", col("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val z = 24.0 * math.sqrt(12.0) / math.sqrt(3456.0)
    assert(got(0L) == ((4L, 1L, 0.25, math.rint(z * 1e6) / 1e6)))
    assert(got(2L)._2 == 3L && got(2L)._3 == 0.75)
  }
  test("concentration: hand Gini/HHI/CR4 with ties, zero-total NULLs") {
    import spark.implicits._
    // a = [1,1,2]: 2Σi·x = 18 → G = (18-16)/12; HHI = 6/16; CR4 = 1
    // b = [5,5]: perfectly equal → G = 0, HHI = 0.5
    // z = [0,0]: zero total → NULL ratios, not 0/0
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L), ("b", 5L),
      ("z", 0L), ("z", 0L)).toDF("g", "x")
    val got = Relational.concentration(df, "g", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 4L)
    assert(a.getDouble(3) == 0.166667 && a.getDouble(4) == 0.375 &&
      a.getDouble(5) == 1.0)
    val b = got("b")
    assert(b.getDouble(3) == 0.0 && b.getDouble(4) == 0.5)
    val z = got("z")
    assert(z.isNullAt(3) && z.isNullAt(4) && z.isNullAt(5))
  }

  test("corrMatrix: perfect pair reads 1, inverse reads -1, all pairs") {
    import spark.implicits._
    val df = Seq((1L, 1L, 2L, 3L), (2L, 2L, 4L, 2L), (3L, 3L, 6L, 1L))
      .toDF("id", "x", "y", "w")
    val got = Relational.corrMatrix(df, "id", Seq("x", "y", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 3)
    assert(got(("x", "y")) == ((3L, 1.0)))
    assert(got(("w", "x")) == ((3L, -1.0)))
  }

  test("rankBiasedOverlap: identical lists sum the weights, disjoint = 0") {
    import spark.implicits._
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("item", "rnk")
    val same = Relational.rankBiasedOverlap(a, a, "item", "rnk", k = 3)
      .head()
    val wsum = Seq(0.1, 0.09, 0.081).map(w =>
      BigDecimal(w).setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(same.getLong(1) == 3L)
    assert(same.getDouble(2) ==
      wsum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = Seq((77L, 1L), (88L, 2L), (99L, 3L)).toDF("item", "rnk")
    val disj = Relational.rankBiasedOverlap(a, b, "item", "rnk", k = 3)
      .head()
    assert(disj.getLong(1) == 0L && disj.getDouble(2) == 0.0)
    // a swap deep in the list costs less than one at the top
    val swapTop = Seq((20L, 1L), (10L, 2L), (30L, 3L)).toDF("item", "rnk")
    val topCost = Relational.rankBiasedOverlap(a, swapTop, "item", "rnk", 3)
      .head().getDouble(2)
    assert(topCost < same.getDouble(2) && topCost > 0.0)
  }

  test("lMoments: hand lambda2 with ties, L-CV") {
    import spark.implicits._
    // A=[0,1]: λ2 = 0.5 (E|X1-X2|/2 of a fair coin); B tied → λ2 = 0;
    // C=[1,2,3]: numerator -2+0+6 = 4 → λ2 = 2/3
    val df = (Seq(0L, 1L).map(("A", _)) ++ Seq(10L, 10L).map(("B", _)) ++
      Seq(1L, 2L, 3L).map(("C", _))).toDF("g", "v")
    val got = Relational.lMoments(df, "g", "v")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 2L, 0.5, 0.5, 1.0)))
    assert(got("B") == (("B", 2L, 10.0, 0.0, 0.0)))
    assert(got("C") == (("C", 3L, 2.0, 0.666667, 0.333333)))
  }

  test("cramerVonMises: identical = 0 exactly, disjoint hand value") {
    import spark.implicits._
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "isa")
    assert(Relational.cramerVonMises(same, "v", col("isa"))
      .head().getDouble(2) == 0.0)
    // A=[1,2], B=[3,4]: U = 4+16+4+0 = 24 → T = 24/64
    val disj = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "isa")
    assert(Relational.cramerVonMises(disj, "v", col("isa"))
      .head().getDouble(2) == 0.375)
  }

  test("skewKurtosis: symmetric reads g1=0 g2=-1.5, constant reads NULL") {
    import spark.implicits._
    // [1,2,3]: mean 2, m2 = 2/3, m3 = 0, m4 = 2/3
    // g1 = 0; g2 = (2/3)/(4/9) - 3 = -1.5
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("c", 7L), ("c", 7L))
      .toDF("g", "v")
    val out = Relational.skewKurtosis(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out("a") == ((3L, Some(0.0), Some(-1.5))))
    assert(out("c") == ((2L, None, None)), "zero variance must yield NULLs")
  }

  test("andersonDarling: identical = 0 exactly, disjoint hand value") {
    import spark.implicits._
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "isa")
    assert(Relational.andersonDarling(same, "v", col("isa"))
      .head().getDouble(2) == 0.0)
    // A=[1,2], B=[3,4]: blocks v=1 term 4/(1·3), v=2 term 16/(2·2),
    // v=3 term 4/(3·1), v=4 excluded → (4/3 + 4 + 4/3)/4 = 1.666667
    val disj = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "isa")
    assert(Relational.andersonDarling(disj, "v", col("isa"))
      .head().getDouble(2) == 1.666667)
  }

  test("curveKnee: exact cross-product argmax finds the elbow") {
    import spark.implicits._
    // concave curve; chord (1,10)->(6,33): |cross| peaks at x=3 (34)
    val pts = Seq((1L, 10L), (2L, 19L), (3L, 26L), (4L, 30L), (5L, 32L),
      (6L, 33L)).toDF("x", "y")
    val r = graft.operators.Relational.curveKnee(pts, "x", "y").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 3L && r.getLong(4) == 26L)
    assert(r.getDouble(5) == 34.0)
  }

  test("partialCorr: confounder partialled out, degenerate conditioning NULL") {
    import spark.implicits._
    // z drives both; within each z level x and y swap → r_xy·z = -1
    val df = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 3L), (4L, 3L, 3L))
      .toDF("x", "y", "z")
    val r = graft.operators.Relational.partialCorr(df, "x", "y", "z").head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.6) // raw r_xy looks positive
    assert(r.getDouble(4) == -1.0) // conditioned on z it is exactly opposed
    // x == z: conditioning correlation is 1 → denominator 0 → NULL
    val dg = Seq((1L, 5L, 1L), (2L, 9L, 2L), (3L, 4L, 3L)).toDF("x", "y", "z")
    assert(graft.operators.Relational.partialCorr(dg, "x", "y", "z")
      .head().isNullAt(4))
  }

  test("newsvendor: uniform demand 1..4 at fractile 0.75 orders 3 with " +
    "hand-exact expected costs") {
    import spark.implicits._
    // cu=3, co=1 -> r = 0.75; F(3) = 0.75 exactly -> q* = 3;
    // Eu = (4-3)/4, Eo = (3*3 - 6)/4, cost = 3*0.25 + 1*0.75
    val d = Seq(("p", 1L), ("p", 2L), ("p", 3L), ("p", 4L),
      ("hi", 10L), ("hi", 10L)).toDF("k", "v")
    val got = graft.operators.Relational.newsvendor(d, "k", "v", 3.0, 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = got("p")
    assert(p.getLong(2) == 3L && p.getDouble(3) == 0.75, s"q*: $p")
    assert(p.getDouble(4) == 0.25 && p.getDouble(5) == 0.75 &&
      p.getDouble(6) == 1.5, s"expected costs: $p")
    val hi = got("hi")
    assert(hi.getLong(2) == 10L && hi.getDouble(4) == 0.0 &&
      hi.getDouble(5) == 0.0, s"constant demand orders itself: $hi")
  }

  test("atkinsonIndex: {1, 100} reads 1 - 10/50.5, non-positive rows " +
    "are excluded but counted, all-non-positive keys NULL") {
    import spark.implicits._
    val d = Seq(("a", 1L), ("a", 100L), ("b", 5L), ("b", 5L), ("b", -3L),
      ("z", 0L)).toDF("k", "v")
    val got = graft.operators.Relational.atkinsonIndex(d, "k", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(math.abs(a.getDouble(4) - (1.0 - 10.0 / 50.5)) < 1e-6,
      s"geomean 10 vs mean 50.5: $a")
    val b = got("b")
    assert(b.getLong(1) == 3L && b.getLong(2) == 2L,
      s"the -3 row is counted but excluded: $b")
    assert(b.getDouble(4) == 0.0, s"equal positives read zero: $b")
    assert(got("z").isNullAt(4) && got("z").isNullAt(3),
      s"no positive mass refuses: ${got("z")}")
  }

  test("erlangStaffing: 2 Erlangs at a 20% wait target staffs 4 servers " +
    "with the textbook wait probability; zero load refuses") {
    import spark.implicits._
    // 24/hour at 300 s handle time -> a = 2; Erlang-C: C(3)=4/9 > 0.2,
    // C(4) = 0.173913 <= 0.2 -> c* = 4, utilization 1/2
    val hours = (0 until 12).map(h => ("et", h.toLong, 24L)) ++
      (0 until 12).map(h => ("idle", h.toLong, 0L))
    val got = graft.operators.Relational.erlangStaffing(
      hours.toDF("k", "h", "n"), "k", "n",
      serviceTimeSec = 300.0, targetWait = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    val e = got("et")
    assert(e.getDouble(2) == 2.0, s"offered load: $e")
    assert(e.getLong(3) == 4L, s"smallest passing c: $e")
    assert(math.abs(e.getDouble(4) - 0.173913) < 1e-6, s"C(4, 2): $e")
    assert(e.getDouble(5) == 0.5, s"utilization a/c: $e")
    assert(got("idle").isNullAt(3) && got("idle").getDouble(2) == 0.0,
      s"zero load refuses: ${got("idle")}")
  }

  test("xyzClasses: constant demand reads X at cv 0, a half-empty spine " +
    "reads the exact boundary Z, absent buckets count as zeros") {
    import spark.implicits._
    // T = 8; "c" fills every week with 4 -> cv 0 -> X; "h" fills 4 of 8
    // weeks with 4 -> mean 2, var = 4, cv = 1 exactly -> Z (boundary);
    // "m" fills 6 of 8 with 4 -> mean 3, var = 3, cv = 0.577 -> Y
    val rows = (0 until 8).map(w => ("c", w.toLong, 4L)) ++
      (0 until 4).map(w => ("h", w.toLong, 4L)) ++
      (0 until 6).map(w => ("m", w.toLong, 4L))
    val got = graft.operators.Relational.xyzClasses(
      rows.toDF("k", "w", "v"), "k", "v", totalBuckets = 8L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("c").getDouble(3) == 0.0 && got("c").getString(4) == "X",
      s"constant: ${got("c")}")
    assert(got("h").getDouble(3) == 1.0 && got("h").getString(4) == "Z",
      s"half-empty boundary: ${got("h")}")
    assert(got("m").getString(4) == "Y" &&
      math.abs(got("m").getDouble(3) - math.sqrt(3.0) / 3.0) < 1e-6,
      s"middle: ${got("m")}")
  }

  test("priceIndices: base-weighted vs current-weighted baskets " +
    "disagree exactly as the hand baskets say") {
    import spark.implicits._
    // item1: p 2→3 at q 10/10; item2: p 10→8 at q 10/5; item3 unmatched
    // L = (30+80)/(20+100) = 11/12, P = (30+40)/(20+50) = 1
    val df = Seq((1L, 0L, 20L, 10L), (1L, 1L, 30L, 10L),
      (2L, 0L, 100L, 10L), (2L, 1L, 40L, 5L), (3L, 0L, 7L, 1L))
      .toDF("item", "p", "cents", "q")
    val r = graft.operators.Relational.priceIndices(df, col("item"),
      col("p"), col("cents"), col("q"), basePeriod = 0L, curPeriod = 1L)
      .head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == math.rint(11.0 / 12.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == math.rint(math.sqrt(11.0 / 12.0) * 1e6) / 1e6)
  }

  test("jarqueBera: hand moments land the chi-square; flat groups NULL") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq.fill(4)(("c", 7L))).toDF("g", "v")
    val got = graft.operators.Relational.jarqueBera(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getDouble(2) == 0.0) // symmetric
    val m2 = 30.0 / 4 - 2.5 * 2.5
    val m4 = 88.5 - 4.0 * 2.5 * 25 + 6.0 * 2.5 * 2.5 * 7.5 -
      3.0 * 2.5 * 2.5 * 2.5 * 2.5
    val g2 = m4 / (m2 * m2) - 3.0
    assert(a.getDouble(3) == math.rint(g2 * 1e6) / 1e6)
    assert(a.getDouble(4) ==
      math.rint(4.0 / 6.0 * (g2 * g2 / 4.0) * 1e6) / 1e6)
    val c = got("c")
    assert(c.isNullAt(2) && c.isNullAt(4), "zero variance must refuse")
  }

  test("gTest: the 2x2 hand table lands G and its MI identity") {
    import spark.implicits._
    // cells 30/10/10/30 on 40-40 margins: every E = 20
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val r = graft.operators.Relational.gTest(rows.toDF("s", "p"), "s", "p")
      .head()
    assert(r.getLong(0) == 80L && r.getLong(1) == 1L)
    def t(o: Double) = math.rint(o * math.log(o / 20.0) * 1e9) / 1e9
    val gs = 2 * t(30) + 2 * t(10)
    assert(r.getDouble(2) == math.rint(2.0 * gs * 1e6) / 1e6)
    assert(r.getDouble(3) == math.rint(gs / 80.0 * 1e6) / 1e6)
  }

  test("adjustedResiduals: the dependent cells flag at |adj| > 2") {
    import spark.implicits._
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val got = graft.operators.Relational.adjustedResiduals(
      rows.toDF("s", "p"), "s", "p")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ax = got(("a", "x"))
    assert(ax.getLong(2) == 30L && ax.getDouble(3) == 20.0)
    // denom = 20·(1/2)·(1/2) = 5 → adj = 10/√5
    assert(ax.getDouble(5) == math.rint(10.0 / math.sqrt(5.0) * 1e6) / 1e6)
    assert(ax.getBoolean(6))
    assert(got(("a", "y")).getDouble(5) ==
      -math.rint(10.0 / math.sqrt(5.0) * 1e6) / 1e6)
  }

  test("gkGamma: hand census lands C/D/tie split, gamma and both D's") {
    import spark.implicits._
    // cells (1,1):1 (1,2):1 (2,1):1 (2,2):2 → of the 10 pairs:
    // C=2, D=1, tied-x-only=3, tied-y-only=3, tied-both=1
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 2L))
      .toDF("x", "y")
    val r = graft.operators.Relational.gkGamma(df, "x", "y").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 2L, 1L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((3L, 3L, 1L)))
    assert(r.getDouble(6) == math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(r.getDouble(7) == math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(r.getDouble(8) == math.rint(1.0 / 6.0 * 1e6) / 1e6)
    // a perfect ordering reads 1 everywhere; one-cell degenerate NULLs
    val perfect = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val p = graft.operators.Relational.gkGamma(perfect, "x", "y").head()
    assert(p.getDouble(6) == 1.0 && p.getDouble(7) == 1.0 &&
      p.getDouble(8) == 1.0)
    val one = Seq((1L, 1L), (1L, 1L)).toDF("x", "y")
    val o = graft.operators.Relational.gkGamma(one, "x", "y").head()
    assert(o.isNullAt(6) && o.isNullAt(7) && o.isNullAt(8))
  }

  test("lorenzCurve: tie groups apportion decile cuts exactly; " +
    "concentrated value shows in the bottom shares") {
    // "a": nine 1s and one 91 — bottom 90% holds 9% of value
    val a = (1 to 9).map(_ => ("a", 1L)) :+ (("a", 91L))
    // "b": four equal 5s — k=1 cut takes ONE unit out of the tie group
    val b = (1 to 4).map(_ => ("b", 5L))
    val got = Relational.lorenzCurve((a ++ b).toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val a9 = got(("a", 9L))
    assert(a9.getLong(3) == 9L && a9.getLong(4) == 9L)
    assert(a9.getDouble(6) == 0.09)
    assert(got(("a", 10L)).getDouble(6) == 1.0)
    // b: n=4 so deciles 1..2 cut at k=0 (zero rows), decile 3 at k=1
    assert(got(("b", 1L)).getLong(4) == 0L)
    val b3 = got(("b", 3L))
    assert(b3.getLong(3) == 1L && b3.getLong(4) == 5L)
    assert(b3.getDouble(6) == 0.25)
    assert(got(("b", 5L)).getLong(4) == 10L &&
      got(("b", 5L)).getDouble(6) == 0.5)
    // every group emits exactly 10 decile rows
    assert(got.keys.count(_._1 == "a") == 10 &&
      got.keys.count(_._1 == "b") == 10)
  }

  test("lorenzFromCensus: split censuses add back to the one-pass table") {
    val rows = Seq(("g", 1L), ("g", 1L), ("g", 3L), ("g", 7L), ("g", 7L))
      .toDF("g", "v")
    val whole = Relational.lorenzCurve(rows, "g", "v").collect().toSeq
    val half1 = Seq(("g", 1L, 1L), ("g", 3L, 1L), ("g", 7L, 1L))
      .toDF("g", "x", "t")
    val half2 = Seq(("g", 1L, 1L), ("g", 7L, 1L)).toDF("g", "x", "t")
    val merged = Relational.lorenzFromCensus(half1.unionByName(half2))
      .collect().toSeq
    assert(merged == whole)
  }

  test("concurrencySweep: overlap peaks where intervals stack, and " +
    "both Little's-law sides agree") {
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 21L)).toDF("s", "e")
    val r = Relational.concurrencySweep(iv, "s", "e").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 21L && r.getLong(2) == 21L)
    assert(r.getDouble(5) == 1.0) // l_avg = 21 busy / 21 span
    assert(r.getDouble(6) == 1.0) // λ·W lands the same number
    assert(r.getLong(7) == 2L && r.getLong(8) == 5L)
  }

  test("concurrencyFromCensus: split partials drain to the one-pass " +
    "sweep") {
    val iv = Seq((0L, 10L), (5L, 15L), (20L, 21L), (7L, 9L)).toDF("s", "e")
    val whole = Relational.concurrencySweep(iv, "s", "e").head()
    import org.apache.spark.sql.types.DecimalType
    val d38 = DecimalType(38, 0)
    def part(rows: Seq[(Long, Long)]) = {
      val df = rows.toDF("s", "e")
      (df.select(lit(1L).as("cnt"), col("s"), col("e"),
        (col("e") - col("s")).cast(d38).as("dur")),
        df.select(col("s").as("sec"), lit(1L).as("d"))
          .unionByName(df.select(col("e").as("sec"), lit(-1L).as("d"))))
    }
    val (t1, b1) = part(Seq((0L, 10L), (20L, 21L)))
    val (t2, b2) = part(Seq((5L, 15L), (7L, 9L)))
    val merged = Relational.concurrencyFromCensus(
      t1.unionByName(t2), b1.unionByName(b2)).head()
    assert(merged == whole)
  }

  test("ltvCurve: cohorts anchor on each unit's own first date and " +
    "cumulate per capita") {
    import java.sql.Date
    val rows = Seq(
      (1L, Date.valueOf("2020-01-01"), 1000L),
      (1L, Date.valueOf("2020-01-10"), 2000L),
      (2L, Date.valueOf("2020-06-01"), 3000L),
      (3L, Date.valueOf("2021-03-05"), 5000L))
      .toDF("u", "d", "v")
    val got = Relational.ltvCurve(rows, "u", "d", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val w0 = got((2020L, 0L))
    assert(w0.getLong(2) == 2L && w0.getLong(3) == 4000L)
    assert(w0.getLong(5) == 2L && w0.getDouble(6) == 2000.0)
    val w1 = got((2020L, 1L))
    assert(w1.getLong(3) == 2000L && w1.getLong(4) == 6000L)
    assert(w1.getDouble(6) == 3000.0)
    assert(got((2021L, 0L)).getDouble(6) == 5000.0)
  }

  test("joinCardinalityAudit: exact output rows and fan-out ranking " +
    "from the censuses alone") {
    val left = Seq("a", "a", "b").toDF("k")
    val right = Seq("a", "a", "a", "c", "c", "c", "c").toDF("k")
    val rows = Relational.joinCardinalityAudit(left, right, "k", "k")
      .collect()
    assert(rows.length == 1) // only "a" matches
    val r = rows.head
    assert(r.getString(1) == "a" && r.getLong(2) == 2L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 6L && r.getLong(5) == 6L && r.getLong(6) == 1L)
    assert(r.getDouble(7) == math.rint(6.0 / 7.0 * 1e6) / 1e6)
    assert(r.getDouble(8) == 1.0)
  }

  test("skyline: dominated cells drop, price ties keep the best y, " +
    "exact (x, y) ties ride together") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 9L), (3L, 20L, 9L),
      (4L, 20L, 12L), (5L, 30L, 12L), (6L, 30L, 20L), (7L, 10L, 9L))
      .toDF("id", "price", "qty")
    val got = Relational.skyline(rows, "id", col("price"), col("qty"))
      .collect()
    // frontier: (10, 9) [ids 2 and 7 tie on], (20, 12), (30, 20)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10L, 9L), (20L, 12L), (30L, 20L)))
    assert(got.head.getLong(2) == 2L && got.head.getLong(3) == 2L)
  }

  test("fixedEffects: a within-unit effect survives between-unit " +
    "confounding that flips the pooled slope") {
    import spark.implicits._
    // unit A: high baseline, x mostly 1; unit B: low baseline, x mostly
    // 0 — within each unit x ADDS 1 to y, but pooled the baselines
    // dominate with the OPPOSITE alignment
    val a = Seq((0L, 10L), (0L, 10L), (1L, 11L), (1L, 11L), (1L, 12L),
      (1L, 10L)).map { case (x, y) => ("A", x, y) }
    val b = Seq((0L, 30L), (0L, 29L), (0L, 31L), (0L, 30L), (1L, 31L),
      (1L, 31L)).map { case (x, y) => ("B", x, y) }
    val r = graft.operators.Relational.fixedEffects(
      (a ++ b).toDF("u", "x", "y"), col("u"), col("x"), col("y")).head()
    assert(r.getLong(0) == 12L && r.getLong(1) == 2L)
    assert(r.getDouble(2) > 0.7 && r.getDouble(2) < 1.3,
      s"within effect is ~+1: $r")
    assert(r.getDouble(4) > 2.0, s"and clearly nonzero: $r")
    assert(r.getDouble(5) < 0.0,
      s"the pooled slope is confounded negative: $r")
  }

  test("oaxacaBlinder: identical returns make the gap fully explained") {
    import spark.implicits._
    // both groups: y = 2x exactly; A simply has higher x
    val a = Seq(10L, 20L, 30L).map(x => (true, x, 2 * x))
    val b = Seq(1L, 2L, 3L).map(x => (false, x, 2 * x))
    val r = graft.operators.Relational.oaxacaBlinder(
      (a ++ b).toDF("isa", "x", "y"), col("isa"), col("x"), col("y"))
      .head()
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 36.0)
    assert(r.getDouble(5) == 36.0 && r.getDouble(6) == 0.0)
    assert(r.getDouble(7) == 1.0)
  }
}
