package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Sampling}
import graft.sources.Tables

class SamplingSpec extends SparkSuite {

  test("deterministic sample is stable across runs and monotone in size") {
    val docs = Tables.load(spark, sf, "documents")
    val s1 = Sampling.deterministicSample(docs, "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val s8 = Sampling.deterministicSample(docs, "doc_id", 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s8)) // growing the rate never drops selected rows
    assert(s1.nonEmpty && s8.size > s1.size)
  }

  test("stratified sample returns at most N per stratum, deterministically") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id", 7)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 7))
    assert(counts.values.sum == out.count())
  }

  test("temperature balancing gives √count quotas, chosen by md5 rank") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Sampling.temperatureBalanced(docs, "lang", "doc_id", target = 100)
    val picked = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max(col("quota")).as("q")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(picked.values.forall { case (n, q) => n == math.min(q, n) && n <= q },
      "each stratum fills exactly up to its quota")
    assert(picked.values.map(_._1).sum <= 100, "floors never exceed the target")
    // √-temperature flattens the distribution: the dominant stratum's
    // quota share must sit BELOW its raw count share
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val top = counts.maxBy(_._2)._1
    val quotaShare = picked(top)._2.toDouble / picked.values.map(_._2).sum
    val countShare = counts(top).toDouble / counts.values.sum
    assert(quotaShare < countShare)
    // reproducible: a second run selects the identical rows
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.temperatureBalanced(docs, "lang", "doc_id", 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("mixtureSchedule interleaves classes in weight proportion") {
    import spark.implicits._
    // a:2 b:1 → strides 1 and 2: over any 3 consecutive vt units class a
    // appears twice per b's once; classes without a weight are excluded
    val df = (1L to 6L).map(i => (i, "a")) ++ (1L to 3L).map(i => (i + 100, "b")) ++
      Seq((999L, "c"))
    val out = Sampling.mixtureSchedule(
      df.toDF("id", "cls"), "cls", "id", Map("a" -> 2L, "b" -> 1L))
      .orderBy(col("vt"), col("cls"), col("id"))
      .select("cls", "vt").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1L), ("a", 2L), ("b", 2L), ("a", 3L),
      ("a", 4L), ("b", 4L), ("a", 5L), ("a", 6L), ("b", 6L)))
  }

  test("perKeyCap keeps a stable md5-ranked subset per key") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, if (i <= 25) "big" else "small"))
      .toDF("id", "k")
    val out = Sampling.perKeyCap(df, "k", "id", cap = 10L)
    val byKey = out.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("big" -> 10L, "small" -> 5L))
    // reproducible: identical keep set on a rerun
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.perKeyCap(df, "k", "id", cap = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 15)
  }

  test("epochShardOrder: reproducible per epoch, reseeded across epochs") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    def order(epoch: Long) = Sampling.epochShardOrder(df, "id", epoch, 4)
      .select("shard", "pos", "id").as[(Long, Long, Long)].collect().toSet
    val e1 = order(1L)
    assert(e1 == order(1L), "same epoch must replay identically")
    assert(e1 != order(2L), "a new epoch must reshuffle")
    // every shard numbers densely from 1 (the resume contract)
    val byShard = e1.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    byShard.foreach { case (_, ps) => assert(ps == (1L to ps.length)) }
    assert(e1.map(_._3).size == 200, "partition, not sample: all rows appear")
  }

  test("frame sampling emits every 4th frame with byte offsets") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 450)).toDF("doc_id", "text") // 4 frames of 100B
    val frames = Multimodal.sampleFrames(Multimodal.attachPayload(docs))
      .select("frame_idx", "frame_offset")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(frames == Seq((0L, 0L), (4L, 400L)).filter(_._1 < 4) ++ Seq())
    // 450 bytes => 4 frames (0..3), step 4 keeps only frame 0
    assert(frames == Seq((0L, 0L)))
  }

  test("systematicPps: k crossings per stratum, heavy rows always selected, stable") {
    import spark.implicits._
    val rows = (1 to 40).map(i => ("s1", i.toLong, 10L)) :+
      ("s1", 99L, 600L) // heavy: w > W/k = 1000/10 → guaranteed pick
    val df = rows.toDF("s", "id", "w")
    val out = Sampling.systematicPps(df, "s", "id", "w", 10)
      .select($"id", $"n_crossings").as[(Long, Long)].collect().toMap
    assert(out.values.sum == 10L, "crossing multiplicities must sum to k")
    assert(out.contains(99L), "a row with w >= W/k must always be selected")
    assert(out(99L) == 6L, "the heavy row spans 600/1000 of the ring = 6 steps")
    val again = Sampling.systematicPps(df, "s", "id", "w", 10)
      .select($"id", $"n_crossings").as[(Long, Long)].collect().toMap
    assert(again == out, "selection must be deterministic across runs")
  }

  test("largestRemainderSplit: integer-exact quotas, every row assigned once") {
    import spark.implicits._
    // stratum a: 10 rows → 8/1/1 exactly; stratum b: 7 rows → bases 5/0/0,
    // remainders 60/70/70 → the two extras go to val (idx 1) then test
    // (idx 2), so 5/1/1
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      (11 to 17).map(i => ("b", i.toLong))).toDF("s", "id")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val out = Sampling.largestRemainderSplit(df, "s", "id", splits)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(0))
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts == Map(("a", "train") -> 8, ("a", "val") -> 1,
      ("a", "test") -> 1, ("b", "train") -> 5, ("b", "val") -> 1,
      ("b", "test") -> 1))
    assert(out.map(_._2).distinct.length == 17, "each row lands exactly once")
    // deterministic: identical assignment on a rerun
    val again = Sampling.largestRemainderSplit(df, "s", "id", splits)
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(0))
    assert(again.toSet == out.toSet)
  }

  test("poissonBootstrap: deterministic, CI brackets the mean, ranks discrete") {
    import spark.implicits._
    val df = (1L to 200L).map(i => ("a", i, 10.0 + (i % 7))).toDF("s", "id", "v")
    val out = Sampling.poissonBootstrap(df, "s", "id", "v", b = 40, salt = "t1")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 200L)             // n
    assert(r.getLong(3) == 40L)              // every resample non-empty
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"80% CI [$lo, $hi] should bracket the mean $mean at n=200")
    // counter-based draws: bit-identical on a rerun
    val again = Sampling.poissonBootstrap(df, "s", "id", "v", b = 40, salt = "t1")
      .collect()(0)
    assert(again.getDouble(4) == lo && again.getDouble(5) == hi)
    // a different salt draws different weights → a different interval
    val other = Sampling.poissonBootstrap(df, "s", "id", "v", b = 40, salt = "t2")
      .collect()(0)
    assert(other.getDouble(4) != lo || other.getDouble(5) != hi)
  }

  test("balancedDownsample: empty input fails loudly, not with an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("cls", "id")
    val e = intercept[IllegalArgumentException](
      Sampling.balancedDownsample(empty, "cls", "id").collect())
    assert(e.getMessage.contains("empty input"))
  }

  test("temperatureMixing: sqrt weights, exact shares, effective epochs") {
    import spark.implicits._
    // a: 25 tokens → w=5; b: 4 tokens → w=2; budget 700 → shares 5/7, 2/7
    val df = Seq(("a", 9L), ("a", 16L), ("b", 4L)).toDF("g", "tok")
    val got = Sampling.temperatureMixing(df, "g", "tok", 700L)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 25L, 0.714285714, 500.0, 20.0)))
    assert(got("b") == (("b", 1L, 4L, 0.285714286, 200.0, 50.0)))
  }
  test("postStratify: hand reweighting, SE, unsampled stratum reported") {
    import spark.implicits._
    val pop = (Seq.fill(2)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("h")
    val sample = Seq(("a", 10L), ("b", 20L), ("b", 40L)).toDF("h", "v")
    val got = Sampling.postStratify(sample, pop, "h", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // W = (0.4, 0.4, 0.2); estimate = 0.4*10 + 0.4*30 = 16;
    // SE^2 = 0.16*200/2 = 16 -> SE = 4
    assert(got("a").getDouble(3) == 0.4 && got("c").getDouble(3) == 0.2)
    assert(got("b").getDouble(4) == 30.0)
    assert(got("a").getDouble(6) == 16.0 && got("a").getDouble(7) == 4.0)
    assert(!got("c").getBoolean(5) && got("c").isNullAt(4),
      "unsampled strata are reported, not renormalized away")
  }

  test("essWeights: equal weights read full, concentration shrinks it") {
    import spark.implicits._
    val df = (Seq.fill(4)(("a", 1L)) ++ Seq(("b", 3L), ("b", 1L))).toDF("g", "w")
    val got = Sampling.essWeights(df, "g", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(2) == 4.0 && got("a").getDouble(3) == 1.0)
    assert(got("b").getDouble(2) == 1.6 && got("b").getDouble(3) == 0.8)
  }

  test("essFromMoments: batch-split moment partials equal the one-pass path") {
    import spark.implicits._
    val rows = (Seq.fill(4)(("a", 1L)) ++ Seq(("b", 3L), ("b", 1L))).toDF("g", "w")
    val onePass = Sampling.essWeights(rows, "g", "w")
      .orderBy(col("g")).collect().toSeq
    def cen(df: org.apache.spark.sql.DataFrame) = {
      val w = col("w").cast(org.apache.spark.sql.types.DecimalType(38, 0))
      df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(w).as("sw"),
        sum(w * w).as("sww"))
    }
    val half1 = rows.limit(3)
    val half2 = rows.exceptAll(half1)
    val census = Sampling.essFromMoments(
        cen(half1).unionByName(cen(half2)))
      .orderBy(col("g")).collect().toSeq
    assert(census == onePass)
  }

  test("neymanAllocation: spread wins over size, budget lands exactly") {
    import spark.implicits._
    // stratum a: 4 constant rows (S=0, needs no sample); b: 2 spread rows
    val df = (Seq.fill(4)(("a", 10L)) ++ Seq(("b", 0L), ("b", 100L)))
      .toDF("h", "v")
    val got = Sampling.neymanAllocation(df, "h", "v", budget = 9L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(4) == 0L, "zero-variance stratum draws nothing")
    assert(got("b").getLong(4) == 9L)
    assert(got("b").getBoolean(5), "allocation over stratum size must flag")
    // all-degenerate spread falls back to proportional-to-size
    val flat = (Seq.fill(3)(("a", 5L)) ++ Seq.fill(1)(("b", 7L))).toDF("h", "v")
    val fb = Sampling.neymanAllocation(flat, "h", "v", budget = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(fb("a") == 3L && fb("b") == 1L)
  }

  test("rake: IPF hits the row target while keeping the observed col mix") {
    import spark.implicits._
    // A underrepresented (2/8 raw vs 0.5 target), B over (6/8)
    val rows = (Seq.fill(1)(("A", "x")) ++ Seq.fill(1)(("A", "y")) ++
      Seq.fill(6)(("B", "x"))).toDF("src", "lng")
    // IPF contracts geometrically (~5x per round on this skew): 6 rounds
    // land the row target within 1e-4, the column pass (run last) exactly
    val got = graft.operators.Sampling.rake(rows, "src", "lng", rounds = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val rowA = got(("A", "x")).getDouble(3) + got(("A", "y")).getDouble(3)
    val rowB = got(("B", "x")).getDouble(3)
    assert(math.abs(rowA - 0.5) < 1e-4 && math.abs(rowB - 0.5) < 1e-4,
      s"row marginals must converge to the 0.5 target: $rowA / $rowB")
    val colX = got(("A", "x")).getDouble(3) + got(("B", "x")).getDouble(3)
    assert(math.abs(colX - 7.0 / 8.0) < 2e-6,
      "the observed column mix is preserved (col pass runs last)")
    // the up/down-weighting direction is visible in the factors
    assert(got(("A", "x")).getDouble(4) > 1.0)
    assert(got(("B", "x")).getDouble(4) < 1.0)
  }
}