package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage
import graft.plans.JaroWinklerImpl
import graft.plans.StringSimilarityExpressions.jaroWinkler

class StringSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("JaroWinklerImpl reproduces the textbook reference values") {
    assert(JaroWinklerImpl.jw("martha", "marhta") == 0.9611111111111111)
    assert(JaroWinklerImpl.jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(JaroWinklerImpl.jw("duane", "dwayne") == 0.8400000000000001)
    assert(JaroWinklerImpl.jw("a", "ab") == 0.8500000000000001)
    assert(JaroWinklerImpl.jw("abc", "abc") == 1.0)
    assert(JaroWinklerImpl.jw("abc", "xyz") == 0.0)
    assert(JaroWinklerImpl.jw("", "") == 1.0)
    assert(JaroWinklerImpl.jw("", "x") == 0.0)
  }

  test("codegen jaro_winkler equals the Scala reference bit-for-bit") {
    val names = Seq("martha", "marhta", "dixon", "dicksonx", "duane",
      "dwayne", "", "a", "ab", "Customer#000000001", "Customer#000000010")
    val pairs = for (x <- names; y <- names) yield (x, y)
    val rows = pairs.toDF("x", "y")
      .select(col("x"), col("y"), jaroWinkler(col("x"), col("y")).as("sim"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == JaroWinklerImpl.jw(r.getString(0), r.getString(1)),
        s"(${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("fuzzyJoin scores only within blocks and applies the threshold") {
    val a = Seq((1L, "jon smith", "j"), (2L, "ann lee", "a"))
      .toDF("k", "name", "ignored")
    val b = Seq((10L, "john smith"), (20L, "ann leigh"), (30L, "jon smith"))
      .toDF("k", "name")
    // block on the first character: ann never meets the jons
    val out = Linkage.fuzzyJoin(a, b, "k", "name",
        expr("substring(name, 1, 1)"), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 30L)), "exact pair must match at 1.0")
    assert(out.contains((1L, 10L)), "one-insertion pair scores above 0.9")
    assert(!out.contains((2L, 30L)), "cross-block pairs are never scored")
    assert(out.forall(_._1 != 2L) ==
      (JaroWinklerImpl.jw("ann lee", "ann leigh") < 0.9))
  }

  test("goldenRecord resolves each field independently by (has, trust, id)") {
    // cluster 1: trusted row misses the balance, untrusted has it — the
    // golden record must MIX name (trusted) with balance (untrusted);
    // trust tie in cluster 2 breaks to the higher id
    val recs = Seq(
      (1L, 10L, 2L, "Alice", Option.empty[Long], Option("RETAIL")),
      (1L, 11L, 1L, "Alyce", Option(500L), Option.empty[String]),
      (2L, 20L, 1L, "Bob", Option(1L), Option("AUTO")),
      (2L, 21L, 1L, "Bobby", Option(2L), Option("BIKE")))
      .toDF("cluster", "rid", "trust", "name", "bal", "seg")
    val out = Linkage.goldenRecord(recs, "cluster", "rid", "trust",
      Seq("name", "bal", "seg")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((2L, "Alice", 500L, "RETAIL")),
      "per-field: trusted name + untrusted balance in ONE golden record")
    assert(out(2L) == ((2L, "Bobby", 2L, "BIKE")),
      "equal trust: the higher record id wins every field")
  }

  test("fellegiSunter: EM separates a noisy two-field mixture") {
    import spark.implicits._
    // 40 all-agree + 40 all-disagree pairs with 10+10 noise pairs: EM
    // must learn m >> u on both fields and a match share near 0.5
    val pairs = (Seq.fill(40)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(40)((false, false)))
      .toDF("f1", "f2")
    val got = Linkage.fellegiSunter(pairs, Seq("f1", "f2"), iters = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    for (f <- Seq("f1", "f2")) {
      val (m, u, wa, wd, lam) = got(f)
      assert(m > 0.7 && u < 0.3, s"$f: m=$m u=$u must separate")
      assert(wa > 0.0 && wd < 0.0, s"$f: weights must have LR signs")
      assert(lam > 0.3 && lam < 0.7, s"prevalence ~0.5, got $lam")
    }
    // retry-stable: EM is a pure function of the census
    val again = Linkage.fellegiSunter(pairs, Seq("f1", "f2"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.map { case (k, v) => k -> v._1 } == again)
  }
}
