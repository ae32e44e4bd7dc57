package graft

import graft.operators.Affinity

class AffinitySpec extends SparkSuite {
  import spark.implicits._

  // baskets: {1: a b c}, {2: a b}, {3: a}, {4: b c} — with a duplicate
  // (1, a) row that must not double-count
  private def baskets = Seq(
    (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"), (3L, "a"), (4L, "b"), (4L, "c"))
    .toDF("bk", "it")

  test("pairCounts dedups within a basket and counts unordered pairs once") {
    val got = Affinity.pairCounts(baskets, "bk", "it")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 2L))
  }

  test("assocRules: exact support/confidence/lift both orientations") {
    val got = Affinity.assocRules(baskets, "bk", "it")
      .select("ante", "cons", "n_ab", "n_ante", "n_cons", "support",
        "confidence", "lift")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // supports: a=3, b=3, c=2 over 4 baskets
    val ab = got(("a", "b"))
    assert(ab._3 == 2L && ab._4 == 3L && ab._5 == 3L)
    assert(ab._6 == 0.5)                        // 2/4
    assert(math.abs(ab._7 - 2.0 / 3.0) < 1e-6)  // 2/3
    assert(math.abs(ab._8 - 8.0 / 9.0) < 1e-6)  // 2*4/(3*3)
    val cb = got(("c", "b"))
    assert(cb._7 == 1.0)                        // c always with b
    assert(math.abs(cb._8 - 4.0 / 3.0) < 1e-6)  // 2*4/(2*3)
    // both orientations present, confidence direction-sensitive
    assert(got(("b", "c"))._7 != got(("c", "b"))._7)
  }

  test("assocRules minSupport prunes pairs, not items") {
    val got = Affinity.assocRules(baskets, "bk", "it", minSupport = 2L)
      .select("ante", "cons").as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
  }

  test("itemNeighbors ranks by cosine with deterministic ties") {
    val got = Affinity.itemNeighbors(baskets, "bk", "it", k = 2)
      .select("item", "rank", "neighbor", "cosine")
      .as[(String, Long, String, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toList }
    // for a: cos(a,b) = 2/3 ≈ .667 beats cos(a,c) = 1/sqrt(6) ≈ .408
    assert(got("a") == List("b", "c"))
    // for b: cos(b,a) = 2/3 vs cos(b,c) = 2/sqrt(6) ≈ .816 → c first
    assert(got("b") == List("c", "a"))
  }

  test("eventuallyFollows: strict first-occurrence precedence per case") {
    import spark.implicits._
    // u1: a@1, b@2, c@2 (b/c tie → neither direction); a repeats late
    // but only FIRST occurrences compare. u2: b@1, a@3.
    val ev = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 2L),
      (1L, "a", 9L), (2L, "b", 1L), (2L, "a", 3L))
      .toDF("u", "act", "t")
    val got = Affinity.eventuallyFollows(ev, "u", "act", "t")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 0.5))))
  }
}
