package graft

import graft.operators.Attribution

class AttributionSpec extends SparkSuite {
  import spark.implicits._

  test("markovRemoval: hand-computed two-channel journey model") {
    // start → A (1/2) → conv (always); start → B (1/2) → drop (always).
    // Base absorption = 0.5, all of it through A: removing A zeroes
    // conversion, removing B changes nothing.
    val tr = Seq(
      ("start", "A", 5L), ("start", "B", 5L),
      ("A", "conv", 5L), ("B", "drop", 5L))
      .toDF("src", "dst", "n")
    val got = Attribution.markovRemoval(tr, Seq("A", "B"), steps = 4)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got("A") == ((1.0, 1.0)), "all credit flows through A")
    assert(got("B") == ((0.0, 0.0)))
  }

  test("markovRemoval: chained channel gets credit for downstream mass") {
    // start → A → B → conv; removing either zeroes conversion entirely.
    val tr = Seq(
      ("start", "A", 4L), ("A", "B", 4L), ("B", "conv", 4L))
      .toDF("src", "dst", "n")
    val got = Attribution.markovRemoval(tr, Seq("A", "B"), steps = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("A") == 1.0 && got("B") == 1.0)
  }

  test("markovRemoval truncates mass beyond the step bound deterministically") {
    // a 3-hop chain under a 2-step budget: conv unreachable → require fires
    val tr = Seq(
      ("start", "A", 1L), ("A", "B", 1L), ("B", "C", 1L), ("C", "conv", 1L))
      .toDF("src", "dst", "n")
    assertThrows[IllegalArgumentException](
      Attribution.markovRemoval(tr, Seq("A", "B", "C"), steps = 2))
    // with enough steps the same chain converts fully
    val ok = Attribution.markovRemoval(tr, Seq("A", "B", "C"), steps = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ok("A") == 1.0 && ok("B") == 1.0 && ok("C") == 1.0)
  }

  test("shapley: hand-computed two-channel game plus the efficiency axiom") {
    // 10 converters touched only A (mask 1), 4 touched both (mask 3):
    // v({A})=10, v({B})=0, v({A,B})=14 → φ_A = ½·10 + ½·14 = 12, φ_B = 2
    val masks = Seq((1, 10L), (3, 4L)).toDF("mask", "n")
    val phi = Attribution.shapley(masks, Seq(("A", 1), ("B", 2)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(phi == Map("A" -> 12.0, "B" -> 2.0))
    // efficiency: the shares exhaust v(full) − v(∅) exactly
    assert(phi.values.sum == 14.0)
    // channel bit assignments must be the low single bits
    assertThrows[IllegalArgumentException](
      Attribution.shapley(masks, Seq(("A", 1), ("B", 4))))
    // a mask with a bit outside the declared channels would silently
    // vanish from every coalition — it must fail loudly instead
    val stray = Seq((1, 10L), (5, 4L)).toDF("mask", "n")
    assertThrows[IllegalArgumentException](
      Attribution.shapley(stray, Seq(("A", 1), ("B", 2))))
  }

  test("absorbingMetrics: self-loop funnel, hand-traced integer series") {
    // start → A always; A loops on itself or converts (p = 1/2 each).
    // Exact fixpoint: E[A] = 2 steps, P(conv|A) = 1; the 8-round
    // truncated integer series lands at the hand-traced values
    //   st8[A] = 1996093 (µsteps), cv8[A] = 998046875 (p9)
    //   st8[start] = 1e6 + st7[A] = 2992187, cv8[start] = cv7[A]
    val tr = Seq(("start", "A", 1L), ("A", "A", 1L), ("A", "conv", 1L))
      .toDF("src", "dst", "n")
    val out = Attribution.absorbingMetrics(tr, Seq("A"), steps = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("A") == ((2L, 1.996093, 0.998047, 0.0)))
    assert(out("start") == ((1L, 2.992187, 0.996094, 0.0)))
    // a channel with no outgoing mass is a contract violation, not a NPE
    assertThrows[IllegalArgumentException](
      Attribution.absorbingMetrics(tr, Seq("A", "ghost"), steps = 4))
  }
  test("positionCredits: hand journeys, all four rules in one table") {
    import spark.implicits._
    // u1: a->b->c (U = 0.4/0.2/0.4); u2: b alone (all rules give 1)
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "b")).toDF("j", "o", "ch")
    val got = graft.operators.Attribution.positionCredits(df, "j", "o", "ch")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("a") == ((1L, 1L, 0L, 0.333333, 0.4)))
    assert(got("b") == ((2L, 1L, 1L, 1.333333, 1.2)))
    assert(got("c") == ((1L, 0L, 1L, 0.333333, 0.4)))
  }

}
