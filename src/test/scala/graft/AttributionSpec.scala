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
}
