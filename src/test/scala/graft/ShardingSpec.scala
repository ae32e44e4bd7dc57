package graft

import graft.operators.Sharding

class ShardingSpec extends SparkSuite {
  import spark.implicits._

  test("ringAssign: total, deterministic, consistent under shard removal") {
    val keys = (1L to 500L).toDF("k")
    val s8 = (0 until 8).map(i => "shard-" + i)
    val a = Sharding.ringAssign(keys, "k", s8, 16)
      .as[(Long, String)].collect().toMap
    assert(a.size == 500)
    assert(a.values.toSet == s8.toSet, "every shard should carry load")
    val b = Sharding.ringAssign(keys, "k", s8, 16)
      .as[(Long, String)].collect().toMap
    assert(a == b, "routing must be a pure function of the key")
    // THE consistent-hashing property: removing one shard moves ONLY the
    // keys that lived on it — everyone else keeps their assignment
    val c = Sharding.ringAssign(keys, "k", s8.filterNot(_ == "shard-3"), 16)
      .as[(Long, String)].collect().toMap
    (1L to 500L).foreach { k =>
      if (a(k) == "shard-3") assert(c(k) != "shard-3")
      else assert(c(k) == a(k), s"key $k moved without its shard dying")
    }
  }

  test("rendezvousAssign: total, deterministic, minimal movement") {
    val keys = (1L to 500L).toDF("k")
    val s8 = (0 until 8).map(i => "shard-" + i)
    val a = Sharding.rendezvousAssign(keys, "k", s8)
      .as[(Long, String)].collect().toMap
    assert(a.size == 500 && a.values.toSet == s8.toSet)
    // JVM argmax referee: the operator must equal max-by-(h52, shard)
    def h52(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 13), 16)
    }
    (1L to 500L).foreach { k =>
      val want = s8.map(s => (h52(s"$k|$s"), s)).max._2
      assert(a(k) == want, s"key $k")
    }
    // minimal movement under removal
    val c = Sharding.rendezvousAssign(keys, "k",
      s8.filterNot(_ == "shard-5")).as[(Long, String)].collect().toMap
    (1L to 500L).foreach { k =>
      if (a(k) == "shard-5") assert(c(k) != "shard-5")
      else assert(c(k) == a(k), s"key $k moved without its shard dying")
    }
  }

  test("stableMatch: hand-traced deferred acceptance with a bump chain") {
    import spark.implicits._
    // 1: a>b>c, 2: a>c>b, 3: b>a>c; a ranks 2<1<3, b ranks 1<3<2.
    // DA: 1,2 clash on a (2 wins) -> 1 bumps 3 off b -> 3 tries a,
    // loses to 2 -> 3 lands on c. Proposer-optimal: 1-b, 2-a, 3-c.
    val prefs = Seq(
      (1L, "a", 1L, 2L), (1L, "b", 2L, 1L), (1L, "c", 3L, 1L),
      (2L, "a", 1L, 1L), (2L, "c", 2L, 2L), (2L, "b", 3L, 3L),
      (3L, "b", 1L, 2L), (3L, "a", 2L, 3L), (3L, "c", 3L, 3L))
      .toDF("agent", "target", "a_rank", "t_score")
    val got = graft.operators.Sharding.stableMatch(prefs, cap = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> (("b", 2L)), 2L -> (("a", 1L)),
      3L -> (("c", 3L))))
    // over-capacity: 3 agents, one target, cap 2 -> worst-scored agent
    // exhausts its list and reports NULL
    val one = Seq((1L, "t", 1L, 1L), (2L, "t", 1L, 2L), (3L, "t", 1L, 3L))
      .toDF("agent", "target", "a_rank", "t_score")
    val m = graft.operators.Sharding.stableMatch(one, cap = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m == Map(1L -> Some("t"), 2L -> Some("t"), 3L -> None))
  }

  test("largestRemainder: quotas sum to the budget exactly; leftovers " +
    "go to the largest remainders, ties to the first group") {
    import spark.implicits._
    val docs = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("src")
    val got = graft.operators.Sharding.largestRemainder(docs, "src", 7L)
      .collect().map(r => r.getString(0) -> r).toMap
    // ideal 3.5 / 2.1 / 1.4 -> floors 3/2/1, the one leftover to "a"
    assert(got("a").getLong(4) == 4L)
    assert(got("b").getLong(4) == 2L && got("c").getLong(4) == 1L)
    assert(got.values.map(_.getLong(4)).sum == 7L)
    // equal counts, budget 10 over 3: remainders tie, "a" wins the unit
    val even = Seq("a", "b", "c").toDF("src")
    val g2 = graft.operators.Sharding.largestRemainder(even, "src", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(g2 == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }
}
