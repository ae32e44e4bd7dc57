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
}
