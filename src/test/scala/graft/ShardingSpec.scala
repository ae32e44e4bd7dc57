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
}
