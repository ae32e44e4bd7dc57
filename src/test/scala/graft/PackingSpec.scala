package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("ffdPlan: textbook FFD assignment, hand-checked") {
    // cap 10, sizes 6,5,4,3,2 → bins {6,4} and {5,3,2}
    val files = Seq(("p", 1L, 6L), ("p", 2L, 5L), ("p", 3L, 4L),
      ("p", 4L, 3L), ("p", 5L, 2L)).toDF("part", "id", "bytes")
    val got = Packing.ffdPlan(files, "part", "id", "bytes", 10L)
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("ffdPlan: partitions pack independently; bins never overflow") {
    val rnd = new scala.util.Random(11)
    val files = (1 to 300).map(i =>
      ("part" + (i % 5), i.toLong, 1L + rnd.nextInt(100).toLong))
    val got = Packing.ffdPlan(files.toDF("part", "id", "bytes"),
      "part", "id", "bytes", 128L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 300)
    got.groupBy(r => (r._1, r._4)).foreach { case (pb, rows) =>
      assert(rows.map(_._3).sum <= 128L, s"bin $pb overflows")
    }
    // bin ids are dense 1..k per partition
    got.groupBy(_._1).foreach { case (_, rows) =>
      val bins = rows.map(_._4).toSet
      assert(bins == (1L to bins.max).toSet)
    }
  }

  test("ffdPlan: oversized file is refused loudly") {
    val files = Seq(("p", 1L, 11L)).toDF("part", "id", "bytes")
    intercept[IllegalArgumentException] {
      Packing.ffdPlan(files, "part", "id", "bytes", 10L).collect()
    }
  }
}
