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

  test("discretePercentiles selects the ceil(p*n)-th value") {
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val out = Relational.discretePercentiles(df, "g", "v", "id", Seq(0.5, 0.9))
      .head()
    assert(out.getAs[Double]("p50") == 50.0)
    assert(out.getAs[Double]("p90") == 90.0)
    assert(out.getAs[Long]("n") == 100L)
  }
}
