package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.sources.FooterStats

class FooterStatsSpec extends SparkSuite {

  test("aggregates are pushed into the parquet scan (footer-only read)") {
    FooterStats.withAggregatePushdown(spark) {
      val plan = FooterStats
        .statsPlan(spark, s"$sf/orders.parquet", Seq("o_orderkey", "o_totalprice"))
        .queryExecution.explainString(FormattedMode)
      assert(plan.contains("PushedAggregation"),
        s"aggregate pushdown did not fire — the query would scan data pages:\n$plan")
      assert(plan.contains("COUNT(*)") && plan.contains("MIN(o_orderkey)"),
        plan)
    }
  }

  test("configs restore even when the body throws") {
    val before = spark.conf.get("spark.sql.sources.useV1SourceList")
    intercept[RuntimeException] {
      FooterStats.withAggregatePushdown(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") == before)
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false")
  }

  test("footer stats equal the plain aggregates") {
    import org.apache.spark.sql.functions._
    val got = FooterStats
      .tableStats(spark, s"$sf/orders.parquet", Seq("o_orderkey")).head()
    val exp = spark.read.parquet(s"$sf/orders.parquet")
      .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey"))).head()
    assert(got.getLong(0) == exp.getLong(0))
    assert(got.getLong(1) == exp.getLong(1) && got.getLong(2) == exp.getLong(2))
  }
}
