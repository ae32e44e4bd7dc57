package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketedJoinSpec extends SparkSuite {

  test("bucketed join shuffles neither join side (only the final agg)") {
    val df = SparkEntry.queries("q38_bucketed_join")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan
    // walk the executed plan (incl. AQE-materialized stages): the join's
    // children must be shuffle-free — the only exchange is the groupBy's
    val exchanges = plan.collectWithSubqueries {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1,
      s"expected at most the aggregation exchange, got ${exchanges.size}:\n$plan")
  }

  test("bucketed star: the fact-orders join is exchange-free, the dim broadcasts") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    // AQE wraps materialized stages in QueryStageExec leaves — unwrap
    // recursively so operator collection sees the whole final plan
    def allOps(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: allOps(a.executedPlan)
      case q: QueryStageExec => q +: allOps(q.plan)
      case other => other +: other.children.flatMap(allOps)
    }
    // disable auto-broadcast so the fact⋈orders join CAN'T dodge the
    // bucketing claim by broadcasting tiny test data; the customer dim
    // still broadcasts through its explicit hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q309_star_bucketed")(spark, sf)
      assert(df.collect().nonEmpty)
      val ops = allOps(df.queryExecution.executedPlan)
      val smj = ops.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected the bucketed fact join as an SMJ")
      // the SMJ's subtree must be shuffle-free: both sides arrive
      // pre-partitioned ×8 from the bucketed layout
      smj.foreach { j =>
        val shuffles = j.children.flatMap(allOps).collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty, s"bucketed join side shuffled:\n$j")
      }
      assert(ops.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "customer dim should broadcast")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
