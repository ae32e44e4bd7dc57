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
}
