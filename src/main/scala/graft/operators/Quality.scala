package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-driven data-quality checks: the generalization of q05's fixed
  * schema enforcement to caller-supplied constraints (the
  * Deequ/expectations idea, declaratively).
  *
  * Every rule is a VIOLATION predicate evaluated in ONE aggregation pass —
  * adding a rule adds a conditional-sum column, never a table re-scan, so
  * a 50-rule suite over 100 TB still costs one read. The single stats row
  * then pivots to one row per rule (driver-side width).
  */
object Quality {

  /** Per-rule violation counts and pass ratios. `rules` maps rule id →
    * violation predicate (true = the row breaks the rule).
    */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule ids must be unique — duplicates would collide on the stats columns")
    val aggs = rules.map { case (id, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__v_$id")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(rules.map { case (id, _) =>
        struct(
          lit(id).as("rule_id"),
          col(s"__v_$id").as("n_violations"),
          col("__n").as("n_rows"))
      }: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("pass_ratio",
        round(lit(1.0) - col("n_violations").cast("double") / col("n_rows"), 6))
  }
}
