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

  /** QUARANTINE split — the dead-letter alternative to the all-or-nothing
    * CHECK-constrained commit (TxLake.commitChecked): instead of
    * rejecting the whole load because 0.001% of rows are bad, route each
    * row by its own verdict. `checks` are PASS predicates (the
    * commitChecked convention: a row passes only when every predicate is
    * TRUE — false or NULL quarantines, three-valued logic as everywhere).
    * Quarantined rows carry a `reasons` column naming every failed check
    * in declaration order — the triage key a reprocessing job groups by.
    *
    * One scan, two outputs; commit each side to its own table for the
    * full bronze-ingest posture (clean table + dead-letter table).
    */
  def quarantineSplit(
      df: DataFrame,
      checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "at least one check required")
    require(checks.map(_._1).distinct.size == checks.size,
      "check ids must be unique")
    val passAll = checks.map(c => coalesce(c._2, lit(false))).reduce(_ && _)
    val reasons = array_join(
      filter(
        array(checks.map { case (n, c) =>
          when(!coalesce(c, lit(false)), lit(n))
        }: _*),
        x => x.isNotNull),
      ",")
    (df.filter(passAll),
      df.filter(!passAll).withColumn("reasons", reasons))
  }

  /** K-ANONYMITY suppression — the privacy release gate for quasi-
    * identifier columns: a row's quasi values are published only when its
    * equivalence class (the exact quasi-tuple) has at least `k` members;
    * smaller classes get every quasi column masked to `*` (cell
    * suppression), so no published combination isolates fewer than `k`
    * people. Non-quasi columns ride through untouched.
    *
    * Plan shape: one aggregation builds the class-size table (bounded by
    * the quasi domain, metadata-sized next to the facts), broadcast back
    * onto the rows — never a window over the corpus. A row with any NULL
    * quasi value is always suppressed (the equality join can't credit it
    * to a class, and a null identifier isn't publishable anyway).
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    val qc = quasiCols.map(col)
    val sizes = df.groupBy(qc: _*)
      .agg(count(lit(1)).as("__class_n"))
    val joined = df.join(broadcast(sizes), quasiCols, "left")
      .withColumn("__n", coalesce(col("__class_n"), lit(0L)))
    val out = quasiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_anon",
        when(col("__n") >= k, col(c).cast("string")).otherwise(lit("*")))
    }
    out
      .withColumn("suppressed", col("__n") < k)
      .drop("__class_n" +: "__n" +: quasiCols: _*)
  }
}
