package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.StringSimilarityExpressions.jaroWinkler

/** Record linkage: fuzzy-match two tables on a name-like column without
  * the all-pairs cartesian.
  *
  * The classic two-step shape: a cheap BLOCKING key (a substring, phonetic
  * code, or sorted-token prefix — anything a true match pair must agree
  * on) equi-joins candidates, then the expensive similarity scores only
  * within blocks. At 100 TB the equi-join shuffles on the block key and
  * the quadratic term is bounded per block — the blocking key's
  * selectivity, not the corpus size, is what the operator's cost follows.
  * Similarity is the codegen [[graft.plans.JaroWinkler]] expression, so
  * scoring stays inside whole-stage codegen.
  */
object Linkage {

  /** Pairs `(a_key, b_key, sim)` with `sim >= threshold`, compared only
    * within equal `blockCol` values. The threshold is applied to the RAW
    * double (bit-identical cross-engine, see JaroWinklerImpl); the
    * reported score is rounded for output stability.
    */
  def fuzzyJoin(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      nameCol: String,
      blockCol: Column,
      threshold: Double = 0.9): DataFrame = {
    val left = a.select(col(keyCol).as("a_key"), col(nameCol).as("a_name"),
      blockCol.as("blk"))
    val right = b.select(col(keyCol).as("b_key"), col(nameCol).as("b_name"),
      blockCol.as("blk"))
    left.join(right, Seq("blk"))
      .withColumn("sim", jaroWinkler(col("a_name"), col("b_name")))
      .filter(col("sim") >= threshold)
      .select(col("a_key"), col("b_key"), round(col("sim"), 6).as("sim"))
  }

  /** Survivorship: ONE golden record per cluster, each field resolved
    * INDEPENDENTLY by `(has a value, trust, id)` — the master-data-
    * management step after linkage + clustering. A lower-trust system's
    * non-null beats a higher-trust null (that is what makes the
    * resolution per-field: the winning record can differ per column),
    * and the unique id breaks trust ties deterministically.
    *
    * One aggregation pass, field picks as max(struct(...)) — per-cluster
    * work is a constant number of struct comparisons per row, no window
    * over the full record table. (Struct buffers aren't hash-aggregable,
    * so Spark plans a SortAggregate — still with map-side partial max,
    * which is the property that matters at scale.)
    */
  def goldenRecord(
      records: DataFrame,
      clusterCol: String,
      idCol: String,
      trustCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty)
    val picks = fields.map(f =>
      max(struct(col(f).isNotNull.as("has"), col(trustCol).as("t"),
        col(idCol).as("i"), col(f).as("v")))
        .getField("v").as(f))
    records
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_records"), picks: _*)
  }
}
