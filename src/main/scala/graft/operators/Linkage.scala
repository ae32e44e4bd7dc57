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
}
