package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `knnBrute`: exact top-k — the query set is broadcast, the corpus is
  *   scanned once, a per-query window keeps the top k. At 100 TB this is one
  *   full scan with no shuffle of the corpus (the window shuffles only
  *   |corpus| × |queries| score rows — keep the query set small or pre-top-k
  *   per partition before the window).
  * - `annLsh`: the scale path — random-hyperplane LSH buckets corpus and
  *   queries; only same-bucket candidates are scored, so cost is
  *   O(candidates) instead of O(corpus × queries).
  */
object Similarity {

  /** Exact brute-force cosine top-k per query vector. */
  def knnBrute(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val scored = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Bucketed ANN: 2 bands × 8 random-hyperplane bits; candidates share at
    * least one band with the query, then exact cosine ranks the top k.
    */
  def annLsh(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      k: Int = 5): DataFrame = {
    def banded(df: DataFrame, id: String, v: String): DataFrame =
      df.select(
        col(idCol).as(id), col(vecCol).as(v),
        lshSignature(col(vecCol), 0, 8, dims).as("b0"),
        lshSignature(col(vecCol), 8, 8, dims).as("b1"))
        .select(
          col(id), col(v),
          posexplode(array(col("b0"), col("b1"))).as(Seq("band_idx", "band_val")))
    // vectors ride along through the band explode, so candidates are scored
    // in place; same-pair matches from both bands collapse in the groupBy
    val scored = banded(queries, "qid", "qv")
      .join(banded(corpus, "nid", "nv"), Seq("band_idx", "band_val"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qv"), col("nv")), 4).as("cos_r"))
      .groupBy(col("qid"), col("nid"))
      .agg(max(col("cos_r")).as("cos_r"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("nid"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), col("cos_r"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Embedding-cosine near-dup candidate pairs inside LSH buckets, top pairs
    * by cosine. The near-dup variant of `annLsh` (corpus against itself).
    */
  def embeddingNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      topK: Int = 100): DataFrame = {
    val sig = corpus.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), 0, 8, dims).as("b0"),
      lshSignature(col(vecCol), 8, 8, dims).as("b1"))
    val exploded = sig.select(
      col("id"),
      posexplode(array(col("b0"), col("b1"))).as(Seq("band_idx", "band_val")))
    val pairs = exploded.as("a")
      .join(exploded.as("b"), Seq("band_idx", "band_val"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    pairs
      .join(sig.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("v_a"), col("v_b")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }
}
