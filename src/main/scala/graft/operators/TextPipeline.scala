package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composed corpus-cleaning pipeline — the standard pre-training data
  * shape: quality gates → language gate → exact dedup, as ONE declarative
  * plan (single scan feeding filters, one hash shuffle for the dedup).
  */
object TextPipeline {

  /** Quality + language + dedup filter.
    *
    * Keeps documents with at least `minWords` words and `minAlphaRatio`
    * alphabetic character ratio, whose deterministic language guess is in
    * `langs` (empty set = keep all), deduplicated on the normalized-text
    * fingerprint keeping the smallest id.
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 10,
      minAlphaRatio: Double = 0.5,
      langs: Set[String] = Set.empty): DataFrame = {
    val t = col(textCol)
    val gated = df
      .withColumn("n_words", TextFunctions.wordCount(t))
      .withColumn("alpha_ratio",
        TextFunctions.alphaChars(t).cast("double") / length(t).cast("double"))
      .withColumn("lang_pred", TextFunctions.langId(t))
      .filter(col("n_words") >= minWords && col("alpha_ratio") >= minAlphaRatio)
    val langGated =
      if (langs.isEmpty) gated
      else gated.filter(col("lang_pred").isin(langs.toSeq: _*))
    val w = Window
      .partitionBy(TextFunctions.fingerprint(t))
      .orderBy(col(idCol))
    langGated
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
