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

  /** Sliding-window (RAG-style) chunking: one row per `(input row,
    * chunk_idx)` with the chunk's offset and text. Character windows of
    * `win` chars every `hop` chars; a document shorter than one window
    * still yields its single (short) chunk. The explode scales chunk rows
    * out; offsets are engine-portable (char-based `substring`).
    */
  def slidingChunks(
      df: DataFrame,
      textCol: String,
      win: Int = 400,
      hop: Int = 160): DataFrame = {
    require(win > 0 && hop > 0, "win and hop must be positive")
    df
      .withColumn("__len", length(col(textCol)))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          greatest(ceil((col("__len") - lit(win)).cast("double") / hop).cast("long"),
            lit(0L)))))
      .withColumn("chunk_off", col("chunk_idx") * hop)
      .withColumn("chunk", expr(s"substring($textCol, chunk_off + 1, $win)"))
      .drop("__len")
  }

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
