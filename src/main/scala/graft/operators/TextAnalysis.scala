package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Texts

/** Text-analysis operators over the documents corpus ([ext], SURVEY.md
  * §2.8): token statistics, quality scoring, language ID, fingerprints.
  * All narrow per-row transforms + one hash aggregate — scales linearly,
  * shuffle only on the (low-cardinality) group keys.
  */
object TextAnalysis {

  /** Per-language corpus statistics. */
  def tokenStatsByLang(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), Texts.tokenCount(col("text")).as("n_toks"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(avg(col("n_toks")), 6).as("avg_tokens"))

  /** Per-document quality features: token counts, uniqueness, mean token
    * length, stopword ratio. The standard "is this document junk" feature
    * vector for LLM-corpus filtering.
    */
  def docQuality(documents: DataFrame): DataFrame = {
    val nToks = col("n_tokens")
    documents
      .select(
        col("doc_id"),
        Texts.tokenCount(col("text")).as("n_tokens"),
        Texts.uniqueTokenCount(col("text")).as("n_uniq_tokens"),
        Texts.sumTokenLength(col("text")).as("sum_len"),
        Texts.wordHitCount(col("text"), Texts.englishStopwords).as("n_stop"))
      .select(
        col("doc_id"), nToks, col("n_uniq_tokens"),
        when(nToks > 0, round(col("sum_len").cast("double") / nToks, 6))
          .as("avg_token_len"),
        when(nToks > 0, round(col("n_stop").cast("double") / nToks, 6))
          .as("stopword_ratio"))
  }

  /** Language-ID heuristic rollup (rows-only check: heuristic has no
    * SQL-oracle form by design — it is our own classifier).
    */
  def langIdDist(documents: DataFrame): DataFrame =
    documents
      .select(Texts.langScores(col("text")).as("sc")) // own projection: fold once
      .select(Texts.langIdFromScores(col("sc")).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /** Content fingerprints: exact-dup key (SHA-256). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), Texts.fingerprintSha(col("text")).as("fp"))
}
