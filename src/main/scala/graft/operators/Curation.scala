package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** End-to-end corpus curation — the filter chain every LLM training-data
  * pipeline runs over raw documents (C4-style): language filter → quality
  * thresholds → exact dedup. The reference has no document processing at all;
  * this composes the engine's text operators into the deliverable a 100 TB
  * corpus job actually ships.
  *
  * Scale shape: every per-document signal (tokens, length ratios, language
  * scores) derives from ONE normalize+tokenize projection — no per-signal
  * re-tokenization — and the quality/language filters run BEFORE the dedup
  * shuffle, so only surviving documents are shuffled. Dedup groups on the
  * normalized text here (oracle-reproducible); at 100 TB swap the group key
  * for the 8-byte fingerprint ([[Dedup.exactDedupByFingerprint]]'s key) so the
  * shuffle carries hashes, not documents.
  */
object Curation {

  /** Curate a `(doc_id, text, ...)` corpus: keep documents whose predicted
    * language is `lang`, with at least `minTokens` tokens and an average token
    * length of at most `maxAvgTokenLen`; then exact-dedup on normalized text,
    * keeping the smallest surviving doc_id per group. Returns one row per kept
    * document with its quality signals and duplicate count. */
  def curateCorpus(docs: DataFrame, lang: String = "en", minTokens: Int = 20,
                   maxAvgTokenLen: Double = 5.0): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("text"), TextFns.normalize(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("toks"))
      .select(col("doc_id"), col("norm"),
        size(col("toks")).cast("long").as("n_tokens"),
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(col("toks"))).as("avg_token_len"),
        TextFns.predictLangFromTokens(col("toks")).as("pred_lang"))
    scored
      .filter(col("pred_lang") === lang &&
        col("n_tokens") >= minTokens && col("avg_token_len") <= maxAvgTokenLen)
      .groupBy(col("norm"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("n_tokens")).as("n_tokens"), // constant within a norm group
        round(min(col("avg_token_len")), 6).as("avg_token_len"),
        count(lit(1)).as("dup_count"))
      .select("doc_id", "n_tokens", "avg_token_len", "dup_count")
  }
}
