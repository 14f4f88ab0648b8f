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

  /** One normalize+tokenize projection feeding every signal, then the
    * language/quality gates — shared by both dedup-key forms, and everything
    * upstream of the only shuffle. */
  private def scoredSurvivors(docs: DataFrame, lang: String, minTokens: Int,
                              maxAvgTokenLen: Double): DataFrame =
    docs
      .select(col("doc_id"), col("text"), TextFns.normalize(col("text")).as("norm"))
      .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("toks"))
      .select(col("doc_id"), col("norm"),
        size(col("toks")).cast("long").as("n_tokens"),
        (length(regexp_replace(col("norm"), " ", "")).cast("double") /
          size(col("toks"))).as("avg_token_len"),
        TextFns.predictLangFromTokens(col("toks")).as("pred_lang"))
      .filter(col("pred_lang") === lang &&
        col("n_tokens") >= minTokens && col("avg_token_len") <= maxAvgTokenLen)

  private def dedupAgg(survivors: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    survivors
      .groupBy(key)
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("n_tokens")).as("n_tokens"), // constant within a norm group
        round(min(col("avg_token_len")), 6).as("avg_token_len"),
        count(lit(1)).as("dup_count"))
      .select("doc_id", "n_tokens", "avg_token_len", "dup_count")

  /** Curate a `(doc_id, text, ...)` corpus: keep documents whose predicted
    * language is `lang`, with at least `minTokens` tokens and an average token
    * length of at most `maxAvgTokenLen`; then exact-dedup on normalized text,
    * keeping the smallest surviving doc_id per group. Returns one row per kept
    * document with its quality signals and duplicate count. */
  def curateCorpus(docs: DataFrame, lang: String = "en", minTokens: Int = 20,
                   maxAvgTokenLen: Double = 5.0): DataFrame =
    dedupAgg(scoredSurvivors(docs, lang, minTokens, maxAvgTokenLen), col("norm"))

  /** [[curateCorpus]], 100 TB shuffle shape: the dedup groups on
    * `xxhash64(norm)` so the exchange carries an 8-byte key per document
    * instead of the document text (the output columns don't need `norm`, so
    * with this key the text never leaves the map side at all — column pruning
    * drops it before the exchange). Identical output to [[curateCorpus]]
    * barring a 64-bit fingerprint collision (birthday bound ~5e9 docs;
    * PropertySpec asserts equivalence, the query entry hash-matches the same
    * oracle as `pipeline_curate`). */
  def curateCorpusByFingerprint(docs: DataFrame, lang: String = "en", minTokens: Int = 20,
                                maxAvgTokenLen: Double = 5.0): DataFrame =
    dedupAgg(scoredSurvivors(docs, lang, minTokens, maxAvgTokenLen),
      xxhash64(col("norm")).as("fp"))
}
