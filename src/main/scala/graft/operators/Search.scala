package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Corpus search / relevance scoring — the retrieval half of a training-data
  * platform (quality classifiers, topic filters, and eval harnesses all rank
  * documents against term queries). The reference has no text search at all
  * (its only reads are key lookups, `realtime_api.py:99,143,207,257,282`);
  * this layer is a from-scratch Spark-first design.
  *
  * Scale shape: scoring is ONE map-side pass over the corpus — per-document
  * term frequencies come from the native hashed-set token kernel
  * ([[graft.functions.MarkerHitsExpr]]), never from an explode+join of the
  * corpus. The only non-map stage is a single-row global-stats aggregate
  * (N, avgdl, per-term document frequency) that re-attaches via a
  * broadcast of ONE row, and the final top-k is TakeOrderedAndProject
  * (heap top-k, no global sort). At 100 TB: corpus pass is embarrassingly
  * parallel; the stats row is O(#terms) bytes.
  */
object Search {

  /** BM25 (Okapi, Lucene-style idf) scores of every document against a bag of
    * query terms; top `k` by score with full (score DESC, doc_id ASC) tie-break.
    *
    * idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Terms are fixed literals, so tf per term is a codegen'd counting kernel
    * over the tokenize-once array — no corpus explode, no shuffle except the
    * single-row stats aggregate. The score is summed left-to-right in query
    * term order so the DuckDB oracle reproduces the float exactly; the final
    * round(·, 6) absorbs last-ulp noise. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val tfCols = terms.indices.map(i => s"tf_$i")
    val dfCols = terms.indices.map(i => s"df_$i")
    // One tokenize projection; per-term tf via the hashed-set kernel.
    val scored = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          TextFns.markerHitsFromTokens(col("toks"), Seq(t)).cast("double").as(tfCols(i))
        }: _*)
    // Global stats: one row — corpus size, average doc length, per-term df.
    val statCols = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(col(tfCols(i)) > 0, 1d).otherwise(0d)).as(dfCols(i)))
    val stats = scored.agg(statCols.head, statCols.tail: _*)
    val withStats = scored.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(tfCols(i))
      val idf = log(lit(1d) + (col("n_docs") - col(dfCols(i)) + 0.5) / (col(dfCols(i)) + 0.5))
      idf * (tf * (k1 + 1)) / (tf + lit(k1) * (lit(1d) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduceLeft[Column](_ + _)
    // Filter AFTER the top-k, not before: a pre-limit filter gets pushed into
    // the stats-join condition, where the whole 3-ln score expression is
    // re-evaluated per row as a predicate (measured 2x the scoring cost at 1M
    // docs). Since bm25 >= 0 always and every positive score outranks every
    // zero, top-k-then-filter selects exactly the same rows.
    withStats
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
      .filter(col("bm25") > 0)
  }

  /** Inverted index build: one row per distinct token — document frequency and
    * the sorted postings list. The index a keyword-search layer serves from.
    *
    * Scale shape: per-document DISTINCT tokens are deduplicated map-side
    * (inside the token array, before the explode), so the shuffle carries each
    * (term, doc) pair once; the postings aggregation is a single hash
    * aggregate. At 100 TB the posting list of a stop-word-frequency term is
    * the classic skew cell — `minDf`/`maxDf` bound the emitted rows, and a
    * deployment shards hot terms by `pmod(doc_id, s)` before serving. */
  def invertedIndex(docs: DataFrame, minDf: Long = 1, maxDf: Long = Long.MaxValue): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("doc_id"))).as("postings"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select("term", "df", "postings")
}
