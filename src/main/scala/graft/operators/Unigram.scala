package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Unigram-language-model tokenizer training + encoding (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with Multiple
  * Subword Candidates", §3) — the SentencePiece-family alternative to BPE
  * ([[Bpe]]): instead of greedy merges, a piece VOCABULARY with unigram
  * probabilities is fit by EM over each word's segmentation lattice, then
  * documents encode to their Viterbi-optimal segmentation.
  *
  * Architecture mirrors [[Bpe]] (and shares its scale rationale): the
  * corpus-sized work is ONE distributed word-frequency aggregation; seeding,
  * EM (forward–backward over the word lattice, in log space), and pruning
  * all run driver-side over that truncated table — a model fit, like k-means
  * centroids. Encoding is map-only: the trained piece table rides the plan
  * as a reference object inside a native codegen expression
  * ([[graft.functions.UnigramEncodeExpr]]).
  *
  * Pruning ranks pieces by EM expected count (a standard simplification of
  * the paper's likelihood-loss ranking; single-character pieces are never
  * pruned — they guarantee every word stays segmentable). Determinism: the
  * word table orders by (freq DESC, word ASC) before truncation, seed and
  * prune ties break lexicographically, and all EM arithmetic runs in a fixed
  * iteration order — same corpus, same vocabulary, on any cluster layout.
  */
object Unigram {

  /** One trained piece with its unigram log-probability. */
  case class Piece(piece: String, logProb: Double)

  /** Trained vocabulary plus the per-EM-phase corpus log-likelihood trace:
    * one inner sequence per fixed-vocabulary EM run (vocab shrinks between
    * phases), each non-decreasing — the classic EM guarantee, asserted by
    * the spec and the driver's validity gate. */
  case class TrainResult(pieces: Seq[Piece], llTrace: Seq[Seq[Double]])

  /** log(exp(a) + exp(b)) without underflow; -Inf identity-safe. */
  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  /** Train a unigram-LM piece vocabulary of (at most) `vocabSize` pieces.
    *
    * @param vocabSize   target piece count (single chars + best multi-char)
    * @param maxPieceLen longest candidate piece
    * @param seedFactor  seed with `vocabSize * seedFactor` candidates
    * @param emIters     EM iterations per fixed-vocabulary phase
    * @param pruneFrac   fraction of the vocabulary pruned per phase
    * @param maxWords    word-frequency table truncation (the [[Bpe]] cap)
    * @param maxWordLen  words longer than this are excluded from the EM fit
    *                    (rare; they would only deepen the lattice) */
  def trainVocab(docs: DataFrame, vocabSize: Int = 150, maxPieceLen: Int = 4,
                 seedFactor: Int = 4, emIters: Int = 2, pruneFrac: Double = 0.2,
                 maxWords: Int = 65536, maxWordLen: Int = 32): TrainResult = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(pruneFrac > 0 && pruneFrac < 1, s"pruneFrac in (0,1), got $pruneFrac")
    val words: Array[(String, Long)] = Bpe.wordFrequencies(docs)
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1.length <= maxWordLen)

    // ---- seed: all single chars + the most frequent multi-char substrings
    val subFreq = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var len = 1
      while (len <= math.min(maxPieceLen, w.length)) {
        var i = 0
        while (i + len <= w.length) {
          val p = w.substring(i, i + len)
          subFreq.update(p, subFreq.getOrElse(p, 0L) + f)
          i += 1
        }
        len += 1
      }
    }
    val chars = subFreq.keysIterator.filter(_.length == 1).toSeq.sorted
    val nSeedMulti = math.max(0, vocabSize * seedFactor - chars.size)
    val seedMulti = subFreq.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(nSeedMulti).map(_._1)
    var pieces: Vector[String] = (chars ++ seedMulti).toVector.sorted
    // init probs proportional to weighted substring frequency
    var logp: Map[String, Double] = {
      val tot = pieces.iterator.map(p => subFreq(p).toDouble).sum
      pieces.iterator.map(p => p -> math.log(subFreq(p) / tot)).toMap
    }

    // ---- EM phase over a fixed vocabulary; returns (newLogp, llPerIter)
    def emPhase(vocab: Vector[String]): (Map[String, Double], Seq[Double], Map[String, Double]) = {
      var cur = logp
      val lls = scala.collection.mutable.ArrayBuffer.empty[Double]
      var counts: Map[String, Double] = Map.empty
      val maxLen = vocab.iterator.map(_.length).max
      var it = 0
      while (it < emIters) {
        val cnt = scala.collection.mutable.HashMap.empty[String, Double]
        var ll = 0.0
        words.foreach { case (w, f) =>
          val n = w.length
          // forward/backward in log space over the segmentation lattice
          val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
          val beta = Array.fill(n + 1)(Double.NegativeInfinity)
          alpha(0) = 0.0; beta(n) = 0.0
          var i = 1
          while (i <= n) {
            var j = math.max(0, i - maxLen)
            while (j < i) {
              cur.get(w.substring(j, i)).foreach { lp =>
                alpha(i) = logAdd(alpha(i), alpha(j) + lp)
              }
              j += 1
            }
            i += 1
          }
          i = n - 1
          while (i >= 0) {
            var k = i + 1
            val kMax = math.min(n, i + maxLen)
            while (k <= kMax) {
              cur.get(w.substring(i, k)).foreach { lp =>
                beta(i) = logAdd(beta(i), lp + beta(k))
              }
              k += 1
            }
            i -= 1
          }
          val z = alpha(n) // > -Inf: every char is a piece
          ll += f * z
          // expected piece-occurrence counts (posterior over the lattice)
          i = 0
          while (i < n) {
            var k = i + 1
            val kMax = math.min(n, i + maxLen)
            while (k <= kMax) {
              val p = w.substring(i, k)
              cur.get(p).foreach { lp =>
                val post = math.exp(alpha(i) + lp + beta(k) - z)
                cnt.update(p, cnt.getOrElse(p, 0.0) + f * post)
              }
              k += 1
            }
            i += 1
          }
        }
        lls += ll
        val tot = vocab.iterator.map(p => cnt.getOrElse(p, 0.0)).sum
        cur = vocab.iterator.map(p => p ->
          math.log((cnt.getOrElse(p, 0.0) + 1e-12) / (tot + 1e-12 * vocab.size))).toMap
        counts = vocab.iterator.map(p => p -> cnt.getOrElse(p, 0.0)).toMap
        it += 1
      }
      (cur, lls.toSeq, counts)
    }

    // ---- alternate EM and pruning until the vocabulary reaches vocabSize
    val trace = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    var done = false
    while (!done) {
      val (newLogp, lls, counts) = emPhase(pieces)
      logp = newLogp
      trace += lls
      val multi = pieces.filter(_.length > 1)
      val excess = pieces.size - vocabSize
      if (excess <= 0 || multi.isEmpty) done = true
      else {
        val nDrop = math.min(multi.size,
          math.max(1, math.min(excess, (pieces.size * pruneFrac).toInt)))
        val dropped = multi.sortBy(p => (counts(p), p)).take(nDrop).toSet
        pieces = pieces.filterNot(dropped)
        if (pieces.size <= vocabSize) {
          val (finalLogp, finalLls, _) = emPhase(pieces)
          logp = finalLogp
          trace += finalLls
          done = true
        }
      }
    }
    // renormalize exactly over the surviving vocabulary
    val z = pieces.iterator.map(p => math.exp(logp(p))).sum
    TrainResult(
      pieces.map(p => Piece(p, logp(p) - math.log(z))),
      trace.toSeq)
  }

  /** Map-only Viterbi encode: normalized whitespace words → trained pieces
    * (array<string> per document). Null text → null tokens, matching
    * [[Bpe.encode]]. */
  def encode(text: Column, pieces: Seq[Piece], unkLogProb: Double = -10.0): Column =
    graft.functions.UnigramEncodeExpr.unigramEncode(
      TextFns.normalize(text), pieces.map(p => (p.piece, p.logProb)), unkLogProb)

  /** Per-document trained-unigram token counts — the [[Bpe.tokenCounts]]
    * twin for the unigram tokenizer. */
  def tokenCounts(docs: DataFrame, pieces: Seq[Piece]): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), pieces).as("pieces"))
      .select(col("doc_id"), size(col("pieces")).cast("long").as("n_pieces"))

  /** Subword-regularization SAMPLED encode (Kudo 2018 §4): each word draws a
    * segmentation from the α-scaled lattice distribution P(x|w) ∝ P(x)^α —
    * the training-time augmentation the unigram LM exists for (α → ∞
    * approaches [[encode]]'s Viterbi; α = 0 is uniform over segmentations).
    * Deterministic by the repo-wide content-hash contract: draws hash
    * (seed, word, position), so runs/engines/partitionings agree and
    * epoch-varied augmentation = vary `seed` per epoch. Map-only, native
    * codegen ([[graft.functions.UnigramSampleExpr]] — exact
    * forward-filtering/backward-sampling, no l-best truncation). */
  def encodeSampled(text: Column, pieces: Seq[Piece], alpha: Double = 0.2,
                    seed: Long = 0L, unkLogProb: Double = -10.0): Column =
    graft.functions.UnigramSampleExpr.unigramSample(
      TextFns.normalize(text), pieces.map(p => (p.piece, p.logProb)),
      alpha, seed, unkLogProb)

  /** The trained vocabulary as a DataFrame (piece, log_prob) — persist next
    * to the corpus; encode jobs load it and ride it into [[encode]] as a
    * reference object. */
  def piecesTable(spark: org.apache.spark.sql.SparkSession,
                  pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.map(p => (p.piece, p.logProb)).toDF("piece", "log_prob")
  }
}
