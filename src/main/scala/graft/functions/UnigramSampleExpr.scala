package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword-regularization SAMPLED encoder (Kudo 2018 §4, the paper's actual
  * training-time contribution): instead of the single Viterbi segmentation
  * ([[UnigramEncodeExpr]]), each word draws a segmentation from the α-scaled
  * lattice distribution P(x|w) ∝ P(x)^α — the on-the-fly augmentation that
  * makes a model robust to segmentation ambiguity. α → ∞ approaches Viterbi;
  * α = 0 is uniform over all segmentations.
  *
  * Exact lattice sampling (no l-best truncation): the α-scaled forward mass
  * `F(i) = Σ_j F(j)·p(w[j..i])^α` is computed in log space, then pieces are
  * drawn backward from position n — the last piece (j..n) is chosen with
  * probability `F(j)·p^α / F(n)`, recursing at j. This is the
  * forward-filtering/backward-sampling algorithm, exact for the unigram
  * lattice.
  *
  * DETERMINISM (the repo-wide content-hash sampling contract, same rationale
  * as [[graft.operators.Curation.mixtureSample]]): the "randomness" at each
  * backward step is a splitmix64 hash of (seed, word bytes, position, step),
  * so the draw is a pure content function — reproducible across runs,
  * engines, and partitionings, and identical duplicate words segment
  * identically within one (seed, word) pair while different seeds give
  * independent draws (epoch-varied augmentation = vary the seed per epoch).
  *
  * Unknown characters score `unkLogProb` as single-char pieces, exactly as
  * in the Viterbi encoder. Null input → null; empty string → empty array.
  */
case class UnigramSampleExpr(child: Expression, vocab: Seq[(String, Double)],
                             unkLogProb: Double, alpha: Double, seed: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_sample expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (piece, lp) => m.put(piece, lp) }
    m
  }

  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.iterator.map(_._1.length).max)

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log1p(math.exp(math.min(a, b) - m)) }

  /** splitmix64 finalizer — the deterministic uniform source. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pure-content uniform in [0, 1) for (word, backward step). */
  private def uniform(wordHash: Long, pos: Int, step: Int): Double = {
    val h = mix(mix(mix(seed ^ wordHash) ^ pos.toLong) ^ step.toLong)
    ((h >>> 11).toDouble) / (1L << 53).toDouble
  }

  private def scaledLp(piece: String, len: Int): Double = {
    val v = logp.get(piece)
    if (v != null) alpha * v.doubleValue()
    else if (len == 1) alpha * unkLogProb
    else Double.NegativeInfinity
  }

  /** Encode one document; called from both interpreted eval and codegen. */
  def encode(input: UTF8String): ArrayData = {
    val words = input.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty) {
        val n = w.length
        // α-scaled forward mass in log space
        val fwd = Array.fill(n + 1)(Double.NegativeInfinity)
        fwd(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            val slp = scaledLp(w.substring(j, i), i - j)
            if (slp != Double.NegativeInfinity && fwd(j) != Double.NegativeInfinity)
              fwd(i) = logAdd(fwd(i), fwd(j) + slp)
            j += 1
          }
          i += 1
        }
        // backward sampling: pick the last piece ending at pos with
        // probability exp(fwd(j) + slp - fwd(pos)); candidates scan j
        // ascending with a running cumulative sum, final candidate absorbs
        // float remainder so the draw always lands
        var wordHash = 1125899906842597L
        var ci = 0
        while (ci < n) { wordHash = 31 * wordHash + w.charAt(ci); ci += 1 }
        val wordStart = out.length
        var pos = n
        var step = 0
        while (pos > 0) {
          val u = uniform(wordHash, pos, step)
          var acc = 0.0
          var chosen = -1
          var j = math.max(0, pos - maxLen)
          var lastValid = -1
          while (j < pos && chosen < 0) {
            val slp = scaledLp(w.substring(j, pos), pos - j)
            if (slp != Double.NegativeInfinity) {
              lastValid = j
              acc += math.exp(fwd(j) + slp - fwd(pos))
              if (u < acc) chosen = j
            }
            j += 1
          }
          // check remaining candidates for remainder absorption
          if (chosen < 0) {
            // float shortfall: continue scanning for any later valid j
            var k = (if (lastValid < 0) pos - 1 else lastValid) + 1
            while (k < pos) {
              if (scaledLp(w.substring(k, pos), pos - k) != Double.NegativeInfinity)
                lastValid = k
              k += 1
            }
            chosen = if (lastValid >= 0) lastValid else pos - 1
          }
          out.insert(wordStart, UTF8String.fromString(w.substring(chosen, pos)))
          pos = chosen
          step += 1
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { s =>
      val ref = ctx.addReferenceObj("unigramSampler", this,
        classOf[UnigramSampleExpr].getName)
      s"${ev.value} = $ref.encode($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramSampleExpr =
    copy(child = newChild)
}

object UnigramSampleExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def unigramSample(text: Column, vocab: Seq[(String, Double)],
                    alpha: Double = 0.2, seed: Long = 0L,
                    unkLogProb: Double = -10.0): Column =
    ColumnBridge.column(UnigramSampleExpr(ColumnBridge.expression(text),
      vocab, unkLogProb, alpha, seed))
}
