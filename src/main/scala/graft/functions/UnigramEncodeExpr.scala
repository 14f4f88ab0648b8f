package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece) encoder: normalized text → the Viterbi-optimal
  * piece segmentation of each whitespace word under a trained piece
  * log-probability table ([[graft.operators.Unigram]] trains the table;
  * Kudo 2018, "Subword Regularization", §3 — the x* = argmax P(x) decode).
  *
  * Why native: Viterbi is a per-word DP over substring lookups — not
  * expressible as a Catalyst HOF chain without per-position interpreted
  * lambdas and O(n·maxLen) array churn per row. The piece table rides
  * codegen as a reference object; the generated code is one method call
  * per row (the [[BpeEncodeExpr]] pattern).
  *
  * Semantics: input is expected pre-normalized ([[TextFns.normalize]]);
  * words split on single spaces. Per word, `best(i)` = max total log-prob
  * over segmentations of the first `i` chars; a character absent from the
  * vocabulary scores `unkLogProb` as a single-char piece, so every word is
  * segmentable. Ties break toward the LONGEST final piece (candidate start
  * positions scan ascending with strict improvement), making the decode
  * fully deterministic. Null input → null; empty string → empty array.
  */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[(String, Double)],
                             unkLogProb: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val logp: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (piece, lp) => m.put(piece, lp) }
    m
  }

  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.iterator.map(_._1.length).max)

  /** Encode one document; called from both interpreted eval and codegen. */
  def encode(input: UTF8String): ArrayData = {
    val words = input.toString.split(" ", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    words.foreach { w =>
      if (w.nonEmpty) {
        val n = w.length
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val back = Array.fill(n + 1)(-1)
        best(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            val piece = w.substring(j, i)
            val lp: Double = {
              val v = logp.get(piece)
              if (v != null) v.doubleValue()
              else if (i - j == 1) unkLogProb
              else Double.NegativeInfinity
            }
            // strict > with j ascending: equal scores keep the SMALLEST j,
            // i.e. the longest final piece — the deterministic tie-break
            if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
              best(i) = best(j) + lp
              back(i) = j
            }
            j += 1
          }
          i += 1
        }
        // backtrack (pieces come out reversed; insert at the word's start)
        val wordStart = out.length
        var pos = n
        while (pos > 0) {
          val j = back(pos)
          out.insert(wordStart, UTF8String.fromString(w.substring(j, pos)))
          pos = j
        }
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { s =>
      val ref = ctx.addReferenceObj("unigramEncoder", this,
        classOf[UnigramEncodeExpr].getName)
      s"${ev.value} = $ref.encode($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def unigramEncode(text: Column, vocab: Seq[(String, Double)],
                    unkLogProb: Double = -10.0): Column =
    ColumnBridge.column(UnigramEncodeExpr(ColumnBridge.expression(text),
      vocab, unkLogProb))
}
