package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Within-document n-gram repetition signals — the Gopher repetition rules
  * (Rae et al. 2021, "Scaling Language Models", Table A1): the fraction of a
  * document's characters covered by its most frequent word n-gram and by ALL
  * its duplicated word n-grams. Returns `struct(top_chars, dup_chars)` over a
  * token array; the caller divides by the normalized character length.
  *
  * Semantics (mirrored exactly by the DuckDB oracle):
  *   - grams are the m−n+1 sliding windows of the token array, rendered as the
  *     tokens joined by single spaces (= substrings of the normalized text, so
  *     character offsets are well-defined);
  *   - `top_chars` = occurrences × character-length of the single most frequent
  *     gram (ties broken to the UTF-8 byte-order-smallest gram — exactly the
  *     order Spark's string sort and the oracle's `ORDER BY` use). Overlapping
  *     occurrences double-count, matching the published reproductions
  *     (NeMo Curator / SlimPajama), so the fraction can exceed 1 on
  *     pathological single-token loops — exactly the docs the rule rejects;
  *   - `dup_chars` = characters covered by the UNION of the spans of every gram
  *     occurring ≥ 2 times (no double counting — bounded by the document
  *     length), the "fraction of characters inside duplicate n-grams" signal.
  *
  * Why native (the [[MarkerHitsExpr]] rationale): the per-row gram count map
  * plus the position walk is O(chars) with a bounded accumulator here, but as
  * composed HOFs it is either an O(m²) `map_concat` fold or a corpus-wide
  * (doc, gram) shuffle — this kernel keeps the whole Gopher repetition gate
  * MAP-ONLY at scan speed, the same shape as
  * [[graft.operators.Curation.gopherQualityRules]]. The corpus-level
  * cross-document siblings are [[graft.operators.Dedup.dupNgramStats]] and
  * `dupSpanFraction`; this is the per-document filter that runs BEFORE any
  * exchange at 100 TB.
  */
case class GramRepetitionExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, s"repetition grams need n >= 2 (n = 1 is the top-token share), got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_repetition expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  @transient private lazy val space = UTF8String.fromString(" ")

  /** One pass to count grams, one position walk for the span union. Gram keys
    * stay `UTF8String` end to end: the tie-break compares in UTF-8 BYTE order
    * (what Spark's sort and the DuckDB oracle's `ORDER BY gram` use — a
    * java.lang.String compareTo would order supplementary code points
    * differently), and the hot map-only path never decodes a token. */
  def compute(input: ArrayData): InternalRow = {
    val m = input.numElements()
    if (m < n) return new GenericInternalRow(Array[Any](0L, 0L))
    val toks = new Array[UTF8String](m)
    val lens = new Array[Int](m)
    // char offset of token i in the space-joined text; offsets(m) = total chars
    val offsets = new Array[Int](m + 1)
    var i = 0
    while (i < m) {
      val t = if (input.isNullAt(i)) UTF8String.EMPTY_UTF8 else input.getUTF8String(i)
      toks(i) = t
      lens(i) = t.numChars()
      offsets(i + 1) = offsets(i) + lens(i) + 1 // +1 single-space separator
      i += 1
    }
    val nGrams = m - n + 1
    val grams = new Array[UTF8String](nGrams)
    val counts = new JHashMap[UTF8String, Int](nGrams * 2)
    val window = new Array[UTF8String](n)
    i = 0
    while (i < nGrams) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      val g = UTF8String.concatWs(space, window: _*)
      grams(i) = g
      counts.put(g, counts.get(g) + 1) // missing key unboxes to 0
      i += 1
    }
    // top gram: max count, ties to the byte-order-smallest gram
    var topGram: UTF8String = null
    var topCount = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topCount || (c == topCount && e.getKey.compareTo(topGram) < 0)) {
        topCount = c
        topGram = e.getKey
      }
    }
    val topChars = topCount.toLong * topGram.numChars()
    // span union over duplicated grams; starts ascend with i, so one pointer
    var dupChars = 0L
    var coveredUntil = 0
    i = 0
    while (i < nGrams) {
      if (counts.get(grams(i)) >= 2) {
        val start = offsets(i)
        val end = offsets(i + n - 1) + lens(i + n - 1)
        val s = math.max(start, coveredUntil)
        if (end > s) {
          dupChars += end - s
          coveredUntil = end
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](topChars, dupChars))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val ref = ctx.addReferenceObj("gramRepetition", this, classOf[GramRepetitionExpr].getName)
      s"${ev.value} = $ref.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramRepetitionExpr =
    copy(child = newChild)
}

object GramRepetitionExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def gramRepetition(toks: Column, n: Int): Column =
    ColumnBridge.column(GramRepetitionExpr(ColumnBridge.expression(toks), n))
}
