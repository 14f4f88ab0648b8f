package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * sampler): over an array of k-gram hashes, slide a window of `w`
  * consecutive hashes and select each window's MINIMUM, rightmost occurrence
  * on ties; record each selected (position, hash) once. Output is
  * `array<struct<pos:int, fp:bigint>>`, positions 0-based gram indices.
  *
  * The guarantee this buys: any substring match of at least w+k-1 tokens
  * between two documents yields at least one SHARED fingerprint (every
  * length-w hash window inside the match is identical in both docs, so both
  * select the same (relative pos, hash)); expected density is 2/(w+1) of the
  * gram count — the sampling is position-stable, unlike "every j-th hash"
  * schemes that break on single-token insertions.
  *
  * Why native: the selection is a per-document sequential scan with
  * rightmost-tie argmin state — as a composable form it needs a
  * transform(sequence(...)) over window starts with a reduce per window,
  * O(n·w) interpreted lambda steps and a distinct over struct arrays
  * (unsupported in several engines); here it is one fused O(n·w) primitive
  * loop (w is small — 4..16) emitting already-deduplicated selections.
  * With rightmost tie-breaking, selected positions are NON-DECREASING across
  * windows (the rightmost argmin of a window never moves left as the window
  * advances), so comparing against the last emission deduplicates exactly.
  *
  * Semantics contract (keep in sync with the DuckDB oracle): fewer than `w`
  * hashes → empty result (short docs carry no fingerprints — the guarantee
  * needs w+k-1 tokens anyway); null elements never BECOME a fingerprint
  * (treated as Long.MaxValue for the min, and a window whose winner is a
  * null element emits nothing — gram-hash inputs are never null in practice,
  * so this only guards malformed input); null array → null.
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)

  def winnow(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    var i = 0
    while (i <= n - w) {
      var m = Long.MaxValue
      var mp = -1
      var j = i
      while (j < i + w) {
        val v = if (arr.isNullAt(j)) Long.MaxValue else arr.getLong(j)
        if (v <= m) { m = v; mp = j } // <= : rightmost occurrence wins ties
        j += 1
      }
      // a window whose winner is a null element (only possible when every
      // element is null, or a null ties MaxValue) yields no fingerprint
      if (mp != lastPos && !arr.isNullAt(mp)) {
        out += InternalRow(mp, m)
        lastPos = mp
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = winnow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowExpr].getName)
      s"${ev.value} = $ref.winnow($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def winnow(hashes: Column, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(hashes), w))
}
