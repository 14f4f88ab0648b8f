package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash `h = (h*31 + byte) mod 1e9+7` over an ASCII string
  * — the oracle-reproducible document fingerprint (`TextFns.fingerprint`).
  *
  * Why native: the composable form builds `transform(sequence(1, length), i ->
  * ascii(substring(s, i, 1)))` and folds it — each `substring(s, i, 1)` walks
  * the string from the start, so the whole thing is O(n²) per document plus an
  * interpreted lambda per character (~100 µs on a 1 KB document). This is one
  * O(n) byte loop in whole-stage codegen.
  *
  * Semantics contract (keep in sync with the DuckDB oracle's `list_reduce`
  * over `ascii(...)` codes): callers pass ASCII-clean input (TextFns strips
  * `[^a-z0-9 ]` first) — each BYTE is then exactly the `ascii()` code.
  * Empty string hashes to 0; null yields null. Products stay < 2^63
  * (1e9+7 · 31 + 255 < 2^35 · 2^5), so the arithmetic is exact. */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { s =>
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def rollingHash(s: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(s)))
}
