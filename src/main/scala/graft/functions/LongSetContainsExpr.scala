package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Scalar membership of a long column in a fixed reference set — the
  * single-value sibling of [[LongSetHitsExpr]] (which counts matches over an
  * ARRAY column). Exists for lambda positions: inside a higher-order
  * `filter(segments, s -> ...)` the composable form
  * (`array_contains(literalArray, xxhash64(s))`) scans the literal array
  * per element — a 100k-segment boilerplate model costs 100k comparisons
  * per segment. This probes a [[LongProbeSet]] built once, O(1) per call.
  *
  * Semantics: null input yields null; a set member equal to Long.MinValue
  * (the probe table's empty-slot sentinel) is handled via the set's
  * sentinel flag, so ANY 64-bit hash value is a valid member.
  */
case class LongSetContainsExpr(child: Expression, set: Array[Long])
  extends UnaryExpression {

  /** Stable plan rendering — same rationale as [[LongSetHitsExpr]]: render
    * length + content hash, not a JVM identity hash, so committed plan
    * snapshots don't churn on regeneration. */
  override protected def stringArgs: Iterator[Any] = Iterator(child,
    s"set(n=${set.length}, h=${java.util.Arrays.hashCode(set).toHexString})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_set_contains expects bigint, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val probe: LongProbeSet = new LongProbeSet(set)

  def hit(v: Long): Boolean = probe.contains(v)

  override def nullSafeEval(input: Any): Any = hit(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { v =>
      val ref = ctx.addReferenceObj("longSetContains", this,
        classOf[LongSetContainsExpr].getName)
      s"${ev.value} = $ref.hit($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): LongSetContainsExpr =
    copy(child = newChild)
}

object LongSetContainsExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  def longSetContains(v: Column, set: Array[Long]): Column =
    ColumnBridge.column(LongSetContainsExpr(ColumnBridge.expression(v), set))
}
