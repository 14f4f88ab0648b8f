package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3's one justified custom piece): the
  * composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a higher-order
  * function, which Catalyst evaluates interpreted (lambda per element, boxed
  * accumulator) and which blocks whole-stage codegen for the surrounding operator.
  * On the all-pairs similarity joins that is the entire inner loop. This expression
  * generates a primitive `double` for-loop inside whole-stage codegen instead
  * (~20x on the sf0.1 embedding-dedup bench).
  *
  * Semantics contract: identical to the HOF form and to DuckDB's
  * `list_reduce(list_transform(...))` oracle — strict left-to-right sequential
  * double accumulation over min(len(a), len(b)) elements, null if either side is
  * null, and null if any consumed ELEMENT is null (the HOF form's `null * x`
  * poisons the sum the same way). Keep all three in sync.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString}) — " +
        "cast with VectorFns.toDoubleArray first")
  }

  override def dataType: DataType = DoubleType

  // A null ELEMENT yields a null result even when both inputs are non-null, so
  // nullability cannot be derived from the children (BinaryExpression's default
  // left.nullable || right.nullable would let nullSafeCodeGen emit
  // `boolean isNull = false; ... isNull = true;` on a `final` local and let the
  // optimizer constant-fold IsNull(dot_product(...)) to false).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}
