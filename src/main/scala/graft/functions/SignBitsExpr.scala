package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst sign-bit packer over an `array<double>` column: bit i of the
  * LongType result is set iff element i is >= 0 — the binary-embedding
  * signature ([[VectorFns.signBits]]'s contract, `dim` <= 64).
  *
  * Why a custom Expression (the [[DotProductExpr]] rationale): the composable
  * form — `aggregate(transform(sequence(...), ...), 0L, acc*2+b)` — is a
  * higher-order function, interpreted per element with a boxed accumulator,
  * and it blocks whole-stage codegen for the surrounding operator. The
  * signature projection runs once per CORPUS row in [[graft.operators.Similarity.binaryTopK]]'s
  * stage-1 scan (and once per row at index-build time when the signature
  * column is persisted), so it sits exactly where the NearestCentroid lesson
  * applies. This expression generates a primitive long loop with an OR-shift
  * accumulator inside whole-stage codegen.
  *
  * Semantics contract: identical to the HOF fold (SimilaritySpec asserts
  * bit-for-bit equality) — bit i from element i via `>= 0`, missing elements
  * (array shorter than `dim`) contribute 0 bits, null input → null, any null
  * ELEMENT → null (poisons the word the way `null * x` poisons a sum). */
case class SignBitsExpr(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1 && dim <= 64, s"sign_bits packs one long: dim in [1, 64], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bits expects array<double>, got ${other.simpleString} — " +
        "cast with VectorFns.toDoubleArray first")
  }

  override def dataType: DataType = LongType

  // null ELEMENTS null the result even for non-null input (see DotProductExpr)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var w = 0L
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      if (v.getDouble(i) >= 0) w |= (1L << i)
      i += 1
    }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      s"""
         |final int $n = java.lang.Math.min($dim, $v.numElements());
         |long $w = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  if ($v.getDouble($i) >= 0) $w |= (1L << $i);
         |}
         |${ev.value} = $w;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBitsExpr =
    copy(child = newChild)
}

object SignBitsExpr {
  def signBits(v: Column, dim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SignBitsExpr(org.apache.spark.sql.graft.ColumnBridge.expression(v), dim))
}
