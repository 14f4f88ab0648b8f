package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-ROW MinHash signature from an array of shingle hashes — the map-only
  * twin of [[MinHashSigAgg]], for pipelines that cannot aggregate: Structured
  * Streaming in append mode (a streaming groupBy needs watermarked state; a
  * projection needs nothing) and any per-row re-signature over an already
  * tokenized table. Bit-identical to the aggregate (same splitmix64
  * permutation mix, same elementwise min — DedupSpec asserts signature
  * equality on the fixture), so bands/buckets built from either form join
  * against each other.
  *
  * Cost note: same O(|shingles| · k) arithmetic as the aggregate path, but
  * per row the shingle-hash ARRAY must be materialized first (the aggregate
  * streams exploded rows through a shared buffer) — prefer the aggregate in
  * batch jobs; this expression exists for the map-only contexts above.
  *
  * Null semantics: null array → null; null ELEMENT → null (poisoning, the
  * native-expression contract everywhere else); EMPTY array → null, matching
  * the aggregate's no-input-rows null signature.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_row expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      if (arr.isNullAt(e)) return null
      val h = arr.getLong(e)
      var i = 0
      while (i < numHashes) {
        // splitmix64 finalizer — MUST match MinHashSigAgg.mix exactly
        var z = h + 0x9E3779B97F4A7C15L * (i + 1).toLong
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < sig(i)) sig(i) = z
        i += 1
      }
      e += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  final long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $e = 0; $e < $n && !${ev.isNull}; $e++) {
         |    if ($arr.isNullAt($e)) { ${ev.isNull} = true; break; }
         |    final long $h = $arr.getLong($e);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $z = $h + 0x9E3779B97F4A7C15L * (long) ($i + 1);
         |      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |      $z = $z ^ ($z >>> 31);
         |      if ($z < $sig[$i]) $sig[$i] = $z;
         |    }
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: per-row signature from an `array<bigint>` of shingle hashes. */
  def minhashSigRow(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes), numHashes))
}
