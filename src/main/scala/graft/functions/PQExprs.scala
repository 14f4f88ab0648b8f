package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): the vector
  * splits into `m` equal subspaces, each quantized independently against a
  * `ksub`-entry codebook; a vector compresses to `m` small codes and distances
  * are computed code-wise against the codebooks (ADC — asymmetric distance
  * computation: the query stays exact, only the corpus side is quantized).
  *
  * Both kernels take the codebook matrix as a flattened reference object
  * (`double[m*ksub][dsub]`) with one constant-size nested loop — the same
  * JIT-threshold rationale as [[NearestCentroidExpr]]: an unrolled per-cell
  * form grows with m × ksub past the ~8KB method limit and falls back to the
  * bytecode interpreter.
  */
object PQ {
  /** codebooks(sub)(cell) -> sub-centroid of length dsub, flattened to
    * [m*ksub][dsub] row-major (sub-major) for the codegen reference. */
  def flatten(codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    codebooks.flatten
}

/** Encode a vector to its `m` PQ codes: for each subspace, the index of the
  * codebook entry with the smallest squared-L2 distance to the sub-vector
  * (the k-means assignment rule; ties break to the SMALLER code for
  * determinism). Returns array<int> of length m. Null array or null element
  * -> null (dot-product contract shared across the vector kernels). Input
  * shorter than m*dsub treats missing tail dims as 0. */
case class PQCodesExpr(child: Expression,
                       flatBooks: Array[Array[Double]],
                       m: Int, ksub: Int)
  extends UnaryExpression {

  require(m >= 1 && ksub >= 1 && flatBooks.length == m * ksub,
    s"need m*ksub codebook rows, got ${flatBooks.length} for m=$m ksub=$ksub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private val dsub = flatBooks(0).length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var cell = 0
      while (cell < ksub) {
        val cent = flatBooks(sub * ksub + cell)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val gi = sub * dsub + i
          if (gi < n && arr.isNullAt(gi)) return null
          val x = if (gi < n) arr.getDouble(gi) else 0.0
          val diff = x - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = cell }
        cell += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val books = ctx.addReferenceObj("pqBooks", flatBooks, "double[][]")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val sub = ctx.freshName("sub")
      val cell = ctx.freshName("cell")
      val i = ctx.freshName("i")
      val gi = ctx.freshName("gi")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $codes = new int[$m];
         |for (int $sub = 0; $sub < $m && !${ev.isNull}; $sub++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $cell = 0; $cell < $ksub && !${ev.isNull}; $cell++) {
         |    final double[] $cent = $books[$sub * $ksub + $cell];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      final int $gi = $sub * $dsub + $i;
         |      if ($gi < $n && $arr.isNullAt($gi)) { ${ev.isNull} = true; break; }
         |      final double $x = ($gi < $n) ? $arr.getDouble($gi) : 0.0;
         |      final double $diff = $x - $cent[$i];
         |      $d += $diff * $diff;
         |    }
         |    if (!${ev.isNull} && $d < $bestD) { $bestD = $d; $best = $cell; }
         |  }
         |  $codes[$sub] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PQCodesExpr =
    copy(child = newChild)
}

/** ADC score: the inner product between an EXACT query vector and a
  * PQ-RECONSTRUCTED corpus vector — dot(q, x̂) decomposes exactly into
  * per-subspace dots against the coded centroids:
  * Σ_sub dot(q[sub·dsub ..], codebook[sub][codes[sub]]). The query side loses
  * nothing; all distortion comes from the corpus quantization (that asymmetry
  * is the 'A' in ADC and why PQ beats symmetric code-to-code scoring).
  * Left: array<double> query; right: array<int> codes (length m). Null array,
  * null element, or a codes array whose length != m -> null. */
case class PQAdcExpr(left: Expression, right: Expression,
                     flatBooks: Array[Array[Double]],
                     m: Int, ksub: Int)
  extends BinaryExpression {

  require(m >= 1 && ksub >= 1 && flatBooks.length == m * ksub,
    s"need m*ksub codebook rows, got ${flatBooks.length} for m=$m ksub=$ksub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<double>, array<int>), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val dsub = flatBooks(0).length

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val n = q.numElements()
    // A codes row of the wrong length is malformed input — null, never a
    // partial (plausible-looking but wrong) score that would silently corrupt
    // an ANN ranking.
    if (codes.numElements() != m) return null
    var s = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val cent = flatBooks(sub * ksub + codes.getInt(sub))
      var i = 0
      while (i < dsub) {
        val gi = sub * dsub + i
        if (gi < n) {
          if (q.isNullAt(gi)) return null
          s += q.getDouble(gi) * cent(i)
        }
        i += 1
      }
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { (q, codes) =>
      val books = ctx.addReferenceObj("pqBooks", flatBooks, "double[][]")
      val n = ctx.freshName("n")
      val sub = ctx.freshName("sub")
      val i = ctx.freshName("i")
      val gi = ctx.freshName("gi")
      val s = ctx.freshName("s")
      val cent = ctx.freshName("cent")
      s"""
         |final int $n = $q.numElements();
         |if ($codes.numElements() != $m) { ${ev.isNull} = true; }
         |double $s = 0.0;
         |for (int $sub = 0; $sub < $m && !${ev.isNull}; $sub++) {
         |  if ($codes.isNullAt($sub)) { ${ev.isNull} = true; break; }
         |  final double[] $cent = $books[$sub * $ksub + $codes.getInt($sub)];
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    final int $gi = $sub * $dsub + $i;
         |    if ($gi < $n) {
         |      if ($q.isNullAt($gi)) { ${ev.isNull} = true; break; }
         |      $s += $q.getDouble($gi) * $cent[$i];
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PQAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PQExprs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: vector -> array<int> of m codes. */
  def pqCodes(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    ColumnBridge.column(PQCodesExpr(ColumnBridge.expression(v), PQ.flatten(codebooks), m, ksub))
  }

  /** Column form: (exact query vector, corpus codes) -> ADC inner product. */
  def pqAdc(q: Column, codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    ColumnBridge.column(PQAdcExpr(ColumnBridge.expression(q), ColumnBridge.expression(codes),
      PQ.flatten(codebooks), m, ksub))
  }
}
