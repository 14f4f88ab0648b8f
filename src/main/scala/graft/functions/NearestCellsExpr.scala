package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Top-k cells by dot product against a fixed centroid matrix — the IVF PROBE
  * kernel (`Similarity.ivfProbeAssigned`'s nprobe-cell expansion), the k>1
  * sibling of [[NearestCentroidExpr]].
  *
  * Why native (same rationale as [[NearestCentroidExpr]]): the composable form
  * — `slice(array_sort(array(struct(-dot, id), ...)), 1, k)` over per-centroid
  * literals — unrolls one dot loop per centroid into a single generated
  * method; fine for a handful of query rows, but past the JIT threshold at
  * nlist≈64 it drops to the bytecode interpreter, which forecloses
  * corpus-scale probing (batch kNN where the query set IS the corpus). This
  * emits constant-size loops over a `double[][]` reference plus a k-slot
  * insertion sort (k = nprobe, small).
  *
  * Semantics: returns the ids of the `k` highest-dot centroids, best first,
  * ties broken to the SMALLER id (matches the `(-sim, cell)` ascending sort it
  * replaces). k >= nlist returns all cells ranked. Null input array or null
  * element yields null.
  */
case class NearestCellsExpr(child: Expression,
                            centroids: Array[Array[Double]],
                            ids: Array[Int],
                            k: Int)
  extends UnaryExpression {

  require(centroids.nonEmpty && centroids.length == ids.length,
    "need one id per centroid row")
  require(k >= 1, s"k must be positive, got $k")

  private val kk = math.min(k, centroids.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val topSim = Array.fill(kk)(Double.NegativeInfinity)
    val topId = Array.fill(kk)(Int.MaxValue)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val lim = math.min(n, cent.length)
      var s = 0.0
      var i = 0
      while (i < lim) {
        if (arr.isNullAt(i)) return null
        s += arr.getDouble(i) * cent(i)
        i += 1
      }
      val id = ids(c)
      // insertion position: before the first slot this cell beats
      var pos = kk
      while (pos > 0 && (s > topSim(pos - 1) ||
        (s == topSim(pos - 1) && id < topId(pos - 1)))) pos -= 1
      if (pos < kk) {
        var j = kk - 1
        while (j > pos) { topSim(j) = topSim(j - 1); topId(j) = topId(j - 1); j -= 1 }
        topSim(pos) = s
        topId(pos) = id
      }
      c += 1
    }
    new GenericArrayData(topId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { arr =>
      val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val idsRef = ctx.addReferenceObj("centroidIds", ids, "int[]")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val id = ctx.freshName("id")
      val pos = ctx.freshName("pos")
      val lim = ctx.freshName("lim")
      val cent = ctx.freshName("cent")
      val topSim = ctx.freshName("topSim")
      val topId = ctx.freshName("topId")
      s"""
         |final int $n = $arr.numElements();
         |final double[] $topSim = new double[$kk];
         |final int[] $topId = new int[$kk];
         |java.util.Arrays.fill($topSim, Double.NEGATIVE_INFINITY);
         |java.util.Arrays.fill($topId, Integer.MAX_VALUE);
         |for (int $c = 0; $c < $m.length && !${ev.isNull}; $c++) {
         |  final double[] $cent = $m[$c];
         |  final int $lim = java.lang.Math.min($n, $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $lim; $i++) {
         |    if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $arr.getDouble($i) * $cent[$i];
         |  }
         |  if (${ev.isNull}) break;
         |  final int $id = $idsRef[$c];
         |  int $pos = $kk;
         |  while ($pos > 0 && ($s > $topSim[$pos - 1] ||
         |      ($s == $topSim[$pos - 1] && $id < $topId[$pos - 1]))) $pos--;
         |  if ($pos < $kk) {
         |    for (int $j = $kk - 1; $j > $pos; $j--) {
         |      $topSim[$j] = $topSim[$j - 1]; $topId[$j] = $topId[$j - 1];
         |    }
         |    $topSim[$pos] = $s;
         |    $topId[$pos] = $id;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($topId);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

object NearestCellsExpr {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form over (id, centroid) pairs. */
  def nearestCells(v: Column, centroids: Seq[(Int, Seq[Double])], k: Int): Column =
    ColumnBridge.column(NearestCellsExpr(
      ColumnBridge.expression(v),
      centroids.map(_._2.toArray).toArray,
      centroids.map(_._1).toArray, k))
}
