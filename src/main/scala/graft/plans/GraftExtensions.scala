package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArgMaxAgg, BandedEditDistanceExpr, DotProductExpr, MinHashSigAgg, TopKByScoreAgg}

/** SparkSessionExtensions entry point: registers the engine's native expressions
  * as SQL functions, so the custom Catalyst pieces are reachable from plain
  * `spark.sql(...)` exactly like built-ins:
  *
  *   - `graft_dot(a, b)`            — codegen dot product ([[DotProductExpr]])
  *   - `graft_minhash_sig(h, k)`    — MinHash signature aggregate ([[MinHashSigAgg]])
  *   - `graft_top_k(score, id, k)`  — bounded top-k aggregate ([[TopKByScoreAgg]])
  *   - `graft_edit_distance(l, r, k)` — banded thresholded Levenshtein
  *     ([[BandedEditDistanceExpr]]; -1 past the threshold)
  *   - `graft_arg_max(ord, payload)`  — hash-aggregatable argmax
  *     ([[ArgMaxAgg]]; `max_by` without the SortAggregate lowering)
  *
  * Wire up with `.withExtensions(new GraftExtensions)` at session build, or
  * `spark.sql.extensions=graft.plans.GraftExtensions` in config — the standard
  * extension-library pattern (SparkSessionExtensions is the public API for it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: literal integer expected, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProductExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigAgg].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(hash, numHashes)")
        MinHashSigAgg(args(0), intArg(args(1), "graft_minhash_sig"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKByScoreAgg].getName, "graft_top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_top_k(score, id, k)")
        TopKByScoreAgg(args(0), args(1), intArg(args(2), "graft_top_k"))
          .toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_arg_max"),
      new ExpressionInfo(classOf[ArgMaxAgg].getName, "graft_arg_max"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_arg_max(ord, payload)")
        ArgMaxAgg(args(0), args(1)).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_edit_distance"),
      new ExpressionInfo(classOf[BandedEditDistanceExpr].getName, "graft_edit_distance"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_edit_distance(left, right, maxDist)")
        BandedEditDistanceExpr(args(0), args(1), intArg(args(2), "graft_edit_distance"))
      }))
  }
}
