package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over `array<float>` embedding columns. All pure Catalyst
  * expression trees (zip_with / aggregate higher-order functions) — codegen-friendly,
  * no UDFs, and the sequential left-fold accumulation order is reproducible by the
  * DuckDB oracle (`list_reduce` over the zipped product list).
  *
  * Precision contract: elements are cast to double BEFORE any arithmetic, so both
  * engines do the identical double multiply + sequential double add.
  */
object VectorFns {

  /** array<float> → array<double>, the precision-stable form. */
  def toDoubleArray(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product of two equal-length vectors, as a native codegen
    * Expression ([[DotProductExpr]]) — the HOF form (`aggregate(zip_with(..))`)
    * is interpreted and ~20x slower in all-pairs joins. Same accumulation order. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DotProductExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(toDoubleArray(a)),
        org.apache.spark.sql.graft.ColumnBridge.expression(toDoubleArray(b))))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Full cosine similarity. The testdata embeddings are unit-normalized (verified:
    * every row has ||v|| = 1.0), so [[dot]] alone equals cosine there — prefer it in
    * hot paths; this general form divides by both norms. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Similarity rounded to 6 decimals — the comparison/ranking form. Raw doubles can
    * differ in the last ulp across engines (different but both-valid fold orders
    * after optimizer rewrites); ranking on the rounded value with an id tie-break is
    * deterministic. */
  def simKey(sim: Column): Column = round(sim, 6)

  /** Pack each dimension's SIGN BIT (value >= 0 → 1) into ONE LongType word —
    * the binary-embedding signature (dim <= 64 fits a single long; 64-dim
    * float32 compresses 32x). Native codegen expression ([[SignBitsExpr]] —
    * the signature projection runs once per corpus row in the binary-ANN
    * scan, so the interpreted HOF fold is the wrong tool there); pure
    * deterministic integer arithmetic, so everything built on the word
    * (XOR, popcount Hamming, shortlists) hash-oracles across engines — the
    * oracle counts sign mismatches directly without packing. */
  def signBits(v: Column, dim: Int): Column =
    SignBitsExpr.signBits(toDoubleArray(v), dim)

  /** The composable HOF twin of [[signBits]] — the fold runs highest
    * dimension first with `acc·2 + bit` (wrapping multiply IS shift-left).
    * Kept as the independent parity oracle for the native expression
    * (SimilaritySpec asserts bit-for-bit equality); interpreted — do not put
    * it in a corpus scan. */
  def signBitsHof(v: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"signBits packs one long: dim in [1, 64], got $dim")
    aggregate(
      transform(sequence(lit(dim - 1), lit(0), lit(-1)),
        i => when(element_at(toDoubleArray(v), i + 1) >= 0, lit(1L)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc * 2 + b)
  }

  /** L2-normalize against a PRE-MATERIALIZED norm column. The norm must be
    * bound in its own projection (`.select(..., l2Norm(v).as("nrm"))`) — passed
    * as an expression it would be inlined into the per-element lambda and
    * recomputed `dim` times per row (the per-index-lambda rule that cost 12x
    * on the shingle path). Zero vectors pass through unchanged (norm 0 guard). */
  def l2NormalizeByNorm(v: Column, norm: Column): Column =
    when(norm === 0.0, toDoubleArray(v))
      .otherwise(transform(toDoubleArray(v), x => x / norm))

  /** Symmetric int8 quantization scale: 127 / max|x| (0 for the zero vector).
    * Materialize before [[quantizeInt8]] — same per-element-lambda rule. */
  def int8Scale(v: Column): Column = {
    val m = array_max(transform(toDoubleArray(v), x => abs(x)))
    when(m === 0.0, lit(0.0)).otherwise(lit(127.0) / m)
  }

  /** Quantize to int8 codes with a pre-materialized [[int8Scale]] column —
    * the 16x memory compression an ANN corpus ships at 100 TB (reconstruction
    * error per element is bounded by 0.5/scale; SimilaritySpec asserts the
    * bound and cosine preservation). Rounding is ties-away-from-zero via
    * sign·floor(|x|+0.5) — `round()` expands every double through BigDecimal,
    * which at dim rounds per row dominated the 1M-vector smoke pass. */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(toDoubleArray(v), x => {
      val y = x * scale
      (signum(y) * floor(abs(y) + 0.5d)).cast("int")
    })

  /** Dequantize int8 codes back to doubles (codes / scale). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    when(scale === 0.0, transform(q, x => x.cast("double")))
      .otherwise(transform(q, x => x.cast("double") / scale))

  /** Deterministic plane weights for [[hyperplaneBucket]]: seeded driver-side
    * PRNG, one dim-length row per bit — reproducible across runs without
    * shipping a plane matrix through the plan. */
  def hyperplanes(dim: Int, nbits: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed * 1000003L + 12345L)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Random-hyperplane LSH bucket for ANN search: `nbits` sign bits packed into a
    * long ([[HyperplaneBucketExpr]] — one native loop over the plane matrix;
    * the per-bit HOF-dot form it replaces cost 13x on the 1M-vector smoke, and
    * per-element Catalyst hash expressions for the weights were worse still, a
    * ~3000-node tree whose codegen alone dominates runtime). Cosine-similar
    * vectors agree on most sign bits, so equal buckets ⇒ likely-similar (the
    * scale path that replaces the O(n²) brute-force pair scan).
    */
  def hyperplaneBucket(v: Column, dim: Int, nbits: Int = 16, seed: Int = 0): Column =
    HyperplaneBucketExpr.hyperplaneBucket(toDoubleArray(v), hyperplanes(dim, nbits, seed))
}
