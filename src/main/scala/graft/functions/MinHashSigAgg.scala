package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE imperative aggregate: buffer = `long[k]` of
  * per-permutation minima, updated in a tight loop per input hash.
  *
  * Why custom (SURVEY.md §7.3's TypedImperativeAggregate candidate): the
  * composable form is k separate `min(rehash(h, i))` aggregate columns, which
  * costs k aggregate-expression evaluations and k buffer slots *managed
  * individually* per row. This aggregate derives all k permuted hashes from one
  * input with a splitmix64 finalizer (two multiplies + shifts each — far cheaper
  * than a full hash of the tuple) and takes the elementwise min in a primitive
  * array. Partial aggregation (map-side combine) and merge work as usual:
  * min is associative/commutative, so `merge` is elementwise min.
  *
  * Determinism: splitmix64 is a fixed pure function — signatures are stable
  * across runs, partitionings, and merges (required for LSH band reproducibility).
  */
case class MinHashSigAgg(child: Expression, numHashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a bigint hash input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  // splitmix64 finalizer — full-avalanche mix of (hash, permutation index)
  @inline private def mix(h: Long, i: Int): Long = {
    var z = h + 0x9E3779B97F4A7C15L * (i + 1).toLong
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val d = mix(h, i)
        if (d < buffer(i)) buffer(i) = d
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.forall(_ == Long.MaxValue)) null   // no input rows → null signature
    else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: `minhashSig(hashCol, k)` for `groupBy(...).agg(...)`. */
  def minhashSig(hash: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(hash), numHashes).toAggregateExpression())
}
