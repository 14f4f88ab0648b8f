package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of an `array<double>` column as ONE imperative aggregate:
  * buffer = (dim-length running sum, row count), map-side combinable.
  *
  * Exists for the k-means step of IVF training ([[graft.operators.Similarity]]):
  * the composable alternative — posexplode to (cell, pos, x), mean per (cell,
  * pos), re-collect per cell — inflates the shuffle `dim`-fold (64x on the
  * bench embeddings) and needs a second shuffle to reassemble the array. This
  * aggregate shuffles one partial (sum[dim], n) per (cell, map task).
  *
  * Semantics: rows whose array is null or contains a null element are SKIPPED
  * (malformed input must not poison a centroid); a row whose length differs
  * from the buffer's THROWS — silently picking a dimension would make the
  * result depend on partition order. Empty group → null. Sum order follows
  * partial-aggregation merge order, so last-ulp float variation across runs is
  * possible — fine for a model fit, not for an oracle-checked result.
  */
case class VectorMeanAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_mean expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorMeanAgg.Buf =
    new VectorMeanAgg.Buf(null, 0L)

  override def update(buffer: VectorMeanAgg.Buf, input: InternalRow): VectorMeanAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buffer.sum != null && buffer.sum.length != n)
        throw new IllegalStateException(
          s"vector_mean: mixed dimensions in one group (${buffer.sum.length} vs $n)")
      var i = 0
      var clean = true
      while (clean && i < n) { clean = !arr.isNullAt(i); i += 1 }
      if (clean && n > 0) {
        if (buffer.sum == null) buffer.sum = new Array[Double](n)
        i = 0
        while (i < n) { buffer.sum(i) += arr.getDouble(i); i += 1 }
        buffer.n += 1
      }
    }
    buffer
  }

  override def merge(buffer: VectorMeanAgg.Buf, other: VectorMeanAgg.Buf): VectorMeanAgg.Buf = {
    if (other.sum != null) {
      if (buffer.sum == null) { buffer.sum = other.sum.clone(); buffer.n = other.n }
      else if (buffer.sum.length == other.sum.length) {
        var i = 0
        while (i < buffer.sum.length) { buffer.sum(i) += other.sum(i); i += 1 }
        buffer.n += other.n
      } else throw new IllegalStateException(
        s"vector_mean: mixed dimensions across partials (${buffer.sum.length} vs ${other.sum.length})")
    }
    buffer
  }

  override def eval(buffer: VectorMeanAgg.Buf): Any =
    if (buffer.n == 0L) null
    else new GenericArrayData(buffer.sum.map(_ / buffer.n))

  override def serialize(buffer: VectorMeanAgg.Buf): Array[Byte] = {
    val dim = if (buffer.sum == null) 0 else buffer.sum.length
    val bb = ByteBuffer.allocate(8 + 4 + dim * 8)
    bb.putLong(buffer.n).putInt(dim)
    if (buffer.sum != null) buffer.sum.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val dim = bb.getInt
    val sum = if (dim == 0) null else Array.fill(dim)(bb.getDouble)
    new VectorMeanAgg.Buf(sum, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** Mutable (running sum, count) aggregation buffer. */
  final class Buf(var sum: Array[Double], var n: Long)

  /** Column form: `vectorMean(arrayCol)` for `groupBy(...).agg(...)`. */
  def vectorMean(v: Column): Column =
    ColumnBridge.column(
      VectorMeanAgg(ColumnBridge.expression(v)).toAggregateExpression())
}
