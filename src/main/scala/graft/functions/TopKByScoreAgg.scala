package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator over (score, id) pairs — SURVEY.md §7.3's
  * "TypedImperativeAggregate top-k-by-similarity" piece.
  *
  * Why custom: the composable form ranks with
  * `row_number().over(Window.partitionBy(q).orderBy(score.desc))` + filter,
  * which sorts EVERY candidate of a group before discarding all but k. This
  * aggregate keeps a k-element min-heap per group instead: O(n log k) with
  * map-side partial aggregation (each map task sends at most k candidates per
  * group to the shuffle, not its whole candidate set) — the difference between
  * shuffling k rows and shuffling the corpus at 100 TB fan-in.
  *
  * Ordering: best = greatest (score, then SMALLEST id as tie-break) — identical
  * to `orderBy(score.desc, id.asc)`; output array is best-first.
  */
case class TopKByScoreAgg(score: Expression, id: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (double, bigint), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  private def worstFirst: Comparator[(Double, Long)] = TopKByScoreAgg.WorstFirst

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](k, worstFirst)

  private def offer(buf: PriorityQueue[(Double, Long)], cand: (Double, Long)): Unit =
    if (buf.size < k) buf.add(cand)
    else if (worstFirst.compare(cand, buf.peek()) > 0) { buf.poll(); buf.add(cand) }

  override def update(buf: PriorityQueue[(Double, Long)],
                      input: InternalRow): PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: PriorityQueue[(Double, Long)],
                     other: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    other.forEach(offer(buf, _))
    buf
  }

  override def eval(buf: PriorityQueue[(Double, Long)]): Any = {
    // non-destructive: heap iteration order is unspecified, so copy + sort best-first
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    val sorted = arr.sortWith((a, b) => worstFirst.compare(a, b) > 0)
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { t => bb.putDouble(t._1); bb.putLong(t._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScoreAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** worst-kept-first heap order: smallest score at the head; ties put the
    * LARGEST id first (it loses to a same-score smaller id). A named object, not
    * a SAM lambda — the expression ships to executors and must serialize. */
  private[functions] object WorstFirst
    extends Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  /** Column form: best-first `array<struct<score,id>>` of the top k. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScoreAgg(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
