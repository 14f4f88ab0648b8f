package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers over Spark's own Bloom-filter expressions — the machinery
  * behind AQE's injected runtime filters
  * (`org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate`,
  * `BloomFilterMightContain`), exposed here for EXPLICIT use: fit a
  * fixed-size filter over one side's join/membership keys and probe it
  * map-side on the other. Both are native codegen'd expressions operating on
  * xxhash64 LONGS — the filter is a `numBits`-bit object regardless of how
  * many keys fed it, so it broadcasts as a single binary value. */
object BloomFns {
  /** Aggregate a LongType hash column into a serialized Bloom filter
    * (BinaryType, one value). `expectedItems`/`numBits` size the filter —
    * false-positive rate ≈ (1 - e^(-k·n/m))^k with k optimal for n/m; stay
    * under Spark's 4M-item / 64M-bit aggregate ceilings. */
  def bloomAgg(hash: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hash), Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())

  /** Membership probe of a LongType hash against a [[bloomAgg]] binary:
    * false positives at the sized rate, NEVER false negatives; null bloom or
    * null hash yields null (filter semantics drop it). */
  def mightContain(bloom: Column, hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash)))
}
