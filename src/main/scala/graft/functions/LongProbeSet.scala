package graft.functions

/** Open-addressed primitive long set — the shared probe table behind
  * [[LongSetHitsExpr]] (array-membership counting) and
  * [[LongSetContainsExpr]] (scalar membership). Linear probing over a
  * power-of-2 table at <= 50% load; no boxing anywhere. Slot emptiness is
  * marked by the EMPTY sentinel; a set member equal to the sentinel is
  * tracked by a flag (xxhash64 CAN produce any long, including
  * Long.MinValue).
  *
  * Built once per executor (the owning expressions hold it in a `@transient
  * lazy val`, reconstructed from the serialized key array after shipping),
  * then probed O(1) per lookup inside codegen'd eval loops.
  */
final class LongProbeSet(values: Array[Long]) extends Serializable {

  // loud failure instead of an Int-overflowed 8-slot table whose insert loop
  // would spin forever; the model regime these kernels exist for is KB-MB
  require(values.length < (1 << 28),
    s"reference set too large for a literal model (${values.length} >= 2^28) — " +
      "use a Bloom-filter or broadcast-join form instead")

  private[this] val table: Array[Long] = {
    val cap = math.max(8, Integer.highestOneBit(math.max(1, values.length) * 4 - 1) << 1)
    val t = Array.fill(cap)(LongProbeSet.EMPTY)
    val m = cap - 1
    values.foreach { v =>
      if (v != LongProbeSet.EMPTY) {
        var i = LongProbeSet.mix(v) & m
        while (t(i) != LongProbeSet.EMPTY && t(i) != v) i = (i + 1) & m
        t(i) = v
      }
    }
    t
  }

  private[this] val hasSentinel: Boolean = values.contains(LongProbeSet.EMPTY)

  private[this] val mask: Int = table.length - 1

  def contains(v: Long): Boolean =
    if (v == LongProbeSet.EMPTY) hasSentinel
    else {
      var j = LongProbeSet.mix(v) & mask
      while (table(j) != LongProbeSet.EMPTY && table(j) != v) j = (j + 1) & mask
      table(j) == v
    }
}

object LongProbeSet {
  final val EMPTY = Long.MinValue

  /** Stafford variant-13 finalizer — spreads consecutive/biased longs. */
  def mix(v: Long): Int = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }
}
