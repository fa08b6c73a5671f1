package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass chunk summary (SURVEY §2.9's optional custom
  * aggregate): count + order-insensitive checksum in ONE buffer,
  * instead of separate `count(*)` and `sum(hash)` aggregates. The sum
  * accumulates in an explicit 128-bit (high, low) pair with manual
  * carry, so 60-bit terms never overflow before ~2^68 rows, and both
  * reduce and merge are associative/commutative — safe under any
  * partitioning and map-side combine.
  *
  * The buffer is (count, sumHigh, sumLow) — three primitive longs
  * under `Encoders.product`, i.e. a plain UnsafeRow: an earlier
  * version buffered (Long, BigInt) under `Encoders.kryo`, which (a)
  * serialized a boxed object graph on every partial-aggregate
  * spill/exchange and (b) was the repo's ONE Kryo-encoded path, the
  * only code that failed when the JVM lacked spark-submit's
  * `--add-opens java.base/java.nio` (Kryo's FieldSerializer reflects
  * into HeapByteBuffer; see the verify skill's gotcha note). The
  * 128-bit carry arithmetic removes both.
  *
  * Input is the already-computed 60-bit row hash
  * ([[Norm.xhash64]] over the canonical row string), keeping the
  * aggregator engine-agnostic: the DuckDB oracle reproduces the same
  * (count, sum) from the same hash definition; `finish` renders the
  * exact 128-bit sum in decimal, identical to the previous BigInt
  * rendering.
  */
object ChunkSummaryAgg
    extends Aggregator[Long, (Long, Long, Long), (Long, String)] {

  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  // terms are non-negative (60-bit), so unsigned overflow of the low
  // word is exactly `newLow <u oldLow`
  override def reduce(b: (Long, Long, Long), a: Long): (Long, Long, Long) = {
    val lo = b._3 + a
    val carry = if (java.lang.Long.compareUnsigned(lo, b._3) < 0) 1L else 0L
    (b._1 + 1, b._2 + carry, lo)
  }

  override def merge(x: (Long, Long, Long),
      y: (Long, Long, Long)): (Long, Long, Long) = {
    val lo = x._3 + y._3
    val carry = if (java.lang.Long.compareUnsigned(lo, x._3) < 0) 1L else 0L
    (x._1 + y._1, x._2 + y._2 + carry, lo)
  }

  override def finish(r: (Long, Long, Long)): (Long, String) = {
    val sum = (BigInt(r._2) << 64) +
      BigInt(java.lang.Long.toUnsignedString(r._3))
    (r._1, sum.toString)
  }

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.product[(Long, Long, Long)]
  override def outputEncoder: Encoder[(Long, String)] =
    Encoders.product[(Long, String)]
}
