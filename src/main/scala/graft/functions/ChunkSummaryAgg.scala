package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass chunk summary (SURVEY §2.9's optional custom
  * aggregate): count + order-insensitive checksum in ONE buffer,
  * instead of separate `count(*)` and `sum(hash)` aggregates. The sum
  * accumulates in BigInt, so 60-bit terms never overflow regardless
  * of chunk size, and merge is associative/commutative — safe under
  * any partitioning and map-side combine.
  *
  * Input is the already-computed 60-bit row hash
  * ([[Norm.xhash64]] over the canonical row string), keeping the
  * aggregator engine-agnostic: the DuckDB oracle reproduces the same
  * (count, sum) from the same hash definition.
  */
object ChunkSummaryAgg
    extends Aggregator[Long, (Long, BigInt), (Long, String)] {
  override def zero: (Long, BigInt) = (0L, BigInt(0))
  override def reduce(b: (Long, BigInt), a: Long): (Long, BigInt) =
    (b._1 + 1, b._2 + a)
  override def merge(x: (Long, BigInt), y: (Long, BigInt)): (Long, BigInt) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, BigInt)): (Long, String) =
    (r._1, r._2.toString)
  override def bufferEncoder: Encoder[(Long, BigInt)] =
    Encoders.kryo[(Long, BigInt)]
  override def outputEncoder: Encoder[(Long, String)] =
    Encoders.product[(Long, String)]
}
