package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a Bloom-filter bitset from hash
  * positions: the buffer is a fixed `words x 64`-bit array, `reduce`
  * sets the input position's bit, `merge` ORs two bitsets. Like
  * [[MinHashAggregator]] this is the mergeable-summary shape — partial
  * aggregation builds per-partition bitsets map-side and the shuffle
  * carries one `words*8`-byte buffer per partition, never the
  * positions themselves. The finished filter is a SINGLE row of fixed
  * size regardless of how many elements were inserted — that is the
  * whole point: a benchmark set of any cardinality compresses to a
  * broadcastable constant-size summary (at the default 64k bits,
  * 8 KiB), and membership tests are row-local bit reads with a
  * one-sided error (false positives only, never false negatives).
  *
  * Callers must feed positions already reduced mod `words * 64`; the
  * aggregator requires it rather than re-modding so the position
  * scheme lives in exactly one place (the caller, mirrored by its
  * DuckDB oracle).
  */
class BloomFilterAggregator(words: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(words)(0L)

  override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < words.toLong * 64, s"position $pos out of range")
    buf((pos >> 6).toInt) |= (1L << (pos & 63))
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
