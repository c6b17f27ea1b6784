package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.11): merges per-document MinHash
  * signatures into a group-level signature by element-wise minimum —
  * the MinHash union property: min over the union of shingle sets =
  * element-wise min of the per-set signatures. The group signature
  * estimates Jaccard similarity between whole groups of documents
  * without touching their shingles again.
  *
  * This is the mergeable-sketch shape (HLL, KLL, MinHash all reduce
  * this way): partial aggregation combines sketches map-side, so the
  * shuffle carries one small signature per group per partition — at
  * 100 TB that is the difference between shuffling rows and shuffling
  * sketches.
  *
  * Signatures are the numeric KM double-hash orders (values in
  * [0, 2^32), see [[TextFunctions.minhashOrder]]); callers must feed
  * only documents with a non-empty shingle set (so no element is
  * NULL) — Long.MaxValue is the merge identity and can only surface
  * for a group with zero input rows, which groupBy never produces.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  private def mergeInto(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] =
    mergeInto(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    mergeInto(a, b.toSeq)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
