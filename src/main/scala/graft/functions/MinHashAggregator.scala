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
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  override def zero: Array[String] = Array.fill(numHashes)(null)

  private def mergeInto(buf: Array[String], sig: Seq[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      val v = sig(i)
      if (buf(i) == null || (v != null && v < buf(i))) buf(i) = v
      i += 1
    }
    buf
  }

  override def reduce(buf: Array[String], sig: Seq[String]): Array[String] =
    mergeInto(buf, sig)

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    mergeInto(a, b.toSeq)

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
