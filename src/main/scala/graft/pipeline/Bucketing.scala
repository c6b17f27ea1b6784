package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the shuffle-elimination tool for the joins a
  * pipeline runs REPEATEDLY on the same key. A 100 TB corpus is joined
  * against its derived per-document tables (dedup cluster labels,
  * quality scores, split assignments) on `doc_id` over and over; each
  * such join normally shuffles BOTH sides. Writing the corpus and its
  * derivations bucketed (and sorted) by the join key moves that
  * shuffle to write time, ONCE: every later sort-merge join reads
  * co-located buckets and plans zero exchanges — at 100 TB that is the
  * difference between an all-to-all network pass per join and none.
  *
  * Uses Spark's datasource bucketing (no Hive dependency): bucket
  * membership is `pmod(hash(key), n)`, recorded in the catalog, so
  * Catalyst proves both sides' partitioning matches and drops the
  * exchange. BucketingSpec pins exactly that plan property plus
  * result equality with the shuffled join.
  *
  * The bucket COUNT is the scale dial: it bounds per-task input size
  * (corpus_bytes / n per task) and caps usable write/join parallelism,
  * so a production corpus sizes n to corpus_bytes / target_task_bytes
  * (e.g. 100 TB / 256 MB = ~400k buckets) — far above any fixture
  * size, which is why it is a caller argument, not a constant.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external parquet table registered
    * in the session catalog. Sorting within buckets makes the later
    * sort-merge join's sort a no-op read order, and gives parquet
    * min/max pruning on the key for free.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two registered bucketed tables on `key`. Plain
    * DataFrame join — the zero-exchange plan comes from the catalog's
    * bucket metadata, not from any hint here.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Write `df` globally ordered by `key` WITHOUT a single-task sort:
    * `repartitionByRange` samples split points and gives each
    * partition a disjoint key range, `sortWithinPartitions` orders
    * inside each, and files emit in partition order — so every key in
    * file i precedes every key in file i+1, at full cluster
    * parallelism. The layout for curriculum-ordered training output
    * (read sequentially = ascending quality/difficulty) and for
    * min/max-prunable range scans; a plain `orderBy(...).write` would
    * plan the same range exchange but is worth naming as the layout
    * operation it is. BucketingSpec verifies disjoint per-file key
    * ranges from the parquet footers, not from the plan.
    */
  def writeRangeSorted(df: DataFrame, path: String, key: String, nParts: Int): Unit =
    df.repartitionByRange(nParts, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** 2-D Z-order (Morton) key: interleave the low `bits` bits of x and
    * y (x in even positions, y in odd). A pure codegen expression tree
    * of 2*bits shift/mask terms — no UDF. Inputs must be non-negative;
    * callers bucketize/`pmod` first.
    */
  def zorderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered on the Z-order curve of (xCol, yCol) — the
    * layout for data skipping on TWO dimensions at once. Range-sort on
    * one key prunes scans filtered on that key only; sorting on the
    * Morton key keeps each output file's rows inside a small square of
    * the (x, y) grid, so per-file parquet min/max stats are narrow in
    * BOTH columns and a filter on EITHER prunes most files. The curve
    * key orders the write and is then dropped — pruning reads the
    * natural column stats, no derived column survives in the table.
    * Same range-exchange + per-partition-sort shape as
    * [[writeRangeSorted]]: full parallelism, no single-task sort.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, nParts: Int): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__z", zorderKey(col(xCol), col(yCol), bits))
      .repartitionByRange(nParts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
