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

  /** Compact a directory of many small files into few bounded ones —
    * the maintenance pass every long-running ingest needs (streaming
    * sinks and fine-grained upserts accrete small files; at 100 TB,
    * millions of tiny files turn scan planning and the namenode into
    * the bottleneck before any byte is read). Rows-per-file is bounded
    * above by `maxRecordsPerFile` (enforced by the writer even if a
    * partition holds more) and below by the partition count, sized
    * here from the actual row count so the rewrite neither
    * under-parallelizes nor re-fragments. Returns (filesBefore,
    * filesAfter).
    */
  def compact(spark: SparkSession, path: String, maxRecordsPerFile: Long): (Int, Int) = {
    def parts(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.startsWith("part-"))
    val before = parts(path).length
    val df = spark.read.parquet(path)
    val n = df.count()
    // 90% fill target: round-robin repartition is not exact, so a
    // partition sized exactly to the cap would spill a handful of rows
    // into a second file per partition and re-fragment the output
    val nParts = math.max(1, math.ceil(n.toDouble / (0.9 * maxRecordsPerFile)).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartition(nParts)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(tmp)
    // swap via rename; the _prev aside makes the swap crash-recoverable
    // (same pattern as foreachBatchUpsert's sink swap)
    val dir = new java.io.File(path)
    val prev = new java.io.File(path.stripSuffix("/") + "__prev")
    if (prev.exists()) { prev.listFiles().foreach(_.delete()); prev.delete() }
    dir.renameTo(prev)
    new java.io.File(tmp).renameTo(dir)
    prev.listFiles().foreach(_.delete()); prev.delete()
    (before, parts(path).length)
  }

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
