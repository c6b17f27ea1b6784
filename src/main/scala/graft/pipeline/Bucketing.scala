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
}
