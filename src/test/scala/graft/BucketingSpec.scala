package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bucketing

class BucketingSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed-by-key tables sort-merge join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketing").toString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "n_chars")
    val scores = docs.select(col("doc_id"), (col("n_chars") % 7).as("score"))
    Bucketing.writeBucketed(docs, "b_docs", s"$dir/docs", "doc_id", 8)
    Bucketing.writeBucketed(scores, "b_scores", s"$dir/scores", "doc_id", 8)
    try {
      // forbid broadcast so the join must be a sort-merge join — the
      // shape a corpus-x-corpus-derivative join takes at scale — and
      // disable AQE so the assertable plan is the static one
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = Bucketing.bucketedJoin(spark, "b_docs", "b_scores", "doc_id")
        val exchanges = j.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exchanges.isEmpty,
          s"bucketed join planned a shuffle:\n${j.queryExecution.executedPlan}")
        // and it is really the merge join, not some degenerate plan
        assert(j.queryExecution.executedPlan.toString.contains("SortMergeJoin"))

        // result equality with the plain shuffled join
        val plain = docs.join(scores, Seq("doc_id"))
        assert(j.count() == plain.count())
        assert(j.except(plain).isEmpty && plain.except(j).isEmpty)

        // negative control: the same join WITHOUT bucket metadata
        // must shuffle — proving the assertion above is not vacuous
        val shuffled = docs.join(scores, Seq("doc_id"))
        val plainExchanges = shuffled.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(plainExchanges.nonEmpty)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  test("range-sorted write: disjoint ascending key ranges across files, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rangesort").toString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    Bucketing.writeRangeSorted(docs, s"$dir/sorted", "n_chars", 4)
    // per-file min/max from the data itself (footer-equivalent check)
    val files = new java.io.File(s"$dir/sorted").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("n_chars")), max(col("n_chars"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // each file internally consistent and strictly after its predecessor
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"overlapping key ranges between consecutive files: $hi > $lo")
      case _ =>
    }
    // nothing lost or duplicated by the re-layout
    assert(spark.read.parquet(s"$dir/sorted").count() == docs.count())
  }

  test("bucket-pruned point lookup reads a single bucket") {
    // filter on the bucket key prunes to 1-of-n buckets at scan time —
    // the keyed point-lookup shape (SURVEY S2) on a bucketed corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketing2").toString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    Bucketing.writeBucketed(docs, "b_lookup", s"$dir/lookup", "doc_id", 8)
    try {
      // without an interesting downstream partitioning Spark's
      // DisableUnnecessaryBucketedScan turns the bucketed scan off and
      // with it the pruning — force it on, as a point-lookup path would
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val q = spark.table("b_lookup").filter(col("doc_id") === 7L)
        val scans = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.nonEmpty)
        // selected bucket count is printed in the scan's metadata
        assert(scans.head.metadata.get("SelectedBucketsCount").exists(_.startsWith("1 ")),
          s"expected a 1-bucket scan, got: ${scans.head.metadata.get("SelectedBucketsCount")}")
        assert(q.count() == 1)
      }
    } finally spark.sql("DROP TABLE IF EXISTS b_lookup")
  }
}
