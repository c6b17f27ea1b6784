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

  test("z-ordered write: per-file min/max narrow in BOTH dimensions") {
    // 64x64 grid; z-layout should cut it into near-square blocks so a
    // filter on EITHER dimension overlaps few files, while a
    // single-key range sort prunes only its own key
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Bucketing.writeZOrdered(grid, s"$dir/z", "x", "y", 6, 16)
    Bucketing.writeRangeSorted(grid, s"$dir/xsorted", "x", 16)

    def fileRanges(path: String, dim: String): Array[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
        .map { f =>
          val r = spark.read.parquet(f).agg(min(col(dim)), max(col(dim))).collect().head
          (r.getLong(0), r.getLong(1))
        }

    def overlapping(ranges: Array[(Long, Long)], lo: Long, hi: Long): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zY = fileRanges(s"$dir/z", "y")
    val zX = fileRanges(s"$dir/z", "x")
    val xsY = fileRanges(s"$dir/xsorted", "y")
    assert(zY.length > 4)
    // an eighth-of-domain window on either dimension prunes most z files
    assert(overlapping(zY, 0, 7) <= zY.length * 2 / 5,
      s"y-window should prune z-layout files: ${overlapping(zY, 0, 7)}/${zY.length}")
    assert(overlapping(zX, 0, 7) <= zX.length * 2 / 5,
      s"x-window should prune z-layout files: ${overlapping(zX, 0, 7)}/${zX.length}")
    // the x-sorted layout cannot prune on y: every file spans all of y
    assert(overlapping(xsY, 0, 7) == xsY.length)
    // nothing lost by the re-layout
    assert(spark.read.parquet(s"$dir/z").count() == 4096)
  }

  test("zorderKey interleave matches a reference bit-by-bit model") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    import spark.implicits._
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Bucketing.zorderKey(col("x"), col("y"), 16).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y)) }
  }

  test("compact: many small files become few bounded ones, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val path = s"$dir/frag"
    val docs = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    val n = docs.count()
    // fragment deliberately: one file per row-ish
    docs.repartition(32).write.parquet(path)
    val (before, after) = Bucketing.compact(spark, path, maxRecordsPerFile = 20)
    assert(before == 32)
    // bounded by the 90%-fill partition count plus at most one split
    assert(after <= math.ceil(n / (0.9 * 20)).toInt + 1 && after < before)
    // no file exceeds the record bound; nothing lost or duplicated
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath)
    files.foreach { f =>
      assert(spark.read.parquet(f).count() <= 20)
    }
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    assert(back.select("doc_id").except(docs.select("doc_id")).count() == 0)
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
