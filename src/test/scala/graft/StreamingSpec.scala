package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming semantics: each operator is driven with the parquet
  * events as a one-batch stream into a memory sink and compared against
  * its batch equivalent.
  */
class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming tumbling windows match the batch aggregation") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    // complete mode: emit all windows regardless of watermark finality
    val got = runToMemory(StreamingOps.windowedCounts(stream), "win_counts", "complete")
    val want = graft.operators.EventQueries.tumbling(spark, sf0001)
      .select("win_start", "event_type", "n")
    assert(got.count() == want.count())
    assert(got.select("win_start", "event_type", "n").except(want).count() == 0)
  }

  test("streaming sliding windows place each event in exactly 3 windows") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    val got = runToMemory(StreamingOps.slidingCounts(stream), "slide_counts", "complete")
    val events = graft.Tables.events(spark, sf0001).count()
    assert(got.agg(sum("n")).head().getLong(0) == 3 * events)
    val want = graft.operators.EventQueries.sliding(spark, sf0001)
      .select("win_start", "event_type", "n")
    assert(got.select("win_start", "event_type", "n").except(want).count() == 0)
  }

  test("session gap boundary: exactly-gap merges, gap+1s splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Spark session_window extends while event <= session end, so a
    // gap of EXACTLY 30:00 still merges; only > 30:00 starts a new
    // session (the oracle's gaps-and-islands flag uses strict >).
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, at(0)),            // session A
      (1L, at(1800)),         // exactly 30:00 later -> still session A
      (1L, at(1800 + 1801))   // 30:01 later -> session B
    ).toDF("user_id", "ts")
    val sessions = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
    assert(sessions.count() == 2)
    assert(sessions.agg(max("count")).head().getLong(0) == 2)
  }

  test("streaming session windows produce the batch session count") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    val got = runToMemory(StreamingOps.sessionCounts(stream), "sess_counts", "complete")
    val want = graft.operators.EventQueries.sessionize(spark, sf0001)
    assert(got.count() == want.count())
  }

  test("dropDuplicatesWithinWatermark keeps one row per key in-batch") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    val got = runToMemory(StreamingOps.dedupWithinWatermark(stream), "dedup_events")
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(got.count() == keys)
    assert(got.select("user_id", "event_type").distinct().count() == keys)
  }

  test("flatMapGroupsWithState running totals cover every user with full counts") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    val got = runToMemory(
      StreamingOps.userRunningTotals(spark, stream).toDF(), "user_totals", "update")
    // one batch -> final state per user equals the batch aggregate
    val want = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("want_n"))
    assert(got.count() == want.count())
    val mismatched = got.join(want, Seq("user_id"))
      .filter(col("n_events") =!= col("want_n"))
    assert(mismatched.count() == 0)
  }

  test("stream-stream interval join matches the batch time-range join") {
    val stream = StreamingOps.eventStream(spark, sf0001)
    val got = runToMemory(StreamingOps.clickAttribution(stream), "attribution")
    val ev = graft.Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), col("ts").as("click_ts"))
    val want = p.join(c,
      col("user_id") === col("cu") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
    assert(got.count() == want.count())
    assert(got.count() > 0)
  }

  test("streaming source token budget caps each source and is first-fit in doc order") {
    val budget = 2000L
    val stream = StreamingOps.docStream(spark, sf0001)
    val got = runToMemory(
      StreamingOps.sourceTokenBudget(spark, stream, budget).toDF(), "budgeted", "update")
    // every doc appears exactly once with its true token count
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("want_tok"))
    assert(got.count() == docs.count())
    assert(got.join(docs, Seq("doc_id"))
      .filter(col("n_tok") =!= col("want_tok")).count() == 0)
    // kept tokens per source never exceed the budget
    val perSource = got.filter(col("kept"))
      .groupBy(col("source").as("src")).agg(sum(col("n_tok")).as("kept_tok"))
    assert(perSource.filter(col("kept_tok") > budget).count() == 0)
    assert(perSource.count() > 0)
    // replay determinism: the batch-side sequential first-fit gives the
    // same keep set
    val want = docs.orderBy("source", "doc_id").collect()
      .groupBy(_.getString(1)).toSeq.flatMap { case (_, rows) =>
        var used = 0L
        rows.sortBy(_.getLong(0)).map { r =>
          val fits = used + r.getLong(2) <= budget
          if (fits) used += r.getLong(2)
          (r.getLong(0), fits)
        }
      }.toMap
    val gotKept = got.select("doc_id", "kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(gotKept == want)
  }

  test("source token budget carries state across micro-batches") {
    // moved to the runtime subpackage in Spark 4
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // docs of 400 tokens each, one source, budget 1000: batch 1 admits
    // docs 1 and 2 (800 used); batch 2's docs must see used=800 and
    // admit nothing of size 400 except... none — kept=false for both
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
      .withColumn("source", lit("s0"))
      .withColumn("text", expr("array_join(array_repeat(text, 400), ' ')"))
    val out = graft.streaming.StreamingOps.sourceTokenBudget(spark, docs, 1000L)
    val q = out.toDF().writeStream.outputMode("update")
      .format("memory").queryName("budget2").start()
    mem.addData((1L, "w"), (2L, "w"))
    q.processAllAvailable()
    mem.addData((3L, "w"), (4L, "w"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("budget2")
      .select("doc_id", "kept", "used_after").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1).toSeq
    // batch 1: both fit (400, 800); batch 2: state 800 blocks both
    assert(rows == Seq((1L, true, 400L), (2L, true, 800L),
      (3L, false, 800L), (4L, false, 800L)))
  }

  test("foreachBatchUpsert merges micro-batches idempotently into the sink") {
    val tmp = java.nio.file.Files.createTempDirectory("upsert_sink").toString + "/t"
    val stream = StreamingOps.eventStream(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts"))
    val q = StreamingOps.foreachBatchUpsert(stream, Seq("user_id", "event_type"), tmp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp + "_ckpt")
      .start()
    q.awaitTermination(120000)
    val sink = spark.read.parquet(tmp)
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(sink.count() == keys)
  }

  test("foreachBatchUpsert: a batch replayed after a crash between target write and checkpoint commit converges") {
    // The exactly-once differential (r8 verdict item 6): foreachBatch
    // gives at-least-once delivery — if the process dies AFTER the
    // batch's target write but BEFORE the checkpoint commit marker is
    // written, the restarted query re-delivers the same batch. The
    // sink contract that makes this effectively-once is the LWW MERGE
    // by PK; a sink that appended (or merged non-idempotently) would
    // duplicate rows here. Simulated faithfully: run a two-batch
    // stream to completion, delete the LAST commit marker from the
    // checkpoint (the crash window), restart — Spark re-executes the
    // final batch from its recorded offsets against a target that
    // already merged it.
    val base = java.nio.file.Files.createTempDirectory("upsert_replay").toString
    val tmp = base + "/t"
    val ckpt = base + "/ckpt"
    def run(): Unit = {
      val stream = StreamingOps.eventStreamTwoBatch(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("ts"))
      val q = StreamingOps.foreachBatchUpsert(stream, Seq("user_id", "event_type"), tmp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000))
    }
    run()
    val committed = spark.read.parquet(tmp).count()
    val commits = new java.io.File(ckpt + "/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.length >= 2, "expected a two-batch run")
    val last = commits.maxBy(_.getName.toLong)
    assert(last.delete())
    // the local ChecksumFileSystem keeps a .N.crc sidecar; a stale one
    // makes the restarted query's atomic commit-rename collide (Spark
    // reports it as a concurrent-query conflict) — a real crash would
    // have lost both files together
    new java.io.File(last.getParentFile, "." + last.getName + ".crc").delete()
    run() // re-delivers the final batch
    val sink = spark.read.parquet(tmp)
    assert(sink.count() == committed,
      s"replayed batch changed the sink: ${sink.count()} vs $committed")
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(sink.count() == keys)
    assert(sink.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0, "replay duplicated PKs")
  }

  test("foreachBatchUpsert: injected crash after the sink swap, before the commit — replay leaves the target content-identical") {
    // The sink-side half of the restart story (r12 verdict item 6):
    // the checkpoint tests prove STATE continuity; this proves the
    // TARGET's idempotence under genuine at-least-once re-delivery.
    // Unlike the marker-delete test above (which doctors a completed
    // checkpoint), the failure here is INJECTED IN-FLIGHT: the hook
    // throws after batch 1's rename-swap completed but before Spark
    // records its commit — the exact crash window — so run 1 dies
    // with the target already holding batch 1's merge and the
    // checkpoint claiming it never ran. Run 2 must re-deliver batch 1
    // and the second LWW MERGE must be a semantic no-op: every row of
    // the re-merged target equals the pre-crash snapshot.
    val base = java.nio.file.Files.createTempDirectory("upsert_inject").toString
    val tmp = base + "/t"
    val ckpt = base + "/ckpt"
    def run(afterBatch: Long => Unit): Unit = {
      val stream = StreamingOps.eventStreamTwoBatch(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("ts"))
      val q = StreamingOps
        .foreachBatchUpsert(stream, Seq("user_id", "event_type"), tmp, afterBatch)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(120000)
    }
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(bid => if (bid >= 1)
        throw new RuntimeException("injected crash: sink written, commit not recorded"))
    }
    def causeChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(causeChain(thrown).exists(_.contains("injected crash")),
      causeChain(thrown).mkString(" | "))
    // the claimed window really holds: batch 1's target write landed,
    // its commit marker did not
    val snapshot = spark.read.parquet(tmp)
      .collect().map(_.toString).sorted.toSeq
    val commits = new java.io.File(ckpt + "/commits")
      .listFiles().filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
    assert(!commits.contains(1L),
      s"batch 1 was committed despite the injected crash: ${commits.toSeq}")
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(snapshot.size == keys, "pre-crash target missing batch 1's merge")
    run(_ => ()) // restart: Spark re-delivers batch 1 from its offsets
    val replayed = spark.read.parquet(tmp)
      .collect().map(_.toString).sorted.toSeq
    assert(replayed == snapshot,
      "re-delivered batch's second upsert changed the target content")
  }

  test("foreachBatchJdbcUpsert merges a stream into a JDBC target idempotently") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_stream").toString
    System.setProperty("derby.system.home", dbDir)
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val opts = Map(
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "createTableColumnTypes" -> "event_type VARCHAR(32)")
    def runOnce(ckpt: String): Unit = {
      val stream = StreamingOps.eventStream(spark, sf0001)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val q = StreamingOps
        .foreachBatchJdbcUpsert(stream, Seq("user_id", "event_type"), url, "ev_counts", opts)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000))
    }
    runOnce(dbDir + "/ckpt1")
    // replay from a fresh checkpoint: the MERGE overwrites by PK, so
    // the target converges instead of duplicating (effectively-once)
    runOnce(dbDir + "/ckpt2")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ev_counts")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(back.count() == keys)
  }

  test("JDBC upsert replay is idempotent under an injected in-flight crash") {
    // The parquet LWW target's crash-window test (above), applied to
    // the JDBC sink (r13 verdict item 6): the hook throws after batch
    // 1's MERGE committed on the database but before Spark records
    // the batch's commit marker, so run 1 dies with the table already
    // holding batch 1's merge and the checkpoint claiming it never
    // ran. Run 2 (same checkpoint) must re-deliver batch 1, and the
    // re-run staged MERGE must leave the table content-identical.
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby_crash").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val opts = Map(
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "createTableColumnTypes" -> "event_type VARCHAR(32)")
    val ckpt = dbDir + "/ckpt"
    def run(afterBatch: Long => Unit): Unit = {
      val stream = StreamingOps.eventStreamTwoBatch(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("ts"))
      val q = StreamingOps
        .foreachBatchJdbcUpsert(stream, Seq("user_id", "event_type"),
          url, "ev_crash", opts, afterBatch)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(120000)
    }
    def readBack(): Seq[String] = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ev_crash")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
      .collect().map(_.toString).sorted.toSeq
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(bid => if (bid >= 1)
        throw new RuntimeException("injected crash: MERGE committed, batch commit not recorded"))
    }
    def causeChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(causeChain(thrown).exists(_.contains("injected crash")),
      causeChain(thrown).mkString(" | "))
    // the claimed window really holds: batch 1's MERGE landed on the
    // database, its commit marker did not
    val snapshot = readBack()
    val commits = new java.io.File(ckpt + "/commits")
      .listFiles().filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
    assert(!commits.contains(1L),
      s"batch 1 was committed despite the injected crash: ${commits.toSeq}")
    val keys = graft.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(snapshot.size == keys, "pre-crash table missing batch 1's merge")
    run(_ => ()) // restart: Spark re-delivers batch 1 from its offsets
    assert(readBack() == snapshot,
      "re-delivered batch's second MERGE changed the table content")
  }

  test("streaming CMS cells equal the batch sketch and state stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.cmsCellsStream(docs)
      .writeStream.outputMode("complete").format("memory").queryName("cms").start()
    mem.addData((1L, "a b a"), (2L, "b c"))
    q.processAllAvailable()
    mem.addData((3L, "a a d"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cms").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // bounded: never more cells than d*w, regardless of token domain
    assert(got.size <= 256)
    // equals the batch sketch over everything ingested so far
    val batch = Seq((1L, "a b a"), (2L, "b c"), (3L, "a a d")).toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(explode(graft.functions.TextFunctions.cmsKeys(col("tok"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cell")).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == batch)
    // the sketch estimate for 'a' (4 occurrences) is >= truth
    val aCells = Seq((0L, "a")).toDF("i", "tok")
      .select(explode(graft.functions.TextFunctions.cmsKeys(col("tok"))).as("rb"))
      .select(col("rb.r"), col("rb.b")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(aCells.map(got).min >= 4L)
  }

  test("streaming exact dedup: first content wins within and across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val q = StreamingOps.dedupExactStream(spark, docs).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sdedup").start()
    // batch 1: "aa" twice (ids 2, 1 — smallest id is first), "bb" once
    mem.addData((2L, "aa", "s0"), (1L, "aa", "s0"), (3L, "bb", "s1"))
    q.processAllAvailable()
    // batch 2: "aa" again (state must remember), "cc" new
    mem.addData((4L, "aa", "s1"), (5L, "cc", "s0"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup").select("doc_id", "first_seen").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> true))
    // exactly one winner per distinct content
    val winners = spark.table("sdedup").filter(col("first_seen"))
      .groupBy("content_hash").count().filter(col("count") > 1)
    assert(winners.count() == 0)
  }

  test("streaming ingest gate: exact-dup state + quality, batch reason precedence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val q = StreamingOps.ingestGateStream(spark, docs).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sgate").start()
    val good = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct: quality 0.6
    val good2 = (31 to 60).map(i => s"w$i").mkString(" ")
    // batch 1: a keeper and a low-quality doc ("a a a a a": quality 0.06)
    mem.addData((1L, good, "s0"), (2L, "a a a a a", "s0"))
    q.processAllAvailable()
    // batch 2: an exact copy of the keeper (state must remember) and a
    // fresh keeper; the copy is exact_dup even though its quality is ok
    mem.addData((10L, good, "s1"), (11L, good2, "s1"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sgate")
      .select("doc_id", "keep", "reason").collect()
      .map(r => (r.getLong(0), (r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      1L -> (true, None), 2L -> (false, Some("low_quality")),
      10L -> (false, Some("exact_dup")), 11L -> (true, None)))
  }

  test("streaming ingest gate quality agrees with the batch quality score") {
    val stream = StreamingOps.docStream(spark, sf0001)
    val q = StreamingOps.ingestGateStream(spark, stream).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sgate_fix").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sgate_fix").select("doc_id", "quality_ok")
    val want = graft.operators.TextAnalysisQueries.qualityScore(spark, sf0001)
      .select(col("doc_id"), (col("quality") >= 0.5).as("want_ok"))
    val joined = got.join(want, Seq("doc_id"))
    assert(joined.count() == want.count())
    assert(joined.filter(col("quality_ok") =!= col("want_ok")).count() == 0)
    // and the first_seen winner set is exactly the batch exact-dedup set
    val kept = spark.table("sgate_fix").filter(col("first_seen")).select("doc_id")
    val dedup = graft.operators.DedupQueries.dedupExact(spark, sf0001).select("doc_id")
    assert(kept.except(dedup).count() == 0 && dedup.except(kept).count() == 0)
  }

  test("streaming ingest gate Bloom decontamination matches the batch probe, no false negatives") {
    import graft.functions.TextFunctions
    val bits = graft.operators.CurationQueries.bloomBits(spark, sf0001)
    val stream = StreamingOps.docStream(spark, sf0001)
    val q = StreamingOps.ingestGateStream(spark, stream, Some(bits)).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sgate_bloom").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sgate_bloom").select("doc_id", "contaminated")
    // the literal bitset must round-trip: streaming rows probe exactly
    // as a batch evaluation of the same expression over the same docs
    val want = graft.Tables.documents(spark, sf0001)
      .withColumn("__sh",
        array_distinct(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3)))
      .withColumn("__bits", typedLit(bits))
      .select(col("doc_id"),
        expr(graft.operators.CurationQueries.bloomProbeSql("__sh", "__bits")).as("want_c"))
    val j = got.join(want, Seq("doc_id"))
    assert(j.count() == want.count())
    assert(j.filter(col("contaminated") =!= col("want_c")).count() == 0)
    // one-sided error: a Bloom negative is a certain non-member, so
    // every EXACTLY-contaminated doc must be flagged at ingest
    val exact = graft.operators.CurationQueries.decontaminate(spark, sf0001)
      .filter(col("contaminated")).select("doc_id")
    assert(exact.except(got.filter(col("contaminated")).select("doc_id")).count() == 0)
  }

  test("streaming exact dedup agrees with the batch dedup on the fixture corpus") {
    val stream = StreamingOps.docStream(spark, sf0001)
    val q = StreamingOps.dedupExactStream(spark, stream).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sdedup_fix").start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup_fix").filter(col("first_seen"))
    // q_dedup_exact keeps min(doc_id) per text — identical winner set
    val want = graft.operators.DedupQueries.dedupExact(spark, sf0001)
      .select(col("doc_id"))
    assert(kept.count() == want.count())
    assert(kept.select("doc_id").except(want).count() == 0)
  }

  test("streaming near-dup flags a batch-2 near-dup of a batch-1 doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.dedupNearStream(spark, docs).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sneardup").start()
    // batch 1: doc 1, an in-batch exact copy (3), an unrelated doc (2),
    // and a shingle-less doc (4: two tokens -> no 3-shingle, no bands)
    mem.addData((1L, "a b c a b"), (3L, "a b c a b"),
      (2L, "p q r s t u"), (4L, "xy zz"))
    q.processAllAvailable()
    // batch 2: doc 10 is a ROTATION of doc 1 (identical 3-shingle SET,
    // so identical signature — state must remember batch 1's anchor),
    // doc 11 is fresh content
    mem.addData((10L, "b c a b c"), (11L, "fresh words only here never seen"))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sneardup")
      .select("doc_id", "band_id", "anchor_doc", "is_candidate")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val byDoc = hits.groupBy(_._1)
    // doc 1 anchors all 3 of its bands (smallest id in batch 1)
    assert(byDoc(1L).forall(h => h._3 == 1L && !h._4))
    // in-batch copy: every band of doc 3 hits doc 1's anchor
    assert(byDoc(3L).length == 3 && byDoc(3L).forall(h => h._3 == 1L && h._4))
    // CROSS-BATCH: doc 10's bands all anchor to batch-1's doc 1
    assert(byDoc(10L).length == 3 && byDoc(10L).forall(h => h._3 == 1L && h._4))
    // unrelated and fresh docs are their own anchors on every band
    assert(byDoc(2L).forall(h => h._3 == 2L && !h._4))
    assert(byDoc(11L).forall(h => h._3 == 11L && !h._4))
    // shingle-less doc emits nothing
    assert(!byDoc.contains(4L))
  }

  test("streaming near-dup candidates cover the batch pipeline's pairs on the fixture") {
    // Every verified near-dup pair the BATCH pipeline reports must be
    // proposed by the streaming band state too (same signatures, same
    // bands — streaming can only add unverified candidates, never
    // miss a true pair's bands... unless the pair shares no band, in
    // which case batch wouldn't have found it either).
    val stream = StreamingOps.docStream(spark, sf0001)
    val q = StreamingOps.dedupNearStream(spark, stream).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sneardup_fix").start()
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sneardup_fix")
    val batchPairs = graft.operators.DedupQueries.dedupMinhash(spark, sf0001)
      .select(col("doc_a"), col("doc_b"))
    // a batch pair (a,b) is covered if b (larger id) hit some anchor
    // in a's duplicate-class/cluster — conservatively: b has at least
    // one candidate band hit
    val flagged = hits.filter(col("is_candidate")).select(col("doc_id")).distinct()
    val uncovered = batchPairs.join(flagged,
      batchPairs("doc_b") === flagged("doc_id"), "left_anti")
    assert(uncovered.count() == 0,
      "batch near-dup pairs whose larger doc was never flagged by the stream")
  }

  test("streaming media near-dup flags a batch-2 copy of a batch-1 payload") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val media = mem.toDF().toDF("media_id", "payload")
    val q = StreamingOps.dedupMediaStream(spark, media).toDF()
      .writeStream.outputMode("update").format("memory").queryName("smediadup").start()
    val p1 = ("the quick brown fox jumps over the lazy dog" * 3).getBytes("UTF-8")
    val p2 = ("completely different binary content with other bytes" * 3).getBytes("UTF-8")
    // batch 1: payload 1, an in-batch exact copy (3), unrelated (2),
    // and a too-short payload (4: under the 8-byte gram width)
    mem.addData((1L, p1), (3L, p1), (2L, p2), (4L, Array[Byte](1, 2)))
    q.processAllAvailable()
    // batch 2: media 10 re-ingests payload 1 — cross-batch state
    mem.addData((10L, p1))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("smediadup")
      .select("doc_id", "band_id", "anchor_doc", "is_candidate")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val byId = hits.groupBy(_._1)
    // payload 1 anchors all 3 of its bands; the copies hit on every band
    assert(byId(1L).length == 3 && byId(1L).forall(h => h._3 == 1L && !h._4))
    assert(byId(3L).length == 3 && byId(3L).forall(h => h._3 == 1L && h._4))
    assert(byId(10L).length == 3 && byId(10L).forall(h => h._3 == 1L && h._4))
    // unrelated payload anchors itself; gram-less payload emits nothing
    assert(byId(2L).forall(h => h._3 == 2L && !h._4))
    assert(!byId.contains(4L))
  }

  test("streaming embedding near-dup flags a batch-2 copy of a batch-1 vector") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingOps.dedupEmbeddingStream(spark, vecs).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sembdup").start()
    val v1 = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val v2 = Seq.tabulate(64)(i => math.cos(3.0 * i + 1.0))
    // batch 1: vec 1, an in-batch exact copy (3), an unrelated vector (2)
    mem.addData((1L, v1), (3L, v1), (2L, v2))
    q.processAllAvailable()
    // batch 2: vec 10 re-ingests vec 1's embedding — state must
    // remember batch 1's anchors across micro-batches
    mem.addData((10L, v1))
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sembdup")
      .select("vec_id", "band_id", "anchor_vec", "is_candidate")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    val byVec = hits.groupBy(_._1)
    // vec 1 anchors all 6 of its bands (smallest id in batch 1)
    assert(byVec(1L).length == 6 && byVec(1L).forall(h => h._3 == 1L && !h._4))
    // in-batch copy: identical qv -> identical keys -> all 6 bands hit
    assert(byVec(3L).length == 6 && byVec(3L).forall(h => h._3 == 1L && h._4))
    // CROSS-BATCH: vec 10's bands all anchor to batch-1's vec 1
    assert(byVec(10L).length == 6 && byVec(10L).forall(h => h._3 == 1L && h._4))
    // the unrelated vector emits its 6 bands; anchor assertions on it
    // would be probabilistic (random vectors share a band at ~1/8 per
    // band — precision is the batch verify's job, not the LSH's)
    assert(byVec(2L).length == 6)
  }

  test("streaming embedding near-dup candidates cover the batch pipeline's pairs on the fixture") {
    // Every verified pair the BATCH dedupEmbedding reports must have
    // its larger vec flagged by the stream: identical embeddings carry
    // identical band keys, and a cross-class pair's shared band key
    // was anchored by some vec <= the pair's smaller side.
    val stream = StreamingOps.vecStream(spark, sf0001)
    val q = StreamingOps.dedupEmbeddingStream(spark, stream).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sembdup_fix").start()
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("sembdup_fix")
    val batchPairs = graft.operators.DedupQueries.dedupEmbedding(spark, sf0001)
      .select(col("vec_a"), col("vec_b"))
    val flagged = hits.filter(col("is_candidate")).select(col("vec_id")).distinct()
    val uncovered = batchPairs.join(flagged,
      batchPairs("vec_b") === flagged("vec_id"), "left_anti")
    assert(uncovered.count() == 0,
      "batch embedding near-dup pairs whose larger vec was never flagged by the stream")
  }

  // ===== multi-batch watermark semantics =====
  // The windowed aggregations under LATE data arriving in a LATER
  // micro-batch — exactly where state-store/watermark bugs hide and
  // where a single-batch test proves nothing. Shape of each test:
  // batch 1 carries the window's events plus a sentinel 2h ahead that
  // advances the watermark (1h delay) past the window's end, so the
  // window finalizes and emits (append mode); batch 2 delivers a late
  // event INSIDE the finalized window, which the watermark must drop.
  // Remove the withWatermark and these tests fail twice over: append
  // mode refuses to start a streaming aggregation without one, and in
  // any mode the late row would mutate the finalized window.

  private val T0 = 1704067200L // 2024-01-01 00:00:00 UTC

  /** (input handle, events frame): ts = T0 + minute-offset. */
  private def memEvents(): (
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double, Long)],
      org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double, Long)]
    val df = mem.toDF().toDF("m", "event_type", "value", "user_id")
      .withColumn("ts", expr(s"timestamp_seconds($T0 + m * 60)"))
    (mem, df)
  }

  private def tsAt(min: Long) = new java.sql.Timestamp((T0 + min * 60) * 1000L)

  test("tumbling windows drop late data arriving in a later micro-batch") {
    val (mem, events) = memEvents()
    val q = StreamingOps.windowedCounts(events).writeStream
      .outputMode("append").format("memory").queryName("late_tumbling").start()
    // two clicks in [00:00, 00:15) + the watermark sentinel at 02:00
    mem.addData((0L, "click", 1.0, 1L), (5L, "click", 1.0, 1L),
      (120L, "click", 1.0, 9L))
    q.processAllAvailable() // watermark -> 01:00; window finalized + emitted
    mem.addData((10L, "click", 1.0, 1L)) // late: inside the closed window
    q.processAllAvailable()
    q.stop()
    val win0 = spark.table("late_tumbling").filter(col("win_start") === tsAt(0))
    assert(win0.count() == 1) // emitted exactly once, never re-emitted
    assert(win0.head().getAs[Long]("n") == 2L) // late row did not land
  }

  test("sliding windows drop late data arriving in a later micro-batch") {
    val (mem, events) = memEvents()
    val q = StreamingOps.slidingCounts(events).writeStream
      .outputMode("append").format("memory").queryName("late_sliding").start()
    mem.addData((0L, "click", 1.0, 1L), (5L, "click", 1.0, 1L),
      (120L, "click", 1.0, 9L))
    q.processAllAvailable() // watermark 01:00 finalizes every window below
    mem.addData((10L, "click", 1.0, 1L)) // its 3 windows all end <= 00:40
    q.processAllAvailable()
    q.stop()
    val got = spark.table("late_sliding")
    // the [00:00, 00:30) window emitted once with both on-time events
    val w0 = got.filter(col("win_start") === tsAt(0))
    assert(w0.count() == 1 && w0.head().getAs[Long]("n") == 2L)
    // the late event's ONLY private window [00:10, 00:40) never appears
    assert(got.filter(col("win_start") === tsAt(10)).count() == 0)
  }

  test("session windows drop late data arriving in a later micro-batch") {
    val (mem, events) = memEvents()
    val q = StreamingOps.sessionCounts(events).writeStream
      .outputMode("append").format("memory").queryName("late_session").start()
    // user 1: events at 00:00 and 00:10 -> one session [00:00, 00:40)
    mem.addData((0L, "click", 1.0, 1L), (10L, "click", 1.0, 1L),
      (120L, "click", 1.0, 9L))
    q.processAllAvailable() // watermark 01:00 > 00:40 closes the session
    // late event at 00:20 would have EXTENDED the session to 00:50 —
    // the difference between dropping and merging is user-visible here
    mem.addData((20L, "click", 1.0, 1L))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("late_session").filter(col("user_id") === 1L)
    assert(u1.count() == 1)
    val row = u1.head()
    assert(row.getAs[java.sql.Timestamp]("sess_start") == tsAt(0))
    assert(row.getAs[java.sql.Timestamp]("sess_end") == tsAt(40))
    assert(row.getAs[Long]("n") == 2L)
  }

  /** (views handle, clicks handle, joined stream) for the
    * stream-stream interval join: tuples are (minute, user, id).
    */
  private def memJoinStreams(): (
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)],
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)],
      org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Long)]
    val cMem = MemoryStream[(Long, Long, Long)]
    val views = vMem.toDF().toDF("m", "u", "id")
      .withColumn("view_ts", expr(s"timestamp_seconds($T0 + m * 60)"))
      .select(col("u").as("user_id"), col("id").as("view_id"), col("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = cMem.toDF().toDF("m", "u", "id")
      .withColumn("click_ts", expr(s"timestamp_seconds($T0 + m * 60)"))
      .select(col("u").as("c_user"), col("id").as("click_id"), col("click_ts"))
      .withWatermark("click_ts", "1 hour")
    (vMem, cMem, StreamingOps.intervalJoinStream(views, clicks))
  }

  test("stream-stream interval join matches a click against a view buffered in an earlier micro-batch") {
    val (vMem, cMem, joined) = memJoinStreams()
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_cross").start()
    // batch 1: the view arrives ALONE — nothing to join yet
    vMem.addData((0L, 1L, 100L))
    q.processAllAvailable()
    assert(spark.table("ssjoin_cross").count() == 0)
    // batch 2: a click 10 minutes later — must find the BUFFERED view
    cMem.addData((10L, 1L, 500L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssjoin_cross")
    assert(got.count() == 1)
    val row = got.head()
    assert(row.getAs[Long]("view_id") == 100L &&
      row.getAs[Long]("click_id") == 500L &&
      row.getAs[java.sql.Timestamp]("click_ts") == tsAt(10))
  }

  test("stream-stream interval join evicts view state once the watermark passes the join range") {
    val (vMem, cMem, joined) = memJoinStreams()
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_evict").start()
    // batch 1: one view for user 1 at 00:00, plus far-future sentinels
    // on BOTH sides pushing both watermarks to ~07:20 — beyond
    // view_ts + 30 min + 1 h delay, so V1's buffered state is evicted
    vMem.addData((0L, 1L, 100L), (500L, 8L, 101L))
    cMem.addData((500L, 9L, 501L))
    q.processAllAvailable()
    // batch 2: a click INSIDE V1's 30-minute range but far behind the
    // committed watermark — the state is gone, no late match emits
    cMem.addData((20L, 1L, 502L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ssjoin_evict").count() == 0)
    // control: the SAME click one batch earlier would have matched —
    // pinned by the cross-batch test above; this asserts the eviction
    // is the watermark's doing, not a join-condition accident
  }

  test("two-batch file-source append windows match the final-watermark emission cut") {
    // the real cross-batch append path on the fixture: batch 1 = first
    // half by ingest id, batch 2 = second half; the sink must hold
    // exactly the windows the FINAL watermark (ms-floored global max
    // minus 1h) closed, each exactly once, with cross-batch state
    // merged — and withhold the open tail windows (the same cut the
    // q_stream_append DuckDB oracle states in SQL; no drop clause —
    // see the planted-straggler test below for when drops happen).
    val got = graft.streaming.StreamQueries.streamAppend(spark, sf0001)
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("ts"), col("event_type"), col("value"))
    val wmf = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L - 3600000L
    val aggAll = ev
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
    val want = aggAll.filter(unix_millis(col("win_end")) <= wmf)
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // the emission cut is real: open tail windows exist and were withheld
    assert(aggAll.count() > want.count())
    assert(got.count() == want.count())
  }

  test("two-batch file source drops a straggler only after its window was evicted by a committed watermark") {
    // Measured semantics this test pins (and the q_stream_append
    // oracle's no-drop clause relies on): a late row merges into
    // still-live window state whatever the current watermark; it is
    // dropped exactly when its window's state was already EVICTED by a
    // watermark committed in an earlier fully-drained trigger. File B
    // therefore arrives only AFTER batch 1 (and its no-data follow-up,
    // which evicts [00:00, 00:30) windows under watermark 02:00) fully
    // drained.
    import spark.implicits._
    def evDf(rows: Seq[(Long, String, Double)]) =
      rows.toDF("m", "event_type", "value")
        .withColumn("ts", expr(s"timestamp_seconds($T0 + m * 60)"))
        .select("ts", "event_type", "value")
    val batchA = evDf(Seq((0L, "click", 1.0), (5L, "click", 1.0), (180L, "click", 1.0)))
    val batchB = evDf(Seq((10L, "click", 1.0), (190L, "click", 1.0), (360L, "click", 1.0)))
    val staged = java.nio.file.Files.createTempDirectory("two_batch_syn")
    staged.toFile.deleteOnExit()
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = staged.resolve(name + "_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var src: java.nio.file.Path = null
      while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".parquet")) src = p }
      val dest = staged.resolve(name)
      java.nio.file.Files.move(src, dest)
      dest.toFile.setLastModified(mtime)
      dest.toFile.deleteOnExit()
    }
    val t0 = System.currentTimeMillis() - 600000L
    stage(batchA, "a.parquet", t0)
    val stream = spark.readStream.schema(batchA.schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val q = StreamingOps.windowedCounts(stream).writeStream
      .outputMode("append").format("memory").queryName("two_batch_drop").start()
    q.processAllAvailable() // batch A + no-data batch: wm -> 02:00 evicts [00:00,00:15)
    stage(batchB, "b.parquet", t0 + 60000L)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("two_batch_drop")
    // [00:00, 00:15): emitted once with batch-1's two rows — the
    // batch-2 straggler at 00:10 found its window evicted and was
    // DROPPED (n=3 would mean merged, a second row re-emission)
    val w0 = got.filter(col("win_start") === tsAt(0))
    assert(w0.count() == 1 && w0.head().getAs[Long]("n") == 2L)
    // [03:00, 03:15) was still LIVE (end 03:15 > wm 02:00) when
    // batch-2's 03:10 row arrived: cross-batch state merge, emitted
    // once with n=2 under the final watermark (05:00)
    val w180 = got.filter(col("win_start") === tsAt(180))
    assert(w180.count() == 1 && w180.head().getAs[Long]("n") == 2L)
    // the 06:00 sentinel's window stays open past the final watermark
    assert(got.filter(col("win_start") === tsAt(360)).count() == 0)
    assert(got.count() == 2) // exactly [00:00) and [03:00), once each
  }

  test("foreachBatchUpsert recovers merged state from the _prev aside after a mid-swap crash") {
    val base = java.nio.file.Files.createTempDirectory("upsert_crash").toString
    val tmp = base + "/t"
    val stream = StreamingOps.eventStream(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts"))
    def runOnce(ckpt: String): Unit = {
      val q = StreamingOps.foreachBatchUpsert(stream, Seq("user_id", "event_type"), tmp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000))
    }
    runOnce(base + "/ckpt1")
    val merged = spark.read.parquet(tmp).count()
    assert(merged > 0)
    // Simulate a crash between rename-aside and rename-into-place:
    // target gone, _prev holds the last good snapshot.
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(tmp + "_prev")))
    // Replay (fresh checkpoint = redelivery of the same batch). The old
    // delete+rename swap would have merged against empty here and
    // silently dropped all prior sink state.
    runOnce(base + "/ckpt2")
    assert(spark.read.parquet(tmp).count() == merged)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp + "_prev")))
  }

  test("streaming span dedup: cross-batch and intra-batch duplicated spans flagged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamingOps.dupSpansStream(spark, docs).toDF()
      .writeStream.outputMode("update").format("memory").queryName("sspans").start()
    // batch 1: two docs, all spans novel
    mem.addData((1L, "a b c d e f"), (2L, "x1 x2 x3 x4 x5"))
    q.processAllAvailable()
    // batch 2: doc 10 embeds the batch-1 span "a b c d e" at pos 2;
    // doc 11 repeats its own opening span at pos 6 (intra-batch)
    mem.addData(
      (10L, "z z a b c d e q q q"),
      (11L, "m1 m2 m3 m4 m5 k m1 m2 m3 m4 m5"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sspans").select("doc_id", "pos", "is_duplicate").collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getBoolean(2))).toMap
    // batch 1 all novel
    assert(Seq((1L, 0), (1L, 1), (2L, 0)).forall(k => !got(k)))
    // exactly the two duplicated positions flag
    assert(got((10L, 2)) && got((11L, 6)))
    assert(got.count(_._2) == 2)
    // doc 10 produced all 6 span positions
    assert((0 to 5).forall(p => got.contains((10L, p))))
  }

  test("stream-stream join buffer survives a query restart from checkpoint") {
    // the join-state half of the fault-tolerance contract: a view
    // buffered (unmatched) when the query is killed must still match
    // a click arriving AFTER the restart — i.e. the symmetric-hash
    // join buffers live in the state store, not in process memory.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vMem = MemoryStream[(Long, Long, Long)]
    val cMem = MemoryStream[(Long, Long, Long)]
    val views = vMem.toDF().toDF("m", "u", "id")
      .withColumn("view_ts", expr(s"timestamp_seconds($T0 + m * 60)"))
      .select(col("u").as("user_id"), col("id").as("view_id"), col("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = cMem.toDF().toDF("m", "u", "id")
      .withColumn("click_ts", expr(s"timestamp_seconds($T0 + m * 60)"))
      .select(col("u").as("c_user"), col("id").as("click_id"), col("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin_ckpt")
    ckpt.toFile.deleteOnExit()
    val outDir = java.nio.file.Files.createTempDirectory("ssjoin_out")
    outDir.toFile.deleteOnExit()
    def start() = StreamingOps.intervalJoinStream(views, clicks)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(outDir.toString)
      }
      .start()
    val q1 = start()
    vMem.addData((0L, 1L, 100L)) // the view arrives alone, gets buffered
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    cMem.addData((10L, 1L, 500L)) // click arrives only after the restart
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir.toString)
    assert(got.count() == 1)
    val row = got.head()
    assert(row.getAs[Long]("view_id") == 100L && row.getAs[Long]("click_id") == 500L)
  }

  test("streaming exact dedup state survives a query restart from checkpoint") {
    // the fault-tolerance contract a 100 TB ingest relies on: kill the
    // query between micro-batches, restart from the SAME checkpoint,
    // and the keyed dedup state must be restored from the state store
    // — a duplicate arriving after the restart is still flagged.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "text", "source")
    val ckpt = java.nio.file.Files.createTempDirectory("dedup_ckpt")
    ckpt.toFile.deleteOnExit()
    val outDir = java.nio.file.Files.createTempDirectory("dedup_out")
    outDir.toFile.deleteOnExit()
    // memory sink refuses checkpoint recovery; foreachBatch (the
    // production sink shape — see foreachBatchUpsert) supports it
    def start() = StreamingOps.dedupExactStream(spark, docs).toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(outDir.toString)
      }
      .start()
    val q1 = start()
    mem.addData((1L, "aa", "s0"), (2L, "bb", "s0"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    mem.addData((3L, "aa", "s1"), (4L, "cc", "s1"))
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(outDir.toString)
      .select("doc_id", "first_seen").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    // "aa" was first seen BEFORE the restart: the restored state flags
    // doc 3 as a duplicate; "cc" is genuinely new
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  // ---- drain-harness robustness (r10 ADVICE items 1-3) ----

  /** Temp views whose name starts with the given drain prefix. */
  private def sinkViews(prefix: String): Seq[String] =
    spark.catalog.listTables().collect().toSeq
      .map(_.name).filter(_.startsWith(prefix))

  /** Checkpoint dirs for the given drain prefix under any
    * graft-drain-ckpt* root on /dev/shm.
    */
  private def ckptDirs(prefix: String): Seq[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (!java.nio.file.Files.isDirectory(shm)) return Nil
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(shm).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft-drain-ckpt"))
      .flatMap { root =>
        try java.nio.file.Files.list(root).iterator().asScala
          .filter(_.getFileName.toString.startsWith(prefix))
        catch { case _: Throwable => Iterator.empty }
      }.toSeq
  }

  test("failed drain leaks nothing: view dropped, checkpoint deleted, providers unloaded") {
    import org.apache.spark.sql.execution.streaming.state.GraftStateStoreReset
    // a stateful streaming pipeline whose FIRST micro-batch throws
    // mid-execution (after the query started and registered its
    // memory-sink view and checkpoint): raise_error on every row
    val failing = StreamingOps.docStream(spark, sf0001)
      .select(raise_error(concat(lit("injected drain failure "), col("doc_id"))).as("boom"))
      .groupBy(col("boom")).count()
    val prefix = "q_spec_faildrain"
    val e = intercept[Throwable] {
      graft.streaming.StreamQueries.drain(failing, prefix, mode = "complete")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("injected drain failure")),
      s"drain failure not propagated: $e")
    assert(sinkViews(prefix).isEmpty,
      s"memory-sink temp view leaked: ${sinkViews(prefix)}")
    assert(ckptDirs(prefix).isEmpty,
      s"tmpfs checkpoint leaked: ${ckptDirs(prefix)}")
    assert(GraftStateStoreReset.loadedProviderCount === 0,
      "state-store providers left loaded after a failed drain")
    // the sequential-drain slot must be released for the next drain
    assert(graft.streaming.StreamQueries.activeDrain.get() === null)
  }

  test("concurrent drain is refused loudly (unloadAll is SparkContext-global)") {
    val taken = graft.streaming.StreamQueries.activeDrain
      .compareAndSet(null, "q_spec_other_drain")
    assert(taken, "drain slot unexpectedly occupied at test start")
    try {
      val df = StreamingOps.docStream(spark, sf0001).select(col("doc_id"))
      val e = intercept[IllegalStateException] {
        graft.streaming.StreamQueries.drain(df, "q_spec_concurrent", mode = "append")
      }
      assert(e.getMessage.contains("q_spec_other_drain"))
    } finally graft.streaming.StreamQueries.activeDrain.set(null)
  }

  test("width-32 drain smoke: the certification-scale partition count stays green") {
    // the adaptive drain width only exceeds 8 beyond the gate scales,
    // so the sf0.001 suite would never exercise a 32-partition drain
    // (32 state stores per micro-batch) without this forced run
    sys.props("graft.drain.parts") = "32"
    try {
      val got = graft.streaming.StreamQueries.streamTotals(spark, sf0001)
      val want = Tables.events(spark, sf0001).select("user_id").distinct().count()
      assert(got.count() === want)
    } finally sys.props.remove("graft.drain.parts")
  }

  test("cdc state survives a checkpoint restart: exactly-once continuity across queries") {
    // The reference's crash-resume guarantee (README.md:36, T1-T3)
    // for the STREAMING twin: drain half the log, STOP the query,
    // start a brand-new query on the same checkpoint, drain the rest
    // — the restored keyed state must decide run-2 emissions exactly
    // as a never-stopped query would. Each run-2 event is chosen so
    // the outcome is observable only if state crossed the restart:
    //   u1 gets an OLDER version  -> must lose LWW to restored state
    //   u2 gets a PRE-tombstone   -> restored tombstone still wins
    //   u3 gets a NEWER version   -> overrides restored state
    // Without restored state, u1 would emit the stale click and u2
    // would resurface.
    // The memory sink refuses checkpoint recovery (not fault-tolerant),
    // so emissions land via foreachBatch — the fault-tolerant sink the
    // production path (foreachBatchUpsert) uses, which is exactly the
    // restart contract under test.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val log = mem.toDF().toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt")
    def drainInto(src: org.apache.spark.sql.DataFrame, ckptDir: Option[String],
        sink: scala.collection.mutable.Set[(Long, String, Double)])(
        feed: => Unit): Unit = {
      val w = StreamingOps.cdcCurrentState(spark, src).toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.select("user_id", "last_op", "last_value")
            .as[(Long, String, Double)].collect()
          sink.synchronized { sink ++= rows }
          ()
        }
      val q = ckptDir.fold(w)(d => w.option("checkpointLocation", d)).start()
      try { feed; q.processAllAvailable() } finally q.stop()
    }
    try {
      val run1 = scala.collection.mutable.Set[(Long, String, Double)]()
      drainInto(log, Some(ckpt.toString), run1) {
        mem.addData((1L, 1000L, 1L, "purchase", 5.0),
          (2L, 1000L, 2L, "error", 0.0), (3L, 1000L, 3L, "view", 1.0))
      }
      assert(run1.toSet === Set((1L, "purchase", 5.0), (3L, "view", 1.0)))

      // brand-new query on the SAME checkpoint: state must be restored
      val run2 = scala.collection.mutable.Set[(Long, String, Double)]()
      drainInto(log, Some(ckpt.toString), run2) {
        mem.addData((4L, 500L, 1L, "click", 9.9),
          (5L, 500L, 2L, "view", 2.0), (6L, 2000L, 3L, "click", 7.0))
      }

      // one-shot reference: the same six events in a single drain
      val memAll = MemoryStream[(Long, Long, Long, String, Double)]
      val logAll = memAll.toDF().toDF("event_id", "sec", "user_id", "event_type", "value")
        .withColumn("ts", expr("timestamp_seconds(sec)"))
      val oneShot = scala.collection.mutable.Set[(Long, String, Double)]()
      drainInto(logAll, None, oneShot) {
        memAll.addData((1L, 1000L, 1L, "purchase", 5.0),
          (2L, 1000L, 2L, "error", 0.0), (3L, 1000L, 3L, "view", 1.0),
          (4L, 500L, 1L, "click", 9.9), (5L, 500L, 2L, "view", 2.0),
          (6L, 2000L, 3L, "click", 7.0))
      }

      // every key was touched in run 2, so run 2's emissions ARE the
      // final state table; it must equal the one-shot drain exactly
      assert(run2.toSet === oneShot.toSet)
      assert(run2.toSet === Set((1L, "purchase", 5.0), (3L, "click", 7.0)))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
  }

  test("windowed aggregation state AND watermark survive a checkpoint restart") {
    // Companion to the CDC restart test for the OTHER state class:
    // window aggregation buffers plus the committed watermark. Run 1
    // drains events at sec 5, 8, 25 under a 10 s watermark delay
    // (watermark after the batch = 25 - 10 = 15, which CLOSES window
    // [0,10) — aggregation lateness drops a row when its window END
    // <= watermark, not when the event time is merely below it). A
    // brand-new query on the same checkpoint then receives sec 3 and
    // 8 (window [0,10), end 10 <= restored watermark 15: must be
    // DROPPED with no emission — a fresh query without the checkpoint
    // would emit (0,2)), sec 12 (open window [10,20): accepted), and
    // sec 27 (must ADD to the RESTORED [20,30) buffer -> count 2,
    // not 1). The run-2 emissions must equal batch 2 of a
    // never-stopped two-batch drain.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wm-restart-ckpt")
    def windowed(src: org.apache.spark.sql.DataFrame) = src
      .withColumn("ts", expr("timestamp_seconds(sec)"))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds")).count()
      .select(expr("unix_timestamp(window.start)").as("w0"), col("count"))
    def drainInto(src: org.apache.spark.sql.DataFrame, ckptDir: Option[String],
        sink: scala.collection.mutable.Set[(Long, Long)])(feed: => Unit): Unit = {
      val w = windowed(src).writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.as[(Long, Long)].collect()
          sink.synchronized { sink ++= rows }
          ()
        }
      val q = ckptDir.fold(w)(d => w.option("checkpointLocation", d)).start()
      try { feed; q.processAllAvailable() } finally q.stop()
    }
    try {
      val mem = MemoryStream[Long]
      val src = mem.toDF().toDF("sec")
      val run1 = scala.collection.mutable.Set[(Long, Long)]()
      drainInto(src, Some(ckpt.toString), run1) { mem.addData(5L, 8L, 25L) }
      assert(run1.toSet === Set((0L, 2L), (20L, 1L)))

      val run2 = scala.collection.mutable.Set[(Long, Long)]()
      drainInto(src, Some(ckpt.toString), run2) { mem.addData(3L, 8L, 12L, 27L) }
      // sec 3/8 died against the RESTORED watermark (their window is
      // closed); sec 12 opened [10,20); sec 27 joined the RESTORED
      // [20,30) buffer
      assert(run2.toSet === Set((10L, 1L), (20L, 2L)))

      // never-stopped reference: same two batches, one query
      val memAll = MemoryStream[Long]
      val srcAll = memAll.toDF().toDF("sec")
      val buf = scala.collection.mutable.Set[(Long, Long)]()
      val w = windowed(srcAll).writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.as[(Long, Long)].collect()
          buf.synchronized { buf ++= rows }
          ()
        }.start()
      try {
        memAll.addData(5L, 8L, 25L); w.processAllAvailable()
        buf.synchronized(buf.clear()) // keep only batch-2 emissions
        memAll.addData(3L, 8L, 12L, 27L); w.processAllAvailable()
      } finally w.stop()
      assert(run2.toSet === buf.toSet,
        "restarted query's emissions differ from the never-stopped drain")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
  }

  test("cdc at ingest: cross-batch override, tombstone suppression, re-admit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val log = mem.toDF().toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val q = StreamingOps.cdcCurrentState(spark, log).toDF()
      .writeStream.outputMode("update").format("memory").queryName("scdc").start()
    try {
      // batch 1: u10 view, u20 purchase
      mem.addData((1L, 1000L, 10L, "view", 1.0), (2L, 1000L, 20L, "purchase", 5.0))
      q.processAllAvailable()
      val b1 = spark.table("scdc").select("user_id", "last_op").as[(Long, String)]
        .collect().toSet
      assert(b1 === Set((10L, "view"), (20L, "purchase")))
      // batch 2: u10 tombstoned (emits nothing), u20 overridden by a
      // LATER version, plus an out-of-order EARLIER u20 version that
      // must lose to the state
      mem.addData((3L, 2000L, 10L, "error", 0.0),
        (4L, 2000L, 20L, "click", 7.0), (5L, 500L, 20L, "view", 9.9))
      q.processAllAvailable()
      val b2 = spark.table("scdc").select("user_id", "last_op", "last_value")
        .as[(Long, String, Double)].collect()
      // update-mode memory sink accumulates; the LAST emission per key
      // is the state. u10 emitted nothing in batch 2.
      assert(b2.count(_._1 == 10L) === 1) // only the batch-1 emission
      assert(b2.filter(_._1 == 20L).map(r => (r._2, r._3)).toSet
        .contains(("click", 7.0)))
      // batch 3: a genuine u10 update AFTER the tombstone re-admits it
      mem.addData((6L, 3000L, 10L, "signup", 4.0))
      q.processAllAvailable()
      val b3 = spark.table("scdc").filter(col("user_id") === 10L)
        .select("last_op", "last_value").as[(String, Double)].collect().toSet
      assert(b3.contains(("signup", 4.0)))
    } finally q.stop()
  }

  test("drained output is state-store-provider invariant (RocksDB vs default)") {
    // The corpus-scale state dial (graft.state.provider=rocksdb,
    // StreamQueries.drainSession): once dedup/span state outgrows
    // executor heaps, production flips the drain sessions to Spark's
    // off-heap RocksDB provider. This certifies the flip is a pure
    // deployment decision — the drained rows are byte-identical for
    // all four state classes (flatMapGroupsWithState span state,
    // windowed-aggregation buffers + watermark, stream-stream join
    // state, and dropDuplicatesWithinWatermark keys) — and doubles as
    // the proof that the RocksDB provider actually loads in this
    // environment (rocksdbjni native extraction included).
    def drainWith(provider: Option[String], q: String): Seq[String] = {
      provider.foreach(sys.props("graft.state.provider") = _)
      try graft.streaming.StreamQueries.queries(q)(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq
      finally sys.props.remove("graft.state.provider")
    }
    Seq("q_stream_dup_spans", "q_stream_tumbling",
        "q_stream_join", "q_stream_dedup_wm").foreach { q =>
      val default = drainWith(None, q)
      val rocks = drainWith(Some("rocksdb"), q)
      assert(default.nonEmpty, s"$q drained empty")
      assert(rocks == default,
        s"$q: RocksDB-provider drain differs from the default provider's")
    }
  }

  test("state-provider auto-dial picks in-heap for small state, RocksDB past the heap bound") {
    import graft.streaming.StreamQueries
    // the decision boundary itself (estimated state vs maxHeap/4)
    assert(StreamQueries.chooseProvider(1L << 20, 8L << 30) == "default")
    assert(StreamQueries.chooseProvider(2L << 30, 8L << 30) == "default") // exactly at the bound stays in-heap
    assert(StreamQueries.chooseProvider((2L << 30) + 1, 8L << 30) == "rocksdb")

    // wired end-to-end: auto + a forced corpus-size estimate decides
    // which provider the drain session is built with
    def providerOf(tableBytes: Long): Option[String] = {
      sys.props("graft.state.provider") = "auto"
      sys.props("graft.stream.bytes") = tableBytes.toString
      try StreamQueries.drainSession(spark, sf0001)
        .conf.getOption("spark.sql.streaming.stateStore.providerClass")
      finally {
        sys.props.remove("graft.state.provider")
        sys.props.remove("graft.stream.bytes")
      }
    }
    val heap = Runtime.getRuntime.maxMemory()
    // getOption surfaces the conf DEFAULT (HDFSBacked) when unset —
    // content, not presence, is the signal
    assert(providerOf(1024).exists(_.contains("HDFSBackedStateStoreProvider")),
      "tiny corpus must keep the in-heap default provider")
    val big = heap / 4 / 16 + (1L << 20) // 16x expansion puts est past heap/4
    assert(providerOf(big).exists(_.contains("RocksDBStateStoreProvider")),
      "heap-crowding corpus must dial to RocksDB")

    // and a drain under the auto->rocksdb decision stays hash-identical
    def drainAuto(tableBytes: Long, q: String): Seq[String] = {
      sys.props("graft.state.provider") = "auto"
      sys.props("graft.stream.bytes") = tableBytes.toString
      try graft.streaming.StreamQueries.queries(q)(spark, sf0001)
        .collect().map(_.toString).sorted.toSeq
      finally {
        sys.props.remove("graft.state.provider")
        sys.props.remove("graft.stream.bytes")
      }
    }
    val baseline = graft.streaming.StreamQueries.queries("q_stream_dedup_wm")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(drainAuto(big, "q_stream_dedup_wm") == baseline,
      "auto->rocksdb drain differs from the default drain")
  }
}
