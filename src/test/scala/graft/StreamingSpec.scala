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
}
