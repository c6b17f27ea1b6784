package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked entries for the streaming at-ingest operators
  * (SURVEY §2.10): each runs the REAL Structured Streaming pipeline —
  * file source, keyed state, memory sink — to completion on the
  * fixture treated as a one-batch stream, and returns the sink table
  * as a DataFrame for the driver's DuckDB hash compare.
  *
  * Until round 6 the streaming dedup matrix was unit-tested only
  * (streaming has no DuckDB twin); these entries close that gap for
  * the batch-equivalent ops. Batch equivalence holds because the
  * streaming definitions share the batch expression trees
  * (DedupQueries.spanPositions, the md5-content key), and a single
  * micro-batch exercises the same keyed-state code path later batches
  * use (StreamingSpec covers multi-batch/cross-batch arrivals where
  * the SQL oracle can't follow).
  *
  * Scale: the streamed ops themselves are keyed-state pipelines
  * (bounded state per distinct content/span — see StreamingOps); the
  * memory sink is harness-only plumbing, the production sink is
  * foreachBatchUpsert/parquet.
  */
object StreamQueries extends graft.QueryModule {

  // Unique sink names per run: memory sink tables are session-global,
  // and Verify may retry a query (a stale table from a failed first
  // attempt must not shadow the retry's results).
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Run a streaming Dataset to completion into a memory sink and
    * return the accumulated table. Update mode for the keyed-state ops
    * (they emit per-row dispositions); complete mode for windowed
    * aggregations (emit every window's final state).
    */
  private def drain(spark: SparkSession, df: DataFrame, prefix: String,
      mode: String = "update"): DataFrame = {
    val name = s"${prefix}_${sinkSeq.incrementAndGet()}"
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming exact dedup, drained: every doc with its content hash
    * and the first-seen disposition the ingest gate assigned.
    */
  def streamDedupExact(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      StreamingOps.dedupExactStream(spark, StreamingOps.docStream(spark, dir)).toDF(),
      "q_stream_dedup_exact")

  /** Streaming span dedup, drained: every (doc, span position) with
    * its duplicated-span flag.
    */
  def streamDupSpans(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      StreamingOps.dupSpansStream(spark, StreamingOps.docStream(spark, dir)).toDF(),
      "q_stream_dup_spans")

  /** Streaming tumbling windows, drained in complete mode: with the
    * whole fixture in one micro-batch nothing is late, so the final
    * state equals the batch aggregation bit-for-bit (both sum through
    * DECIMAL(18,2)) and the query shares the batch tumbling oracle.
    * The late-data path — where streaming and batch legitimately
    * diverge — is covered by StreamingSpec's multi-batch drop tests
    * and bounded by q_late_events' batch accounting.
    */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      StreamingOps.windowedCounts(StreamingOps.eventStream(spark, dir)),
      "q_stream_tumbling", mode = "complete")

  /** Streaming sliding windows, drained complete — see
    * [[streamTumbling]] for why one micro-batch makes this equal the
    * batch aggregation.
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      StreamingOps.slidingCounts(StreamingOps.eventStream(spark, dir)),
      "q_stream_sliding", mode = "complete")

  /** Streaming session windows, drained complete — the stateful
    * session-merge path end-to-end (per-user gap sessions built by
    * the streaming session_window operator, not the batch sort).
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    drain(spark,
      StreamingOps.sessionCounts(StreamingOps.eventStream(spark, dir)),
      "q_stream_session", mode = "complete")

  /** Stream-static enrichment join — the canonical "arriving facts
    * pick up reference data" shape: each streaming event joins
    * (broadcast, stateless) to a BATCH-computed per-type profile and
    * is flagged when its value exceeds twice the type's historical
    * mean. The static side is an exact-decimal aggregate of the same
    * table, so the oracle recomputes it identically; the join itself
    * is append-capable (no state, no watermark) — at scale the static
    * side is a broadcast dim refreshed per trigger.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val stats = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg((sum(col("value").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("mean_value"))
    val enriched = StreamingOps.eventStream(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"), col("mean_value"),
        (col("value") > col("mean_value") * lit(2.0)).as("is_anomaly"))
    drain(spark, enriched, "q_stream_enrich", mode = "append")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_dedup_exact" -> streamDedupExact,
    "q_stream_dup_spans" -> streamDupSpans,
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding" -> streamSliding,
    "q_stream_session" -> streamSession,
    "q_stream_enrich" -> streamEnrich
  )

  // The oracles restate the streaming semantics in batch SQL: within
  // one micro-batch the keyed state orders arrivals by (doc_id) /
  // (doc_id, pos), so "first wins" is a plain ROW_NUMBER.
  def oracles: Map[String, String] = Map(
    "q_stream_dedup_exact" ->
      """SELECT md5(text) AS content_hash, doc_id, source,
        |       (ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
        |         AS first_seen
        |FROM documents""".stripMargin,
    // the batch oracles, verbatim — shared by reference so the batch
    // and streaming contracts can never drift apart
    "q_stream_tumbling" ->
      graft.operators.EventQueries.oracles("q_tumbling_window"),
    "q_stream_sliding" ->
      graft.operators.EventQueries.oracles("q_sliding_window"),
    "q_stream_session" ->
      graft.operators.EventQueries.oracles("q_session_window"),
    "q_stream_enrich" ->
      """WITH stats AS (
        |  SELECT event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_value
        |  FROM events GROUP BY event_type
        |)
        |SELECT e.event_id, e.event_type, e.value, s.mean_value,
        |       e.value > s.mean_value * 2.0 AS is_anomaly
        |FROM events e JOIN stats s USING (event_type)""".stripMargin,
    "q_stream_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS p
        |  FROM toks WHERE len(t) >= 5
        |), spans AS (
        |  SELECT doc_id, CAST(p AS INT) AS pos,
        |         md5(array_to_string(t[p + 1 : p + 5], ' ')) AS h
        |  FROM pos
        |)
        |SELECT doc_id, pos, h,
        |       (ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) > 1)
        |         AS is_duplicate
        |FROM spans""".stripMargin
  )
}
