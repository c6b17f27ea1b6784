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

  /** Every drain runs on a CLONED session (shared SparkContext, own
    * SQLConf) with shuffle partitions cut to 8: each stateful
    * streaming operator allocates, commits and fsyncs ONE state store
    * per shuffle partition per micro-batch (a stream-stream join
    * allocates four), so at 32 partitions the drain cost is store
    * machinery, not data — measured 5.5 s → 2.7 s on the
    * stream-stream join at sf0.1 (compute-heavy drains additionally
    * need the pre-state repartition in StreamingOps: the single-file
    * source would serialize their map work on one task whatever the
    * partition count). The clone scopes the setting to the
    * drained query: the caller's session conf is never touched (the
    * round-7 no-conf-mutation-in-read-paths rule), and batch queries
    * keep the session's 32 (where AQE does the coalescing). A
    * production streaming job sizes shuffle.partitions to its state
    * volume at start the same way — partitions are a checkpoint
    * contract, fixed for the query's life.
    */
  /** Memoized per (context, dir, width, noData): the drain contract is
    * strictly sequential, so queries with the same conf shape can share
    * one clone instead of paying SessionState construction per drain
    * (68 clones per bench run otherwise — 17 stream queries × 4
    * executions). Keyed on the SparkContext REFERENCE (default identity
    * equals/hashCode — contexts never override them), so a suite JVM
    * that rebuilds its SparkSession never receives a clone of a stopped
    * context and two contexts can never collide (an identityHashCode
    * key could — hash codes aren't unique). Entries for stopped
    * contexts are purged on access, mirroring SharedBuilds' stopped-
    * session purge, so a session-cycling JVM doesn't accumulate
    * SessionStates of dead contexts.
    */
  private val drainSessions =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.SparkContext, String, Int, Boolean, String), SparkSession]()

  /** Corpus-scale state dial: `graft.state.provider` (sysprop, or
    * GRAFT_STATE_PROVIDER env) = `rocksdb` switches the drain sessions
    * to Spark's RocksDB state store, which keeps keyed state OFF-HEAP
    * with changelog-incremental commits — the production provider
    * once dedup/span state outgrows executor heaps (the 100 TB
    * regime; at harness scales the default HDFSBacked map is faster
    * because the whole state fits in memory and RocksDB's write
    * amplification buys nothing). `auto` makes that call from the
    * corpus size ([[chooseProvider]]); StreamingSpec certifies the
    * drained output is provider-invariant, so flipping the dial is a
    * pure deployment decision, never a semantics change.
    */
  private def stateProvider: String =
    sys.props.get("graft.state.provider")
      .orElse(sys.env.get("GRAFT_STATE_PROVIDER")).getOrElse("default")

  /** `auto` resolution for the state-provider dial: in-heap HDFSBacked
    * while the estimated keyed state fits comfortably, RocksDB once it
    * would crowd the heap. Estimated state = 16× the largest streamable
    * table's on-disk parquet bytes — the measured expansion at the
    * bench scale (sf0.1 events: 2 MB parquet → 35 MB session-window
    * state, stateOnCurrentVersionSizeBytes) rounded to the conservative
    * side. Threshold = maxHeap/4: the HDFSBacked provider keeps TWO map
    * versions per store during a commit, and the query's shuffle/sink
    * memory lives in the same heap, so keyed state above a quarter of
    * the heap is where sf10 runs measured GC pressure overtaking
    * RocksDB's write amplification (SCALING.md r17 comparison). Pure
    * function of the two sizes so the spec pins the decision boundary
    * directly.
    */
  private[graft] def chooseProvider(estStateBytes: Long, maxHeapBytes: Long): String =
    if (estStateBytes > maxHeapBytes / 4) "rocksdb" else "default"

  private[graft] def estimatedStateBytes(spark: SparkSession, dir: String): Long =
    16L * streamBytes(spark, dir)

  private def resolveProvider(spark: SparkSession, dir: String): String =
    stateProvider match {
      case "auto" => chooseProvider(
        estimatedStateBytes(spark, dir), Runtime.getRuntime.maxMemory())
      case p => p
    }

  private[graft] def drainSession(spark: SparkSession, dir: String,
      noDataBatches: Boolean = false): SparkSession = {
    val parts = drainPartitions(spark, dir)
    val provider = resolveProvider(spark, dir)
    drainSessions.keySet().removeIf(k => k._1.isStopped)
    drainSessions.computeIfAbsent(
      (spark.sparkContext, dir, parts, noDataBatches, provider), { _ =>
        val s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", parts.toString)
        if (provider == "rocksdb")
          s.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // Throwaway-drain checkpoint hygiene: the checkpoint is deleted
        // right after the drain, so retaining more than the latest batch's
        // offset/commit log entries (default 100) buys nothing — and the
        // async state-store maintenance task (default 60 s) must never fire
        // mid-run: the drain path unloads providers deterministically via
        // GraftStateStoreReset right after stop(), so the maintenance
        // snapshot work it would do is pure interference (see
        // GraftStateStoreReset's measured pathology). A production job
        // keeps the defaults: it retains batches for recovery and lets
        // maintenance amortize over a long-lived query.
        s.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
        s.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
        // The no-data micro-batch exists to advance the watermark and
        // flush newly-closed state AFTER the last data batch — the
        // windowed-aggregation append drains need it (their windows
        // only emit when the watermark closes them; pass
        // noDataBatches=true) — but for every other drain it is a pure
        // fixed cost: keyed-state update/complete queries emit on data,
        // and the append-mode INNER stream-stream joins and
        // within-watermark dedup emit their rows in the data batch that
        // matches them (the no-data batch only EVICTS state, which the
        // post-drain unloadAll discards wholesale anyway). Skipping it
        // removes one full state-store load/commit cycle per store per
        // drain. A production job keeps the default (true): there the
        // eviction IS the state bound.
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          noDataBatches.toString)
        s
      })
  }

  /** Drain width for a fixture dir: 8 partitions up to the gate/bench
    * scales, growing with the dir's largest streamable table beyond
    * them (1 partition per 512 KiB, capped at 32). 8 is right when
    * state-store machinery dominates (see above); at the sf1
    * certification scale the compute-heavy drains (span dedup over 10×
    * documents) are CPU-bound and a fixed 8 caps them at a quarter of
    * the box — exactly the "size shuffle.partitions to state volume at
    * start" rule a production job applies, made automatic for the
    * harness. Memoized per dir (one FS metadata probe).
    */
  private val drainParts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def drainPartitions(spark: SparkSession, dir: String): Int =
    // sysprop first (in-process override for the width-32 smoke test —
    // env vars are immutable inside the JVM), env for harness runs
    sys.props.get("graft.drain.parts").orElse(
      sys.env.get("GRAFT_DRAIN_PARTS")).map(_.toInt).getOrElse(
    drainParts.computeIfAbsent(dir, { d =>
      Integer.valueOf(
        math.max(8L, math.min(32L, streamBytes(spark, d) / (512L * 1024))).toInt)
    }))

  /** Largest streamable table's on-disk bytes for a fixture dir —
    * the size signal both the drain width and the state-provider
    * auto-dial derive from. Memoized per dir (one FS metadata probe);
    * `graft.stream.bytes` sysprop overrides for the dial specs.
    */
  private val streamBytesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def streamBytes(spark: SparkSession, dir: String): Long =
    sys.props.get("graft.stream.bytes").map(_.toLong).getOrElse(
    streamBytesMemo.computeIfAbsent(dir, { d =>
      java.lang.Long.valueOf(Seq("events", "documents", "embeddings").map { t =>
        try {
          val p = new org.apache.hadoop.fs.Path(s"$d/$t.parquet")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getContentSummary(p).getLength
        } catch { case _: Throwable => 0L }
      }.max)
    }))

  /** Run a streaming Dataset to completion into a memory sink and
    * return the accumulated table. Update mode for the keyed-state ops
    * (they emit per-row dispositions); complete mode for windowed
    * aggregations (emit every window's final state).
    */
  /** Throwaway drain checkpoints go on tmpfs when the box has one:
    * every state-store commit fsyncs its delta file, and on a
    * disk-backed /tmp those fsyncs ride the page-cache writeback
    * queue — at the sf1 certification scale (tens of MB of span-state
    * deltas per drain) identical drains measured 9 s or 35 s depending
    * on where a writeback storm landed. The checkpoint is deleted
    * right after the drain, so durability buys nothing here; a
    * production job points its checkpoint at durable storage for
    * recovery, which is exactly what the harness does NOT need.
    */
  private lazy val ckptRoot: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
      // Crashed runs leak their RAM-backed checkpoint roots until
      // reboot (deleteOnExit never fires on a kill -9 / OOM kill), so
      // sweep stale graft-drain-ckpt* dirs here. Ownership test is
      // LIVENESS, not recency: every root carries an `owner.pid` file
      // (written below, "pid startEpochMillis") and a root is swept
      // only when its recorded process is gone — a concurrent JVM
      // that idles for hours between drains keeps its root (r11 used
      // a 2 h mtime gate, which could sweep exactly that root
      // mid-run). Liveness goes through ProcessHandle (no /proc
      // dependency) and compares the recorded process START TIME when
      // both sides have one, so an unrelated process that reuses the
      // pid after a crash does not keep a dead root alive; when
      // either start time is unavailable the check degrades to
      // pid-alive (PID-reuse false-liveness then bounded until
      // reboot, when tmpfs clears anyway). The mtime age gate is kept
      // only for legacy/pid-less roots, and as a grace period so a
      // root is never swept in the window between createTempDirectory
      // and its pid write.
      val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
      def ownerAlive(root: java.nio.file.Path): Boolean = {
        val pidFile = root.resolve("owner.pid")
        try {
          if (!java.nio.file.Files.isRegularFile(pidFile)) false
          else {
            val parts = new String(
              java.nio.file.Files.readAllBytes(pidFile), "UTF-8")
              .trim.split("\\s+")
            if (parts.isEmpty || parts(0).isEmpty) false
            else {
              val handle = ProcessHandle.of(parts(0).toLong)
              if (!handle.isPresent) false
              else {
                val actualStart = handle.get().info().startInstant()
                if (parts.length < 2 || parts(1).toLong < 0 ||
                    !actualStart.isPresent) true // degrade: pid-alive
                else actualStart.get().toEpochMilli == parts(1).toLong
              }
            }
          }
        } catch { case _: Throwable => true } // unreadable => assume live
      }
      try {
        val listing = java.nio.file.Files.list(shm)
        try {
          val it = listing.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.startsWith("graft-drain-ckpt") &&
                p.toFile.lastModified() < cutoff && !ownerAlive(p))
              org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
          }
        } finally listing.close() // Files.list holds a directory fd
      } catch { case _: Throwable => () } // sweep is best-effort hygiene
      val d = java.nio.file.Files.createTempDirectory(shm, "graft-drain-ckpt")
      try {
        val self = ProcessHandle.current()
        val start = self.info().startInstant()
        val startMs = if (start.isPresent) start.get().toEpochMilli else -1L
        java.nio.file.Files.write(d.resolve("owner.pid"),
          s"${self.pid()} $startMs".getBytes("UTF-8"))
      } catch { case _: Throwable => () } // falls back to the mtime gate
      d.toFile.deleteOnExit()
      Some(d)
    } else None
  }

  /** Guard for the drain harness: `GraftStateStoreReset
    * .unloadAll()` is SparkContext-GLOBAL (it closes every loaded
    * provider in the JVM), which is safe only because the harness
    * drains strictly sequentially — a drain running concurrently would
    * have its providers yanked mid-micro-batch and pay a checkpoint
    * reload per batch at best. This turns that implicit contract into
    * a loud failure at the call site (r10 ADVICE item 2).
    */
  private[graft] val activeDrain =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Last parquet-drain output dir per prefix: a new drain for the
    * same prefix deletes its predecessor, bounding disk to one copy
    * per query (the callers — Verify, Bench, specs — consume the
    * returned frame before re-draining, mirroring the memory-sink
    * contract that rows live only as long as the caller's frame).
    */
  private val parquetDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private[graft] def drain(df: DataFrame, prefix: String,
      mode: String = "update", parquetSink: Boolean = false): DataFrame = {
    val name = s"${prefix}_${sinkSeq.incrementAndGet()}"
    if (!activeDrain.compareAndSet(null, name))
      throw new IllegalStateException(
        s"concurrent drain: '${activeDrain.get()}' is still active while " +
        s"'$name' starts — the drain harness contract is strictly " +
        "sequential (unloadAll() is SparkContext-global)")
    val session = df.sparkSession
    if (parquetSink) {
      // Large-output drains (output grows with corpus rows): the
      // memory sink accumulates the whole drained output ON THE
      // DRIVER — at sf10 q_stream_dup_spans crossed the 1 GiB
      // maxResultSize default, which is the HARNESS's own
      // superlinear term, not the pipeline's (r13 SCALING.md: alpha
      // 1.14 memory-sink vs 0.83 under foreachBatch→parquet). These
      // drains therefore sink each micro-batch straight to parquet —
      // the production shape — and the gate hashes the parquet read
      // back. Append-to-files reproduces memory-sink accumulation
      // exactly for update/append modes (each trigger's emitted rows
      // are appended once); complete mode would not, so it is
      // rejected loudly.
      require(mode != "complete",
        "parquet drain appends per-batch emissions; complete mode would duplicate windows")
      val outDir = java.nio.file.Files.createTempDirectory(s"graft-drain-out-$prefix")
      val old = parquetDirs.put(prefix, outDir)
      if (old != null) org.apache.commons.io.FileUtils.deleteQuietly(old.toFile)
      try {
        val w0 = df.writeStream.outputMode(mode).queryName(name)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir.toString)
          }
        val ckpt = ckptRoot.map(_.resolve(name))
        val q = ckpt.fold(w0)(p => w0.option("checkpointLocation", p.toString)).start()
        // same failure-isolated cleanup discipline as the memory path
        // below (no temp view to unregister here)
        var primary: Throwable = null
        def step(f: => Unit): Unit =
          try f catch {
            case t: Throwable =>
              if (primary == null) primary = t else primary.addSuppressed(t)
          }
        step(q.processAllAvailable())
        step(q.stop())
        step(org.apache.spark.sql.execution.streaming.state
          .GraftStateStoreReset.unloadAll())
        step(ckpt.foreach { p =>
          org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
        })
        if (primary != null) throw primary
        // a drain that emitted nothing writes no files — return an
        // empty frame of the stream's schema instead of failing
        // schema inference on an empty directory
        val listing = java.nio.file.Files.list(outDir)
        val hasFiles =
          try listing.anyMatch(p => p.getFileName.toString.endsWith(".parquet"))
          finally listing.close()
        if (hasFiles) session.read.schema(df.schema).parquet(outDir.toString)
        else session.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), df.schema)
      } finally activeDrain.set(null)
    } else
    try {
      val prof = sys.env.get("GRAFT_DRAIN_PROF").contains("1")
      var tMark = System.nanoTime()
      def mark(phase: String): Unit = if (prof) {
        val now = System.nanoTime()
        System.err.println(f"[drain-prof] $prefix%-24s $phase%-10s ${(now - tMark) / 1e9}%6.3fs")
        tMark = now
      }
      val w0 = df.writeStream.outputMode(mode).format("memory").queryName(name)
      // Failure-injection dial: GRAFT_DRAIN_DURABLE_DIR pins the
      // checkpoint to a STABLE per-prefix path that survives the JVM
      // (and is NOT deleted post-drain), so a rerun after a driver
      // kill resumes from the committed offsets/state instead of
      // starting a fresh throwaway checkpoint — the recovery contract
      // a production streaming job runs under, made reachable from
      // the harness. Combine with GRAFT_DRAIN_MAX_FILES (multi-batch
      // arrival) and a COMPLETE-mode query (whose final trigger emits
      // the full restored state) for a resume whose output is
      // batch-split-invariant and oracle-comparable.
      val durable = sys.env.get("GRAFT_DRAIN_DURABLE_DIR")
        .map(d => java.nio.file.Paths.get(d, s"ckpt_$prefix"))
      val ckpt = durable.orElse(ckptRoot.map(_.resolve(name)))
      val q = ckpt.fold(w0)(p => w0.option("checkpointLocation", p.toString)).start()
      mark("start")
      // Failure-isolated cleanup (r10 ADVICE item 1): each step runs
      // whatever the previous ones did — a q.stop() throw must not leak
      // the loaded providers or the tmpfs checkpoint, and a failed
      // drain must not leave the memory-sink temp view registered
      // (Verify retries a failed query under a fresh sink name, but the
      // orphaned view would pin its partial rows for the process life).
      // Error policy: the drain error (or the first cleanup error when
      // the drain itself succeeded) propagates; later cleanup errors
      // attach as suppressed.
      var primary: Throwable = null
      def step(f: => Unit): Unit =
        try f catch {
          case t: Throwable =>
            if (primary == null) primary = t else primary.addSuppressed(t)
        }
      step(q.processAllAvailable())
      mark("process")
      if (prof) q.recentProgress.foreach { p =>
        System.err.println(s"[drain-prof] $prefix batch=${p.batchId} " +
          s"rows=${p.numInputRows} durations=${p.durationMs}")
        p.stateOperators.foreach { so =>
          System.err.println(s"[drain-prof]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} commitMs=${so.commitTimeMs} " +
            s"durations=${so.customMetrics}")
        }
      }
      val drainFailed = primary != null
      step(q.stop())
      mark("stop")
      // free the stopped query's keyed-state maps NOW instead of
      // leaving them for the async maintenance task — see
      // GraftStateStoreReset for the measured pathology
      step(org.apache.spark.sql.execution.streaming.state
        .GraftStateStoreReset.unloadAll())
      mark("unload")
      // a durable checkpoint is the whole point of the dial — keep it
      step(if (durable.isEmpty) ckpt.foreach { p =>
        org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
      })
      mark("ckpt-del")
      if (drainFailed) {
        step(session.catalog.dropTempView(name))
        throw primary
      }
      // Capture the sink relation (Dataset construction analyzes the
      // plan eagerly, so the returned frame keeps the resolved memory
      // relation), then DROP the temp view: the registered name is the
      // only long-lived root of the sink's driver-side rows, and across
      // a bench run (158 queries × 4 executions, 17 of them streaming)
      // the accumulated sinks — millions of rows at the sf1
      // certification scale — otherwise stay reachable for the whole
      // process and turn later drains into GC thrash (measured: the
      // same sf1 drain 16.5 s fresh → 47–160 s after a few prior
      // drains). With the view dropped, the rows live exactly as long
      // as the caller holds the returned frame.
      val out = session.table(name)
      step(session.catalog.dropTempView(name))
      if (primary != null) throw primary
      out
    } finally activeDrain.set(null)
  }

  /** Streaming exact dedup, drained: every doc with its content hash
    * and the first-seen disposition the ingest gate assigned.
    */
  def streamDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.dedupExactStream(s, StreamingOps.docStream(s, dir)).toDF(),
      "q_stream_dedup_exact")
  }

  /** Streaming span dedup, drained: every (doc, span position) with
    * its duplicated-span flag.
    */
  def streamDupSpans(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.dupSpansStream(s, StreamingOps.docStream(s, dir)).toDF(),
      "q_stream_dup_spans", parquetSink = true)
  }

  /** Streaming tumbling windows, drained in APPEND mode — the mode
    * production runs (r8 verdict item 5; until round 9 this drained
    * complete, whose driver-side memory sink accumulates EVERY window
    * ever opened). Append emits a window only when the watermark
    * closes it, so the sink holds exactly the emitted set and the
    * oracle states the emission cut: windows whose end is at or below
    * the ms-floored final watermark (max event-time minus the 1-hour
    * delay); open tail windows are withheld. Single-batch source —
    * the cross-batch merge/drop path is [[streamAppend]]'s two-batch
    * job, which shares this oracle (same fixture, same final
    * watermark, and time-ordered arrival means the split drops
    * nothing — so identical output through a different runtime path
    * is exactly the invariant worth pinning).
    */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir, noDataBatches = true)
    drain(StreamingOps.windowedCounts(StreamingOps.eventStream(s, dir)),
      "q_stream_tumbling", mode = "append")
  }

  /** Streaming sliding windows, drained append — emission cut as in
    * [[streamTumbling]], over the 3-overlap window set.
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir, noDataBatches = true)
    drain(StreamingOps.slidingCounts(StreamingOps.eventStream(s, dir)),
      "q_stream_sliding", mode = "append")
  }

  /** Streaming session windows, drained append — the stateful
    * session-merge path end-to-end (per-user gap sessions built by
    * the streaming session_window operator, not the batch sort). A
    * session emits once the watermark passes its end (end = last
    * event + gap, so nothing can merge into it anymore); sessions
    * ending inside the final watermark delay are withheld, and the
    * oracle applies that same cut to the batch session build.
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir, noDataBatches = true)
    drain(StreamingOps.sessionCounts(StreamingOps.eventStream(s, dir)),
      "q_stream_session", mode = "append")
  }

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
      // spread the join + memory-sink row serialization off the
      // single-file source task (100k output rows on one task
      // otherwise; the stats side broadcasts either way)
      .repartition(spark.sparkContext.defaultParallelism, col("event_id"))
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"), col("mean_value"),
        (col("value") > col("mean_value") * lit(2.0)).as("is_anomaly"))
    drain(enriched, "q_stream_enrich", mode = "append")
  }

  /** STREAM-STREAM interval join — the attribution shape (each view
    * joined to the clicks the same user made within the following 30
    * minutes) with BOTH sides streaming: two independent file sources
    * over the events fixture, a 1-hour watermark on each, and an
    * equi + event-time-range join condition — exactly the contract
    * Structured Streaming needs to bound both join-state buffers (a
    * buffered view can be evicted once the click watermark passes
    * view_ts + 30 min, and vice versa; without the range condition
    * state grows forever). Append mode; matches emit as both sides
    * arrive.
    *
    * Drained on the fixture-as-one-batch, the result equals the batch
    * interval join, so the oracle is the plain SQL join; the
    * cross-batch path (a click arriving one micro-batch after its
    * view finds the buffered view; a view aged past the watermark
    * does not match) is pinned by StreamingSpec's synthetic two-batch
    * test.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = drainSession(spark, dir)
    val views = StreamingOps.eventStream(s, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = StreamingOps.eventStream(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    drain(StreamingOps.intervalJoinStream(views, clicks),
      "q_stream_join", mode = "append")
  }

  /** Watermark-bounded streaming dedup, drained:
    * dropDuplicatesWithinWatermark on (user_id, event_type) — the
    * PRODUCTION-shape dedup whose state is evicted once the watermark
    * passes (unlike the keep-forever keyed-state ops, whose state is
    * bounded by distinct content instead). The emitted KEY SET is
    * deterministic — exactly the distinct keys — so the oracle
    * projects to it; which physical row survives is an arrival-order
    * artifact and stays out of the contract (StreamingSpec pins the
    * cross-batch drop/keep semantics).
    */
  def streamDedupWm(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    // SINGLE-BATCH drain by design: the DISTINCT oracle is equivalent
    // only because eventStream delivers the fixture as ONE micro-batch
    // — dropDuplicatesWithinWatermark may re-admit a key after its
    // state expires, so a staged multi-batch source (q_stream_append's
    // shape) would need an oracle that replays the eviction protocol.
    // The cross-batch drop/keep/re-admit semantics are pinned in
    // StreamingSpec instead (r8 ADVICE).
    drain(StreamingOps.dedupWithinWatermark(StreamingOps.eventStream(s, dir))
      .select("user_id", "event_type"),
      "q_stream_dedup_wm", mode = "append")
  }

  /** Stream-stream click ATTRIBUTION join, drained: each purchase
    * joined to the same user's clicks in the PRECEDING hour — the
    * time-reversed companion of [[streamJoin]] (there: clicks after a
    * view; here: clicks before a purchase), sharing the same
    * watermark + range state-bounding contract. One-batch drain
    * equals the batch interval join.
    */
  def streamAttrib(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.clickAttribution(StreamingOps.eventStream(s, dir)),
      "q_stream_attrib", mode = "append")
  }

  /** CDC-apply at ingest, drained: per-key latest-version state with
    * tombstone suppression (see StreamingOps.cdcCurrentState). A
    * one-batch drain emits exactly the batch log collapse, so the
    * oracle is q_cdc_merge's SQL verbatim.
    */
  def streamCdc(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(
      StreamingOps.cdcCurrentState(s, StreamingOps.eventStream(s, dir)).toDF()
        .select(
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("last_op"),
          org.apache.spark.sql.functions.col("last_value"),
          org.apache.spark.sql.functions.expr("timestamp_micros(last_us)").as("last_ts")),
      "q_stream_cdc")
  }

  /** Per-user running totals via flatMapGroupsWithState, drained: one
    * batch emits each user's final (n_events, total_value). The state
    * accumulates exact integer cents (see StreamingOps), so the
    * emitted doubles hash-match the batch DECIMAL(18,2) aggregate.
    */
  def streamTotals(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.userRunningTotals(s, StreamingOps.eventStream(s, dir)).toDF(),
      "q_stream_totals")
  }

  /** Streaming count-min sketch cells, drained complete: the running
    * 4x64 cell counts — state bounded at 256 rows FOREVER whatever
    * the corpus size. Shares TextFunctions.cmsKeys with the batch
    * estimator; the oracle re-derives the salt/bucket scheme in SQL.
    */
  def streamCms(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.cmsCellsStream(StreamingOps.docStream(s, dir)),
      "q_stream_cms", mode = "complete")
  }

  /** Streaming MEDIA near-dup candidates, drained: arriving binary
    * payloads byte-grammed and MinHash-banded with the batch fuzzy
    * index's scheme, probing the shared first-anchor band state —
    * completes the oracle-checked modality matrix (text, embeddings,
    * media) for streaming dedup-at-ingest. The oracle shares the
    * batch media gram/band CTE by reference.
    */
  def streamMedia(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    val media = StreamingOps.docStream(s, dir).select(
      org.apache.spark.sql.functions.col("doc_id").as("media_id"),
      org.apache.spark.sql.functions.col("text").cast("binary").as("payload"))
    drain(StreamingOps.dedupMediaStream(s, media).toDF(), "q_stream_media", parquetSink = true)
  }

  /** Append-mode tumbling windows under a real 1-hour watermark across
    * TWO micro-batches — the mode production runs (r7 verdict item 3):
    * the fixture split at the ingest-id midpoint arrives as two file-
    * source batches, so cross-batch state merge, watermark advancement
    * and append-mode window finalization all run the real path, and
    * the sink holds exactly the windows the FINAL watermark closed —
    * unclosed tail windows never emit (the append-vs-complete
    * difference). The oracle states that emission cut: windows whose
    * end is at or below the ms-floored global max event-time minus 1
    * hour (Spark tracks watermarks in ms). No drop clause: measured on
    * this engine (StreamingSpec's two synthetic two-batch tests), a
    * late row is dropped only when its window's state was ALREADY
    * evicted by a watermark committed in an earlier fully-drained
    * trigger — with both files discovered up-front, batch 2 merges
    * into still-live state — and the fixture arrives ingest-ordered,
    * so no row is late at the midpoint split under either reading.
    * The drop path is pinned by the planted-straggler spec test where
    * file B arrives only after batch 1's windows were evicted.
    */
  def streamAppend(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir, noDataBatches = true)
    drain(StreamingOps.windowedCounts(StreamingOps.eventStreamTwoBatch(s, dir)),
      "q_stream_append", mode = "append", parquetSink = true)
  }

  /** The streaming ingest gate, drained: every doc dispositioned with
    * exact-dup state + the batch-checked quality score and the first
    * failing stage as audit reason (no benchmark Bloom here — the
    * decontamination probe composes the same row-local expression and
    * is exercised by StreamingSpec; the oracle covers the stateful
    * exact-dup x quality precedence).
    */
  def streamGate(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.ingestGateStream(s, StreamingOps.docStream(s, dir)).toDF(),
      "q_stream_gate")
  }

  /** Streaming MinHash-LSH near-dup candidates, drained: each (doc,
    * band) with the first-anchor doc of its band key — the propose
    * half of the batch propose/verify split, now oracle-checked (the
    * oracle mirrors the banding with the SAME shared sig/band CTEs as
    * the batch near-dup oracles, so the schemes cannot drift).
    */
  def streamNear(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.dedupNearStream(s, StreamingOps.docStream(s, dir)).toDF(),
      "q_stream_near")
  }

  /** Streaming semantic (embedding) near-dup candidates, drained —
    * hyperplane sign-bit bands probing first-anchor state; oracle
    * shares the batch q_dedup_embedding quantization/banding CTE.
    */
  def streamEmb(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.dedupEmbeddingStream(s, StreamingOps.vecStream(s, dir)).toDF(),
      "q_stream_emb")
  }

  /** Per-source token budget at ingest, drained: first-fit greedy in
    * doc_id order, one counter per source. The oracle replays the
    * fold as a per-source recursive CTE (25 docs per source at oracle
    * scale — the recursion is the SPEC restated, the engine runs the
    * keyed-state fold).
    */
  def streamBudget(spark: SparkSession, dir: String): DataFrame = {
    val s = drainSession(spark, dir)
    drain(StreamingOps.sourceTokenBudget(s, StreamingOps.docStream(s, dir),
        TokenBudget).toDF(),
      "q_stream_budget")
  }

  /** Budget for [[streamBudget]] — ~half a source's fixture token mass,
    * so every source exhibits keeps, skips AND post-skip refits. */
  private val TokenBudget = 700L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_append" -> streamAppend,
    "q_stream_join" -> streamJoin,
    "q_stream_dedup_wm" -> streamDedupWm,
    "q_stream_attrib" -> streamAttrib,
    "q_stream_totals" -> streamTotals,
    "q_stream_cdc" -> streamCdc,
    "q_stream_cms" -> streamCms,
    "q_stream_media" -> streamMedia,
    "q_stream_gate" -> streamGate,
    "q_stream_near" -> streamNear,
    "q_stream_emb" -> streamEmb,
    "q_stream_budget" -> streamBudget,
    "q_stream_dedup_exact" -> streamDedupExact,
    "q_stream_dup_spans" -> streamDupSpans,
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding" -> streamSliding,
    "q_stream_session" -> streamSession,
    "q_stream_enrich" -> streamEnrich
  )

  // The oracles restate the streaming semantics in batch SQL: within
  // one micro-batch the keyed state orders arrivals by (doc_id) /
  // (doc_id, pos), so "first wins" is a plain ROW_NUMBER; the banded
  // near-dup oracles share the batch sig/band CTEs BY REFERENCE
  // (DedupQueries.shinglesCte / sigSqlItems / embOracleCte) so the
  // schemes cannot drift; the two-batch append oracle replays the
  // watermark protocol (ms-floored max minus delay, per batch).
  /** The append-mode tumbling oracle: batch aggregate + the watermark
    * emission cut (ms-floored max event-time minus the 1-hour delay;
    * emit iff window end at or below it). Shared verbatim by
    * q_stream_append (two-batch arrival) and q_stream_tumbling
    * (single-batch): same final watermark, same emitted set.
    */
  private val tumblingAppendOracle =
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |wmf AS (SELECT epoch_us(max(ts))//1000 - 3600000 AS w_ms FROM ev),
      |agg AS (
      |  SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS win_start,
      |         time_bucket(INTERVAL 15 MINUTE, ts) + INTERVAL 15 MINUTE AS win_end,
      |         event_type, count(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY 1, 2, 3
      |)
      |SELECT win_start, win_end, event_type, n, sum_value
      |FROM agg, wmf WHERE epoch_us(win_end)//1000 <= wmf.w_ms""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, CAST(v.ts AS TIMESTAMP) AS view_ts,
        |       c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM events v JOIN events c
        |  ON v.event_type = 'view' AND c.event_type = 'click'
        | AND c.user_id = v.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) < CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE""".stripMargin,
    "q_stream_dedup_wm" ->
      """SELECT DISTINCT user_id, event_type FROM events""",
    "q_stream_attrib" ->
      """SELECT p.event_id AS purchase_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |       c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR""".stripMargin,
    "q_stream_cdc" ->
      """SELECT user_id, event_type AS last_op, value AS last_value,
        |       CAST(ts AS TIMESTAMP) AS last_ts
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) t
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_stream_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS DOUBLE)
        |         / 100.0 AS total_value
        |FROM events GROUP BY user_id""".stripMargin,
    "q_stream_cms" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text,' ')) AS tok FROM documents
        |), keyed AS (
        |  SELECT r,
        |         CAST(('0x' || substr(md5('cm' || r || ':' || tok), 1, 8))::UBIGINT % 64 AS BIGINT) AS b
        |  FROM toks, (SELECT unnest([0,1,2,3]) AS r) rows
        |)
        |SELECT CAST(r AS INT) AS r, b, CAST(count(*) AS BIGINT) AS cell
        |FROM keyed GROUP BY r, b""".stripMargin,
    "q_stream_media" ->
      s"""WITH ${graft.multimodal.MultimodalQueries.mediaBandsCte},
        |nn AS (SELECT doc_id, band_id, band_key FROM bands WHERE band_key IS NOT NULL)
        |SELECT doc_id, CAST(band_id AS INT) AS band_id,
        |       CAST(min(doc_id) OVER (PARTITION BY band_id, band_key) AS BIGINT)
        |         AS anchor_doc,
        |       doc_id <> min(doc_id) OVER (PARTITION BY band_id, band_key)
        |         AS is_candidate
        |FROM nn""".stripMargin,
    "q_stream_append" -> tumblingAppendOracle,
    "q_stream_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), stats AS (
        |  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_dis
        |  FROM toks GROUP BY doc_id
        |), q AS (
        |  SELECT md5(d.text) AS content_hash, d.doc_id, d.source,
        |         (least(CAST(s.n_tok AS DOUBLE) / 50.0, 1.0) *
        |          (0.5 + 0.5 * (CAST(s.n_dis AS DOUBLE) / CAST(s.n_tok AS DOUBLE))))
        |           >= 0.5 AS quality_ok
        |  FROM documents d JOIN stats s ON s.doc_id = d.doc_id
        |), g AS (
        |  SELECT content_hash, doc_id, source, quality_ok, FALSE AS contaminated,
        |         ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1
        |           AS first_seen
        |  FROM q
        |)
        |SELECT content_hash, doc_id, source, quality_ok, contaminated, first_seen,
        |       (CASE WHEN NOT first_seen THEN 'exact_dup'
        |             WHEN NOT quality_ok THEN 'low_quality' END) IS NULL AS keep,
        |       CASE WHEN NOT first_seen THEN 'exact_dup'
        |            WHEN NOT quality_ok THEN 'low_quality' END AS reason
        |FROM g""".stripMargin,
    "q_stream_near" ->
      s"""WITH ${graft.operators.DedupQueries.shinglesCte},
        |sig AS (
        |  SELECT doc_id,
        |         ${graft.operators.DedupQueries.sigSqlItems}
        |  FROM sh GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, 0 AS band_id, m0 || '_' || m1 || '_' || m2 AS band_key FROM sig
        |  UNION ALL SELECT doc_id, 1, m3 || '_' || m4 || '_' || m5 FROM sig
        |  UNION ALL SELECT doc_id, 2, m6 || '_' || m7 || '_' || m8 FROM sig
        |), nn AS (SELECT doc_id, band_id, band_key FROM bands WHERE band_key IS NOT NULL)
        |SELECT doc_id, CAST(band_id AS INT) AS band_id,
        |       CAST(min(doc_id) OVER (PARTITION BY band_id, band_key) AS BIGINT)
        |         AS anchor_doc,
        |       doc_id <> min(doc_id) OVER (PARTITION BY band_id, band_key)
        |         AS is_candidate
        |FROM nn""".stripMargin,
    "q_stream_emb" ->
      s"""WITH ${graft.operators.DedupQueries.embOracleCte}
        |SELECT vec_id, CAST(band_id AS INT) AS band_id,
        |       CAST(min(vec_id) OVER (PARTITION BY band_id, band_key) AS BIGINT)
        |         AS anchor_vec,
        |       vec_id <> min(vec_id) OVER (PARTITION BY band_id, band_key)
        |         AS is_candidate
        |FROM keys""".stripMargin,
    "q_stream_budget" ->
      s"""WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents
        |), walk(source, rn, doc_id, n_tok, kept, used_after) AS (
        |  SELECT source, rn, doc_id, n_tok, n_tok <= $TokenBudget,
        |         CASE WHEN n_tok <= $TokenBudget THEN n_tok ELSE CAST(0 AS BIGINT) END
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.rn, d.doc_id, d.n_tok,
        |         w.used_after + d.n_tok <= $TokenBudget,
        |         CASE WHEN w.used_after + d.n_tok <= $TokenBudget
        |              THEN w.used_after + d.n_tok ELSE w.used_after END
        |  FROM walk w JOIN d ON d.source = w.source AND d.rn = w.rn + 1
        |)
        |SELECT source, doc_id, n_tok, kept, used_after FROM walk""".stripMargin,
    "q_stream_dedup_exact" ->
      """SELECT md5(text) AS content_hash, doc_id, source,
        |       (ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1)
        |         AS first_seen
        |FROM documents""".stripMargin,
    // append-mode emission cuts over the batch window builds (r9:
    // these drained complete until the append protocol was
    // oracle-encoded; see streamTumbling's scaladoc)
    "q_stream_tumbling" -> tumblingAppendOracle,
    "q_stream_sliding" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |wmf AS (SELECT epoch_us(max(ts))//1000 - 3600000 AS w_ms FROM ev),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 10 MINUTE, ts) - k.k * INTERVAL 10 MINUTE AS win_start,
        |         time_bucket(INTERVAL 10 MINUTE, ts) - k.k * INTERVAL 10 MINUTE + INTERVAL 30 MINUTE AS win_end,
        |         event_type, count(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM ev CROSS JOIN (VALUES (0), (1), (2)) AS k(k)
        |  GROUP BY 1, 2, 3
        |)
        |SELECT win_start, win_end, event_type, n, sum_value
        |FROM agg, wmf WHERE epoch_us(win_end)//1000 <= wmf.w_ms""".stripMargin,
    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |                OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
        |), numbered AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged
        |), agg AS (
        |  SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
        |         user_id, count(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM numbered GROUP BY user_id, sess_id
        |), wmf AS (
        |  SELECT epoch_us(max(CAST(ts AS TIMESTAMP)))//1000 - 3600000 AS w_ms FROM events
        |)
        |SELECT sess_start, sess_end, user_id, n, sum_value
        |FROM agg, wmf WHERE epoch_us(sess_end)//1000 <= wmf.w_ms""".stripMargin,
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
