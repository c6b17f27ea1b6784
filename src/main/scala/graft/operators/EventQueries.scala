package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Event-time operators over the `events` table: tumbling, sliding and
  * session windows plus keyed dedup — the batch expression of the
  * semantics the streaming module (graft.streaming) runs incrementally
  * with watermarks. The reference's own incremental machinery is
  * processing-time only (SURVEY §2.10 T5); these add real event-time
  * handling.
  *
  * Scale: all window aggregations key on (bucket, type) or user_id —
  * plain hash shuffles; the session build is a per-user sort window
  * (users are bounded); nothing accumulates unbounded driver state.
  */
object EventQueries extends graft.QueryModule {

  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Floor-division epoch bucketing. Spark's `DIV` truncates toward
    * zero while the DuckDB oracles bucket with floor(epoch/d) — the two
    * diverge on negative (pre-1970) epochs, so a plain `DIV` is a
    * latent cross-engine mismatch masked by post-2020 fixtures (r8
    * ADVICE). Exact integer floor-div: subtract the non-negative
    * `pmod` remainder, then the division is exact — no doubles near
    * the bucket id.
    */
  private def fdivSql(x: String, d: Long): String =
    s"(($x) - pmod(($x), ${d}L)) DIV ${d}L"

  // ===== tumbling window (15 min), epoch-aligned in both engines =====
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  // ===== sliding window (30 min window, 10 min slide) =====
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  // ===== session window (30 min gap) per user =====
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .select(
        col("w.start").as("sess_start"), col("w.end").as("sess_end"),
        col("user_id"), col("n"), col("sum_value"))

  // ===== keyed dedup: first event per (user, type), deterministic =====
  def dedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "ts", "value")
  }

  /** Ordered-sequence funnel: per user, the strict view → click →
    * purchase conversion chain — t1 = first view, t2 = first click
    * AFTER t1, t3 = first purchase AFTER t2 (the product-analytics
    * query class where order matters, not just membership).
    *
    * Shape: the join-shaped conditional-min chain — three per-type
    * filtered aggregates (each a hash aggregate with map-side partial
    * min, state = ONE timestamp per user) stitched by equi-joins on
    * user_id. Until round 7 this collected each user's whole event
    * history into one array in one task (`collect_list`), the one
    * unguarded skew hazard in the catalog: a bot/power user at corpus
    * scale lands their millions of events in a single aggregation
    * buffer (r7 verdict item 2; `Dev funnelstress` measures the two
    * shapes head-to-head on a planted 1M-event user). Here no task
    * ever holds more than a running min per (user, stage), whatever
    * the per-user event count — the same values, join-shaped, and
    * every event_type filter pushes into the parquet scan.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir))

  /** The funnel chain over any (user_id, ts, event_type) frame —
    * factored so the skew stress harness drives the exact production
    * plan on synthetic power-user data.
    */
  private[graft] def funnelOf(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("ts"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2).otherwise(1)
          .cast("int").as("stage"))
  }

  /** Cohort retention matrix: users bucketed by first-activity week,
    * distinct active users per (cohort, weeks-since-cohort) cell — the
    * stickiness companion of [[funnel]] (a funnel says who converts,
    * retention says who comes back). Week index is pure integer
    * arithmetic over the epoch second (div 604800), so both engines
    * bucket identically with no calendar/timezone semantics in play.
    *
    * Scale: one hash shuffle on user_id for the cohort min, one
    * equi-join back on user_id, then a distinct-count aggregate whose
    * grid is (n_cohorts x max_offset) cells — Spark's two-phase
    * count-distinct partials on the grid, never a global sort.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr(fdivSql("CAST(ts AS LONG)", 604800)).as("w"))
    val cohort = ev.groupBy("user_id").agg(min(col("w")).as("cohort_w"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("offset_w"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Late-data accounting — the negative path of the event-time
    * operators: how many events would a 1-hour watermark have DROPPED,
    * per type? Arrival order is the ingest sequence (`event_id` is the
    * monotone ingest id); the watermark in force when an event arrives
    * is the max event-time among STRICTLY EARLIER arrivals minus the
    * 1-hour delay (exclusive prefix — streaming watermarks advance
    * from already-seen data, and an event never filters itself). An
    * event is late iff its ts is below that watermark; kept + late =
    * total, so the batch numbers bound what the streaming twin
    * (StreamingSpec's late-arrival tests) may emit.
    *
    * Scale: the global running max runs through
    * [[graft.pipeline.PrefixSum.exclusiveRunningMax]]'s reduction tree
    * — no task scans more than k rows, unlike the naive one-window
    * `max() over (order by event_id)` that funnels the whole table
    * through a single WindowExec task (the oracle keeps that spelling:
    * same values, fixture-scale only).
    */
  def lateEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    graft.pipeline.PrefixSum
      .exclusiveRunningMax(ev, Nil, "event_id", "ts", "hwm")
      .withColumn("is_late",
        col("hwm").isNotNull && col("ts") < col("hwm") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("is_late"), 0L).otherwise(1L)).as("n_kept"))
  }

  /** Time-interval RANGE-frame window — the frame class the ROWS-frame
    * analytics (q_window_analytics) can't express: for every event,
    * the user's event count and exact value sum over the TRAILING HOUR
    * of event-time (burst/rate accounting). The frame is defined on
    * the epoch-micros ORDER VALUE (rangeBetween includes peers), so
    * the result is deterministic without any tiebreak even when a user
    * has same-microsecond events.
    *
    * Scale: one hash shuffle on user_id; the per-user sort is bounded
    * by user activity and the frame scan is windowed two-pointer work
    * inside WindowExec, never a per-row rescan of the partition. A
    * corpus with unbounded power users would sub-key by (user, day) —
    * the frame never spans more than an hour, so day boundaries only
    * need a 1-hour overlap read.
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ord"))
      .rangeBetween(-3600000000L, 0L) // 1 hour in micros, inclusive
    Tables.events(spark, dir)
      .withColumn("ord", unix_micros(col("ts")))
      // one select, both window exprs: chained withColumns left TWO
      // Window nodes in the plan (the interleaved Project blocked
      // Catalyst's window collapse); a single projection shares one
      // Window operator and one sort. .over attaches to the aggregate
      // itself (the exactSum helper wraps the sum in a cast, which
      // can't host a window spec).
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("sum_1h"))
  }

  /** Source-freshness audit — the ops check before trusting any
    * incremental load: per event type, row count, latest event-time,
    * and staleness (seconds behind the freshest type). The global max
    * is a window over the ALREADY-AGGREGATED per-type frame (a handful
    * of rows), so the single-task empty-frame window costs nothing —
    * never a second scan of the events table, never a crossJoin.
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"))
    val wAll = Window.partitionBy()
    perType
      .withColumn("staleness_sec",
        // cast to long AFTER the double division = truncation toward
        // zero; equals the oracle's BIGINT floor-div since staleness
        // is non-negative (and far below 2^53 micros, so the double
        // round-trip is exact)
        ((max(unix_micros(col("max_ts"))).over(wAll) - unix_micros(col("max_ts")))
          / lit(1000000L)).cast("long"))
      .select("event_type", "n", "max_ts", "staleness_sec")
  }

  /** Event-rate anomaly detection: each (type, hour)'s count against
    * its own trailing-24-hour mean — the ops-side spike/alert view of
    * an event pipeline (bot bursts, incident storms, scraper loops).
    * The trailing window is a RANGE frame over integer epoch-hours
    * ([-24h, -1h] — hours with zero events are simply absent, so the
    * mean is over OBSERVED trailing hours, n_prev of them), and the
    * spike flag is an exact integer cross-multiplication
    * (cnt * n_prev > 3 * sum_prev, i.e. count > 3x trailing mean)
    * gated on >= 6 observed trailing hours — no float division
    * anywhere near the decision.
    *
    * Scale: one (type, hour) hash aggregate — domain-bounded output —
    * then a per-type RANGE window over that tiny aggregated frame.
    * The raw corpus is touched exactly once.
    */
  def spikes(spark: SparkSession, dir: String): DataFrame =
    spikesOf(Tables.events(spark, dir))

  /** [[spikes]] on an arbitrary (ts, event_type) frame — the shape the
    * planted-burst spec drives directly.
    */
  private[graft] def spikesOf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), expr(fdivSql("unix_timestamp(ts)", 3600)).as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-24, -1)
    hourly
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("sum_prev", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("is_spike",
        col("n_prev") >= 6 && col("n") * col("n_prev") > col("sum_prev") * 3)
      .select("event_type", "hr", "n", "n_prev", "sum_prev", "is_spike")
  }

  /** Gap-filled hourly series — sparse-to-dense resampling: the
    * (type, hour) counts joined onto the FULL hour grid between the
    * corpus' min and max hour, absent hours zero-filled and flagged.
    * Monitoring, forecasting and join-with-externals all want the
    * dense form; the grid is (types x hour-span)-sized — a metadata
    * domain bounded by calendar time, never corpus rows.
    *
    * Scale: one (type, hour) hash aggregate over the corpus, then a
    * broadcast 1-row span crossJoin + sequence explode to build the
    * grid, and a left join grid->counts (both sides domain-bounded).
    */
  /** Hard ceiling on the dense-grid span: `explode(sequence(h0, h1))`
    * is otherwise unbounded in CALENDAR time, not corpus size — one
    * 50-year outlier timestamp would make every type explode ~438k
    * rows (r8 verdict stretch item). Ten years of hourly cells
    * (87,600/type) is comfortably past any monitoring horizon while
    * keeping a poisoned corpus loud: beyond it the job FAILS with the
    * span in the message instead of silently materializing a grid
    * nobody asked for. Widen deliberately if a use case needs it.
    */
  private[graft] val MaxGapfillSpanHours = 10L * 365L * 24L

  def gapfill(spark: SparkSession, dir: String): DataFrame =
    gapfillOf(Tables.events(spark, dir))

  private[graft] def gapfillOf(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), expr(fdivSql("unix_timestamp(ts)", 3600)).as("hr"))
      .agg(count(lit(1)).as("n"))
    val span = hourly.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      // span guard: raise_error rides the 1-row span frame — zero
      // cost on the grid path, and the check runs before any explode
      .withColumn("h1", when(
        col("h1") - col("h0") > MaxGapfillSpanHours,
        raise_error(concat(
          lit(s"gapfill span exceeds $MaxGapfillSpanHours hours: "),
          (col("h1") - col("h0")).cast("string"),
          lit(" (outlier timestamps? clean first or widen MaxGapfillSpanHours)")))
          .cast("long")).otherwise(col("h1")))
    val grid = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    grid.join(hourly, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNull.as("is_gap"))
  }

  /** Peak interval concurrency — the sweep-line occupancy audit: each
    * event occupies [ts, ts + 30 min); per (type, UTC day) the peak
    * number of simultaneously open intervals, computed as a +1/-1
    * edge sweep with a running integer sum. Edges order by (second,
    * delta) so at an exact boundary the -1 closes BEFORE the +1 opens
    * (half-open intervals); ties among identical edges commute, so
    * the prefix-sum multiset — and its max — is engine-independent.
    * Spans are attributed to their START day (documented convention:
    * intra-day occupancy, no midnight carry).
    *
    * Scale: the sweep partitions by (type, day) — thousands of
    * independent partitions — and each day's edge list is bounded by
    * that day's event count; nothing globally ordered.
    */
  def concurrency(spark: SparkSession, dir: String): DataFrame =
    concurrencyOf(Tables.events(spark, dir))

  /** [[concurrency]] on an arbitrary (ts, event_type) frame — the
    * shape the planted-overlap and differential specs drive directly.
    *
    * TWO-PHASE sweep, not one day-wide window: a single window per
    * (type, day) funnels a hot day's whole edge list through one
    * task's sort (the same class of hazard as the pre-r8 funnel
    * buffer). Instead phase 1 runs the running sum WITHIN each
    * (type, day, hour) — tasks bounded by an hour's edges; drop to
    * minute buckets if an hour can still be hot — keeping each
    * hour's local running max and net change; phase 2 adds the
    * cumulative net of the day's PRECEDING hours (a window over the
    * <= 24-row hourly aggregate — metadata-sized) as an offset.
    * Exact, because hour boundaries respect the global (t, delta)
    * order (hour = t DIV 3600 is monotone in t), so every edge's
    * global running value is its hour offset + its local running
    * value, and the day peak is the max of offset + local max.
    * ConcurrencySpec pins this equal to the naive one-window sweep.
    */
  private[graft] def concurrencyOf(events: DataFrame): DataFrame = {
    val edges = events
      .select(col("event_type"),
        expr(fdivSql("unix_timestamp(ts)", 86400)).as("day"),
        expr("unix_timestamp(ts)").as("t0"))
      .select(col("event_type"), col("day"),
        explode(array(
          struct(col("t0").as("t"), lit(1).as("delta")),
          struct((col("t0") + 1800L).as("t"), lit(-1).as("delta")))).as("e"))
      .select(col("event_type"), col("day"), col("e.t"), col("e.delta"),
        expr(fdivSql("e.t", 3600)).as("hour"))
    val hourW = Window.partitionBy(col("event_type"), col("day"), col("hour"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = edges
      .withColumn("run", sum(col("delta")).over(hourW))
      .groupBy(col("event_type"), col("day"), col("hour"))
      .agg(max(col("run")).as("local_max"),
        sum(col("delta")).as("net"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"))
    val dayW = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hourly
      .withColumn("offset", coalesce(sum(col("net")).over(dayW), lit(0L)))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("offset") + col("local_max")).as("peak"),
        sum(col("n_starts")).as("n_events"))
  }

  /** User-journey transition mining: consecutive event-type pairs per
    * user in event-time order — the Markov-chain view of behavioral
    * flow (onboarding funnels, loop detection, next-action models all
    * start here). Ordering ties break by event_id so both engines walk
    * identical sequences; output is the transition count matrix over
    * the (type x type) domain plus each source state's outgoing total,
    * with the majority-transition flag as an integer comparison
    * (2 * n > out_total).
    *
    * Scale: one per-user lead() window (users are bounded, per-user
    * history is the partition — the same per-user window shape as
    * sessionization) into a domain-bounded (from, to) aggregate.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val outTotals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("out_total"))
    pairs.join(outTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("out_total"),
        (col("n") * 2 > col("out_total")).as("is_majority"))
  }

  /** Calendar seasonality profile: event counts on the (type,
    * day-of-week, hour-of-day) grid — the shape behind load curves,
    * send-time optimization and anomaly baselines. Grid arithmetic is
    * pure integer epoch math (epoch day 0 = Thursday, so dow =
    * (epoch_day + 4) % 7 with Sunday = 0 — spelled identically in the
    * oracle; no locale-dependent date functions anywhere near the
    * hash). The per-type share is a single double division, and the
    * peak flag (this cell is its type's busiest) is an integer
    * comparison via a max window over the 168-cell domain.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        expr(s"(${fdivSql("unix_timestamp(ts)", 86400)} + 4) % 7").as("dow"),
        expr(fdivSql("unix_timestamp(ts) % 86400", 3600)).as("hod"))
      .groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
    cells
      .withColumn("type_total", sum(col("n")).over(w))
      .withColumn("type_max", max(col("n")).over(w))
      .select(col("event_type"), col("dow"), col("hod"), col("n"),
        (col("n").cast("double") / col("type_total").cast("double")).as("share"),
        (col("n") === col("type_max")).as("is_peak"))
  }

  /** Week-over-week deltas: per (type, epoch-week) counts with the
    * previous observed week's count, the integer delta, and a
    * direction flag — the standard trend report. lag() runs over the
    * aggregated (type, week) frame (domain-bounded), never raw rows;
    * absent weeks are simply not observed (see [[gapfill]] for the
    * dense form).
    */
  def weekOverWeek(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr(fdivSql("unix_timestamp(ts)", 604800)).as("week"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("event_type"), col("week"), col("n"), col("prev_n"),
        (col("n") - col("prev_n")).as("delta"),
        coalesce(col("n") > col("prev_n"), lit(false)).as("is_up"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seasonality" -> seasonality,
    "q_wow" -> weekOverWeek,
    "q_transitions" -> transitions,
    "q_gapfill" -> gapfill,
    "q_concurrency" -> concurrency,
    "q_spike" -> spikes,
    "q_freshness" -> freshness,
    "q_range_frame" -> rangeFrame,
    "q_late_events" -> lateEvents,
    "q_funnel" -> funnel,
    "q_retention" -> retention,
    "q_tumbling_window" -> tumbling,
    "q_sliding_window" -> sliding,
    "q_session_window" -> sessionize,
    "q_dedup_events" -> dedupEvents
  )

  def oracles: Map[String, String] = Map(
    "q_seasonality" ->
      """WITH cells AS (
        |  SELECT event_type,
        |         CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) + 4) % 7
        |              AS BIGINT) AS dow,
        |         CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % 86400) // 3600
        |              AS BIGINT) AS hod,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2, 3
        |)
        |SELECT event_type, dow, hod, n,
        |       CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |         AS share,
        |       n = max(n) OVER (PARTITION BY event_type) AS is_peak
        |FROM cells""".stripMargin,
    "q_wow" ->
      """WITH weekly AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS week,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, week, n,
        |       lag(n) OVER w AS prev_n,
        |       n - lag(n) OVER w AS delta,
        |       COALESCE(n > lag(n) OVER w, FALSE) AS is_up
        |FROM weekly WINDOW w AS (PARTITION BY event_type ORDER BY week)""".stripMargin,
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |           AS next_type
        |  FROM events
        |), pairs AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        |), outs AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS out_total
        |  FROM pairs GROUP BY from_type
        |)
        |SELECT p.from_type, p.to_type, p.n, o.out_total,
        |       p.n * 2 > o.out_total AS is_majority
        |FROM pairs p JOIN outs o ON o.from_type = p.from_type""".stripMargin,
    "q_gapfill" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hr,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), span AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM hourly),
        |types AS (SELECT DISTINCT event_type FROM hourly),
        |grid AS (
        |  SELECT t.event_type, CAST(g.g AS BIGINT) AS hr
        |  FROM types t, span s,
        |       LATERAL (SELECT unnest(generate_series(s.h0, s.h1)) AS g) g
        |)
        |SELECT g.event_type, g.hr, CAST(coalesce(h.n, 0) AS BIGINT) AS n,
        |       h.n IS NULL AS is_gap
        |FROM grid g LEFT JOIN hourly h
        |  ON h.event_type = g.event_type AND h.hr = g.hr""".stripMargin,
    "q_concurrency" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t0
        |  FROM events
        |), edges AS (
        |  SELECT event_type, day, t0 AS t, 1 AS delta FROM ev
        |  UNION ALL SELECT event_type, day, t0 + 1800, -1 FROM ev
        |), sweep AS (
        |  SELECT event_type, day,
        |         sum(delta) OVER (PARTITION BY event_type, day ORDER BY t, delta
        |                          ROWS UNBOUNDED PRECEDING) AS open
        |  FROM edges
        |)
        |SELECT event_type, day, CAST(max(open) AS BIGINT) AS peak,
        |       CAST(count(*) // 2 AS BIGINT) AS n_events
        |FROM sweep GROUP BY event_type, day""".stripMargin,
    "q_spike" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hr,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), wins AS (
        |  SELECT event_type, hr, n,
        |         count(*) OVER w AS n_prev,
        |         coalesce(sum(n) OVER w, 0) AS sum_prev
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |               RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, hr, CAST(n AS BIGINT) AS n,
        |       CAST(n_prev AS BIGINT) AS n_prev,
        |       CAST(sum_prev AS BIGINT) AS sum_prev,
        |       (n_prev >= 6 AND n * n_prev > sum_prev * 3) AS is_spike
        |FROM wins""".stripMargin,
    "q_freshness" ->
      """WITH t AS (
        |  SELECT event_type, count(*) AS n, max(CAST(ts AS TIMESTAMP)) AS max_ts
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_type, n, max_ts,
        |       (max(epoch_us(max_ts)) OVER () - epoch_us(max_ts)) // 1000000 AS staleness_sec
        |FROM t""".stripMargin,
    "q_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       count(*) OVER w AS n_1h,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_late_events" ->
      """WITH m AS (
        |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
        |         max(CAST(ts AS TIMESTAMP)) OVER (
        |           ORDER BY event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events
        |), f AS (
        |  SELECT event_type,
        |         (hwm IS NOT NULL AND ts < hwm - INTERVAL 1 HOUR) AS is_late
        |  FROM m
        |)
        |SELECT event_type, count(*) AS n_total,
        |       CAST(sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       CAST(sum(CASE WHEN is_late THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
        |FROM f GROUP BY event_type""".stripMargin,
    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 // 604800 AS w FROM events
        |), cohort AS (
        |  SELECT user_id, min(w) AS cohort_w FROM ev GROUP BY user_id
        |)
        |SELECT c.cohort_w, e.w - c.cohort_w AS offset_w,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN cohort c ON c.user_id = e.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT v.user_id, v.t1, c.t2, p.t3,
        |       CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
        |                 WHEN c.t2 IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
        |FROM v
        |LEFT JOIN c ON c.user_id = v.user_id
        |LEFT JOIN p ON p.user_id = v.user_id""".stripMargin,
    "q_tumbling_window" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) AS win_start,
        |       time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP)) + INTERVAL 15 MINUTE AS win_end,
        |       event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_sliding_window" ->
      """SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) - k.k * INTERVAL 10 MINUTE AS win_start,
        |       time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) - k.k * INTERVAL 10 MINUTE + INTERVAL 30 MINUTE AS win_end,
        |       event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (VALUES (0), (1), (2)) AS k(k)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         -- strict >: an event at EXACTLY gap distance still merges
        |         -- (Spark session_window extends while event <= session end)
        |         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |                OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
        |), numbered AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM flagged
        |)
        |SELECT min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
        |       user_id, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sess_id""".stripMargin,
    "q_dedup_events" ->
      """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events
        |) e WHERE rn = 1""".stripMargin
  )
}
