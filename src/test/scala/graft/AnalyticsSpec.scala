package graft

import org.apache.spark.sql.functions._

/** Round-8 analytics additions: event-rate spike detection
  * (EventQueries.spikes), unigram-surprisal scoring
  * (TextAnalysisQueries.surprisal) and quality-aware dedup survivor
  * selection (DedupQueries.dedupBest). Each is pinned by a planted
  * case or an independent recomputation — the DuckDB oracles cover
  * the cross-engine hash, these cover the semantics.
  */
class AnalyticsSpec extends SparkSpec {

  private val T0 = 1704067200L // 2024-01-01 00:00:00 UTC, hour-aligned

  test("spikes flags a planted 10x burst after 24 quiet hours and respects the 6-hour warm-up gate") {
    import spark.implicits._
    // type "x": 1 event per hour for hours 0..23, then 10 in hour 24.
    // type "y": 1, then 9 in hour 1 — a huge ratio, but only 1 trailing
    // observed hour (< 6): the warm-up gate must hold it back.
    val rows =
      (0 until 24).map(h => (T0 + h * 3600L, "x")) ++
        Seq.fill(10)((T0 + 24 * 3600L, "x")) ++
        Seq((T0, "y")) ++ Seq.fill(9)((T0 + 3600L, "y"))
    val ev = rows.toDF("sec", "event_type")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val got = graft.operators.EventQueries.spikesOf(ev)
    val xs = got.filter(col("event_type") === "x" && col("is_spike")).collect()
    assert(xs.length == 1)
    val s = xs.head
    assert(s.getAs[Long]("hr") == T0 / 3600L + 24 &&
      s.getAs[Long]("n") == 10L &&
      s.getAs[Long]("n_prev") == 24L &&
      s.getAs[Long]("sum_prev") == 24L)
    // 10 * 24 > 3 * 24 fired; y's 9x burst must NOT (n_prev = 1 < 6)
    assert(got.filter(col("event_type") === "y" && col("is_spike")).count() == 0)
  }

  test("spikes trailing frame is [-24h, -1h]: an event 25 hours back has aged out") {
    import spark.implicits._
    // quiet hour at h=0, then nothing until h=25..30 (6 observed
    // hours at 1/hour), burst at h=31: the h=0 event is OUTSIDE the
    // trailing 24 — n_prev must count only hours 25..30
    val rows = Seq((0, 1)) ++ (25 to 30).map(h => (h, 1)) ++ Seq((31, 7))
    val ev = rows.flatMap { case (h, n) => Seq.fill(n)(T0 + h * 3600L) }
      .toDF("sec").withColumn("ts", expr("timestamp_seconds(sec)"))
      .withColumn("event_type", lit("z"))
    val got = graft.operators.EventQueries.spikesOf(ev)
      .filter(col("hr") === T0 / 3600L + 31).head()
    assert(got.getAs[Long]("n_prev") == 6L && got.getAs[Long]("sum_prev") == 6L)
    assert(got.getAs[Boolean]("is_spike")) // 7 * 6 > 3 * 6
  }

  test("gapfill span guard: a 50-year outlier timestamp fails loudly; in-bound spans fill densely") {
    import spark.implicits._
    // in-bound: 3 types over a 48-hour span → dense 49-cell grids
    val ok = Seq(("a", 0L), ("a", 48L), ("b", 10L), ("c", 0L), ("c", 1L))
      .map { case (t, h) => (t, T0 + h * 3600L) }
      .toDF("event_type", "sec").withColumn("ts", expr("timestamp_seconds(sec)"))
    val dense = graft.operators.EventQueries.gapfillOf(ok)
    assert(dense.filter(col("event_type") === "a").count() == 49)
    assert(dense.filter(col("event_type") === "a" && col("is_gap")).count() == 47)
    // poisoned: one timestamp 50 years out — the grid would be ~438k
    // cells PER TYPE; the guard must fail the job, not materialize it
    val poisoned = ok.union(Seq(("a", T0 + 50L * 365 * 86400L))
      .toDF("event_type", "sec").withColumn("ts", expr("timestamp_seconds(sec)")))
    val e = intercept[Exception] {
      graft.operators.EventQueries.gapfillOf(poisoned).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("gapfill span exceeds")),
      s"wrong failure: ${e.getMessage}")
  }

  test("seasonality cells partition the corpus and flag each type's busiest cell") {
    val got = graft.operators.EventQueries.seasonality(spark, sf0001)
    assert(got.agg(sum("n")).head().getLong(0) == Tables.events(spark, sf0001).count())
    // dow/hod stay on the calendar grid
    assert(got.filter(col("dow") < 0 || col("dow") > 6 ||
      col("hod") < 0 || col("hod") > 23).count() == 0)
    // every type has at least one peak cell, and peaks carry the type max
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type")
    val bad = got.withColumn("mx", max("n").over(w))
      .filter((col("is_peak") && col("n") =!= col("mx")) ||
        (!col("is_peak") && col("n") === col("mx")))
    assert(bad.count() == 0)
  }

  test("week-over-week deltas are the exact lag differences") {
    val got = graft.operators.EventQueries.weekOverWeek(spark, sf0001)
    assert(got.filter(col("prev_n").isNotNull &&
      (col("delta") =!= col("n") - col("prev_n") ||
        col("is_up") =!= (col("n") > col("prev_n")))).count() == 0)
    // exactly one first (prev-less) week per type
    assert(got.filter(col("prev_n").isNull).count() ==
      got.select("event_type").distinct().count())
  }

  test("gapfill produces the complete dense grid and preserves observed counts") {
    val got = graft.operators.EventQueries.gapfill(spark, sf0001)
    val hourly = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), expr("unix_timestamp(ts) DIV 3600").as("hr"))
      .agg(count(lit(1)).as("want_n"))
    val span = hourly.agg((max("hr") - min("hr") + 1).as("hours")).head().getLong(0)
    val nTypes = hourly.select("event_type").distinct().count()
    // dense: every (type, hour-in-span) present exactly once
    assert(got.count() == span * nTypes)
    assert(got.select("event_type", "hr").distinct().count() == got.count())
    // observed hours keep their counts; gaps are exactly the zero rows
    val joined = got.join(hourly, Seq("event_type", "hr"), "left")
    assert(joined.filter(col("want_n").isNotNull &&
      (col("n") =!= col("want_n") || col("is_gap"))).count() == 0)
    assert(joined.filter(col("want_n").isNull &&
      (col("n") =!= 0L || !col("is_gap"))).count() == 0)
  }

  test("concurrency sweep: planted overlaps peak correctly and a touching boundary does not overlap") {
    import spark.implicits._
    // type "a": three intervals all open at minute 10 -> peak 3;
    // type "b": second event starts EXACTLY at the first's end
    // (half-open [t, t+30min)) -> peak stays 1
    val rows = Seq(
      ("a", 0L), ("a", 5L), ("a", 10L),
      ("b", 0L), ("b", 30L))
    val ev = rows.toDF("event_type", "m")
      .withColumn("ts", expr(s"timestamp_seconds($T0 + m * 60)"))
    val got = graft.operators.EventQueries.concurrencyOf(ev)
    val a = got.filter(col("event_type") === "a").head()
    assert(a.getAs[Long]("peak") == 3L && a.getAs[Long]("n_events") == 3L)
    val b = got.filter(col("event_type") === "b").head()
    assert(b.getAs[Long]("peak") == 1L && b.getAs[Long]("n_events") == 2L)
  }

  test("two-phase concurrency sweep equals the naive one-window sweep on the fixture") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf0001)
    val got = graft.operators.EventQueries.concurrencyOf(ev)
    // the naive day-wide window form the two-phase decomposition replaces
    val edges = ev
      .select(col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("day"),
        expr("unix_timestamp(ts)").as("t0"))
      .select(col("event_type"), col("day"),
        explode(array(
          struct(col("t0").as("t"), lit(1).as("delta")),
          struct((col("t0") + 1800L).as("t"), lit(-1).as("delta")))).as("e"))
      .select(col("event_type"), col("day"), col("e.t"), col("e.delta"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = edges.withColumn("open", sum(col("delta")).over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("open")).as("peak"), expr("count(1) DIV 2").as("n_events"))
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("surprisal bit-lengths are exact: token counts reconcile and rarer tokens score strictly higher") {
    val got = graft.operators.TextAnalysisQueries.surprisal(spark, sf0001)
    // per-doc token mass reconciles with an independent direct count
    val totGot = got.agg(sum("n_toks")).head().getLong(0)
    val totWant = Tables.documents(spark, sf0001)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(totGot == totWant)
    // every token carries >= 1 bit, and the mean is the exact integer
    // milli-bit floor of sum_bits / n_toks
    val bad = got.filter(col("sum_bits") < col("n_toks") ||
      col("mean_millibits") =!= expr("(sum_bits * 1000) DIV n_toks")).count()
    assert(bad == 0)
    // ordering sanity on the model itself: a corpus-unique token's
    // surprisal (bits of total/1) strictly exceeds a stopword's
    val tf = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum("cnt")).head().getLong(0)
    val maxCnt = tf.agg(max("cnt")).head().getLong(0)
    // the strict-ordering check is only meaningful when some token
    // repeats: maxCnt >= 2 GUARANTEES a bit-length drop (floor(x/2)
    // has exactly bitLen(x)-1 bits), so with this precondition the
    // assertion tests the model, not the fixture shape (r8 ADVICE).
    assume(maxCnt >= 2,
      s"fixture has no repeated token; ordering check vacuous (maxCnt=$maxCnt)")
    assert(java.lang.Long.toBinaryString(total / 1L).length >
      java.lang.Long.toBinaryString(total / maxCnt).length)
  }

  test("domainStats counts reconcile with the corpus, the quality gate and the cluster labels") {
    val got = graft.operators.CurationQueries.domainStats(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
    // partition of the corpus: per-source doc counts sum to the corpus
    assert(got.agg(sum("n_docs")).head().getLong(0) == docs.count())
    // flags are subsets and fractions are the exact integer ratios
    val bad = got.filter(col("n_quality_ok") > col("n_docs") ||
      col("n_near_dup") > col("n_docs") || col("n_langs") < 1 ||
      col("dup_frac") =!= col("n_near_dup").cast("double") / col("n_docs").cast("double") ||
      col("quality_frac") =!= col("n_quality_ok").cast("double") / col("n_docs").cast("double"))
    assert(bad.count() == 0)
    // near-dup mass reconciles with the shared cluster labels
    val wantDups = graft.operators.DedupQueries.dedupClusters(spark, sf0001)
      .filter(col("cluster_id") =!= col("doc_id")).count()
    assert(got.agg(sum("n_near_dup")).head().getLong(0) == wantDups)
  }

  test("triplets: one per positive pair, negative from the pool and never a pair member") {
    val pairs = graft.operators.DedupQueries.dedupMinhash(spark, sf0001)
    val got = graft.operators.DedupQueries.triplets(spark, sf0001)
    // exactly one triplet per verified near-dup pair
    assert(got.count() == pairs.count())
    assert(got.select("anchor_doc", "pos_doc").distinct().count() == got.count())
    // the negative is neither pair member
    assert(got.filter(col("neg_doc") === col("anchor_doc") ||
      col("neg_doc") === col("pos_doc")).count() == 0)
    // and comes from the deterministic 64-doc md5 pool
    val pool = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        md5(concat(lit("neg:"), col("doc_id").cast("string"))).as("ch"))
      .orderBy("ch", "doc_id").limit(64).select("doc_id")
    assert(got.join(pool, got("neg_doc") === pool("doc_id"), "left_anti").count() == 0)
  }

  test("dedupBest keeps the longest doc per cluster, ties to the smallest id") {
    val clusters = graft.operators.DedupQueries.dedupClusters(spark, sf0001)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    val got = graft.operators.DedupQueries.dedupBest(spark, sf0001)
    // independent recomputation via a sort window instead of the
    // struct-max aggregate
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val want = clusters.join(docs, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("n_docs"),
        col("doc_id").as("kept_doc_id"), col("n_chars").as("kept_chars"))
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
    // the survivor really is a member of its own cluster
    val orphan = got.join(clusters,
      got("kept_doc_id") === clusters("doc_id") &&
        got("cluster_id") === clusters("cluster_id"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("bpe pair counts weight in-word adjacency by word frequency and cut deterministically") {
    import spark.implicits._
    // "ab" x3 (one per doc 1-2, once in doc 3), "abc" x1, "a" x1 (no
    // pair: length < 2), "bc" x1. Expected freq-weighted pairs:
    // (a,b) = 3 [ab] + 1 [abc] = 4, (b,c) = 1 [abc] + 1 [bc] = 2.
    val docs = Seq(
      (1L, "ab a"),
      (2L, "ab"),
      (3L, "ab abc bc")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysisQueries.bpePairsOf(docs)
      .select("lhs", "rhs", "pair_count").as[(String, String, Long)].collect().toList
    assert(got === List(("a", "b", 4L), ("b", "c", 2L)))
  }
}
