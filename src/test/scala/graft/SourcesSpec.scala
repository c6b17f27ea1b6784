package graft

import graft.sources.PaginatedSource
import graft.pipeline.{Parse, Upsert}

/** Source layer: pagination termination, retry/backoff, parallel keyed
  * fetch, empty-result policy — plus one end-to-end pipeline slice
  * (fetch -> parse -> upsert) mirroring the reference's per-brand
  * stage dataflow (etl.py:34-57).
  */
class SourcesSpec extends SparkSpec {

  private def page(i: Int, of: Long, size: Int = 2): (Seq[String], Long) = {
    val recs = (0 until size).map(j => s"""{"n": ${i * 10 + j}}""")
    (recs, of)
  }

  test("fetchPages walks pages until total_count is covered (wdn_api.py:126-135)") {
    var calls = 0
    val df = PaginatedSource.fetchPages(spark,
      fetch = i => { calls += 1; page(i, of = 5) }, pageSize = 2)
    assert(calls == 3)          // ceil(5/2) pages
    assert(df.count() == 6)     // 3 pages x 2 records
  }

  test("fetchPages stops on an empty first page (wdn_api.py:124-125)") {
    val df = PaginatedSource.fetchPages(spark, fetch = _ => (Nil, 0L), pageSize = 10)
    assert(df.count() == 0)
  }

  test("fetchPages fires the per-page callback eagerly (T3, wdn_api.py:121-122)") {
    val seen = Seq.newBuilder[Int]
    PaginatedSource.fetchPages(spark,
      fetch = i => page(i, of = 4), pageSize = 2,
      onPage = recs => seen += recs.size)
    assert(seen.result() == Seq(2, 2))
  }

  test("withRetry retries with exponential backoff and caps the delay (T6)") {
    var attempts = 0
    val delays = Seq.newBuilder[Long]
    val out = PaginatedSource.withRetry(
      tries = 5, delayMs = 10, backoff = 2.0, maxDelayMs = 30,
      sleep = delays += _) {
      attempts += 1
      if (attempts < 4) sys.error("flaky") else "ok"
    }
    assert(out == "ok" && attempts == 4)
    assert(delays.result() == Seq(10, 20, 30)) // doubled then capped
  }

  test("withRetry gives up after max tries") {
    var attempts = 0
    intercept[RuntimeException] {
      PaginatedSource.withRetry(tries = 3, delayMs = 1, sleep = _ => ()) {
        attempts += 1; sys.error("always down")
      }
    }
    assert(attempts == 3)
  }

  test("fetchByIds fans out over executors and drops empty payloads (T4)") {
    val df = PaginatedSource.fetchByIds(spark, 1L to 20L,
      fetch = id => if (id % 4 == 0) None else Some(s"""{"id": $id}"""),
      parallelism = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 15) // multiples of 4 dropped -> refetched next run
  }

  test("searchExact raises on no match (F10, wdn_api.py:28-29)") {
    import spark.implicits._
    val df = Seq("Nike", "Adidas").toDF("name")
    assert(PaginatedSource.searchExact(df, "name", "NIKE").getString(0) == "Nike")
    intercept[NoSuchElementException] {
      PaginatedSource.searchExact(df, "name", "Reebok")
    }
  }

  test("DSv2 paginated source: pages fetched once, executor-side, across partitions") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .option("maxPartitions", "4")
      .load()
    // 10 records / pageSize 3 -> 4 pages over 4 partitions
    assert(df.rdd.getNumPartitions == 4)
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(rows.map(_._2) == (0 until 10).map(i => s"""{"id": $i}"""))
    assert(rows.map(_._1).distinct == Seq(1, 2, 3, 4))
    // Spark plans a fresh DSv2 scan per action (like file listing):
    // getNumPartitions and collect each probe page 1 once; the collect
    // then reads pages 2..4 executor-side with page 1 seeded by its
    // probe. Every DATA page is fetched exactly once per action.
    assert(FakePagesTransport.fetchCalls.get() == 5)
  }

  test("DSv2 paginated source: flaky transport recovers via bounded retry (S3)") {
    FakePagesTransport.reset()
    FakePagesTransport.failFirst.set(2) // first two fetch calls throw
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "5")
      .option("retryDelayMs", "1")
      .load()
    assert(df.count() == 10)
  }

  test("DSv2 paginated source: total_count shrinking mid-scan fails loudly, never truncates silently") {
    // The reference's meta.page envelope drives termination
    // (wdn_api.py:126-135): its sequential loop stops at the first
    // empty page. Parallel range readers cannot reproduce that without
    // leaving silent page GAPS (a later partition would still emit),
    // so the pinned rule is fail-loud when a planned page comes back
    // empty — the probe saw 10 records, pages 2+ see a source shrunk
    // to 3.
    FakePagesTransport.reset()
    FakePagesTransport.shrinkAfterProbe.set(3)
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .option("retryDelayMs", "1")
      .option("retryTries", "2")
      .load()
    val e = intercept[Exception](df.collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("shrank mid-scan"))),
      s"expected the loud shrink failure, got: $e")
  }

  test("DSv2 paginated source: empty source plans zero partitions") {
    FakePagesTransport.reset()
    FakePagesTransport.total.set(0)
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    assert(df.count() == 0)
  }

  test("DSv2 paginated source: LIMIT pushes down to a page cap (fewer pages fetched)") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    // 10 records / pageSize 3 -> 4 pages; LIMIT 3 needs ceil(3/3) = 1
    // page, which the driver probe already fetched and seeded — the
    // scan must fetch NOTHING beyond the probe
    val rows = df.limit(3).collect()
    assert(rows.length == 3)
    assert(FakePagesTransport.fetchCalls.get() == 1,
      s"expected probe-only (1 fetch), got ${FakePagesTransport.fetchCalls.get()}")
  }

  test("DSv2 paginated source: page-range predicate prunes fetched pages") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    // pages 3..4 of 4: probe (1) + two data fetches = 3 calls, and the
    // residual filter still applies on the emitted page column
    val rows = df.filter(org.apache.spark.sql.functions.col("page") >= 3).collect()
    assert(rows.map(_.getInt(0)).toSet == Set(3, 4))
    assert(rows.length == 4) // records 6..8 on page 3, record 9 on page 4
    assert(FakePagesTransport.fetchCalls.get() == 3,
      s"expected 3 fetches (probe + pages 3,4), got ${FakePagesTransport.fetchCalls.get()}")
  }

  test("DSv2 paginated source: page equality fetches exactly that page") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    val rows = df.filter(org.apache.spark.sql.functions.col("page") === 2).collect()
    assert(rows.length == 3 && rows.forall(_.getInt(0) == 2))
    assert(FakePagesTransport.fetchCalls.get() == 2,
      s"expected 2 fetches (probe + page 2), got ${FakePagesTransport.fetchCalls.get()}")
  }

  test("DSv2 paginated source: column pruning reaches the scan (pruned read schema)") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    val proj = df.select(org.apache.spark.sql.functions.col("page"))
    // the scan itself must carry the pruned schema, not prune post-scan
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[page]"), s"scan not pruned:\n$plan")
    assert(proj.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4))
    // an empty projection (count) is legal too, and row counts survive
    assert(df.count() == 10)
  }

  test("DSv2 paginated source: page bound at Int.MaxValue clamps instead of wrapping") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    // page > Int.MaxValue: the old i+1 wrapped to Int.MinValue and
    // silently disabled pruning (all 4 data pages fetched, residual
    // saved the result); clamped arithmetic prunes to probe-only
    val rows = df.filter(org.apache.spark.sql.functions.col("page") > Int.MaxValue).collect()
    assert(rows.isEmpty)
    assert(FakePagesTransport.fetchCalls.get() == 1,
      s"expected probe-only (1 fetch), got ${FakePagesTransport.fetchCalls.get()}")
  }

  test("DSv2 paginated source: provably-empty pushed range skips even the driver probe") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    // page < 1 is empty BEFORE count discovery: zero transport calls
    val rows = df.filter(org.apache.spark.sql.functions.col("page") < 1).collect()
    assert(rows.isEmpty)
    assert(FakePagesTransport.fetchCalls.get() == 0,
      s"expected zero fetches, got ${FakePagesTransport.fetchCalls.get()}")
  }

  test("DSv2 paginated source: plain count(*) pushes down to the probe's total_count") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    val agg = df.groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[COUNT(*)]"), s"aggregate not pushed:\n$plan")
    // rendering the plan above planned one scan (one probe) of its own;
    // count it separately so the action's fetch bill is exact
    FakePagesTransport.reset()
    assert(agg.head().getLong(0) == 10)
    // ONE driver probe for total_count; no data page ever fetched
    assert(FakePagesTransport.fetchCalls.get() == 1,
      s"expected probe-only (1 fetch), got ${FakePagesTransport.fetchCalls.get()}")
    // df.count() takes the same path
    FakePagesTransport.reset()
    assert(df.count() == 10)
    assert(FakePagesTransport.fetchCalls.get() == 1)
  }

  test("DSv2 paginated source: count under a page filter does NOT use total_count") {
    FakePagesTransport.reset()
    val df = spark.read.format("graft-pages")
      .option("transportClass", classOf[FakePagesTransport].getName)
      .option("pageSize", "3")
      .load()
    // a pushed page range changes which rows survive — total_count
    // can't answer for the subset, so the scan must fetch the pages
    val n = df.filter(org.apache.spark.sql.functions.col("page") >= 3).count()
    assert(n == 4) // pages 3 (3 records) + 4 (1 record)
    assert(FakePagesTransport.fetchCalls.get() >= 2,
      "page-filtered count must fetch the surviving pages, not shortcut via total_count")
  }

  test("end-to-end stage: fetch -> parse -> upsert (etl.py per-brand dataflow)") {
    val json = (id: Long) =>
      s"""{"data": [{"id": "$id", "attributes": {"name": "R$id", "website": "r$id.com"}}],
         |"meta": {"page": {"total_count": 1, "current_page": 1}}}""".stripMargin
    val fetched = PaginatedSource.fetchByIds(spark, 1L to 6L, id => Some(json(id)), 2)
    val parsed = Parse.parseRetailers(fetched, "payload", fixedClock)
    val sink0 = parsed.filter(org.apache.spark.sql.functions.col("id") <= 3)
    val merged = Upsert(sink0, parsed, Seq("id"))
    assert(merged.count() == 6)
    // re-run converges (T1+T2 crash-restart semantics)
    val again = Upsert(merged, parsed, Seq("id"))
    assert(again.orderBy("id").collect().toSeq == merged.orderBy("id").collect().toSeq)
  }
}

/** Deterministic in-JVM transport for the DSv2 paginated source tests.
  * No-arg constructor + static counters: the source instantiates it by
  * class name (driver probe and each reader), and local-mode executors
  * share the JVM, so call counts are observable from the test.
  */
class FakePagesTransport extends graft.sources.PageTransport {
  private var pageSize = 0
  override def init(options: Map[String, String]): Unit =
    pageSize = options("pagesize").toInt
  override def fetch(page: Int): (Seq[String], Long) = {
    if (FakePagesTransport.failFirst.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("transient transport failure")
    val call = FakePagesTransport.fetchCalls.incrementAndGet()
    val total = FakePagesTransport.total.get()
    val from = (page - 1).toLong * pageSize
    val recs = (from until math.min(from + pageSize, total)).map(i => s"""{"id": $i}""")
    // simulate the source shrinking UNDER a planned scan: the driver
    // probe (call 1) sees the full total_count, every later fetch sees
    // the shrunken one
    val shrink = FakePagesTransport.shrinkAfterProbe.get()
    if (call == 1 && shrink >= 0) FakePagesTransport.total.set(shrink)
    (recs, total)
  }
}

object FakePagesTransport {
  val fetchCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val failFirst = new java.util.concurrent.atomic.AtomicInteger(0)
  val total = new java.util.concurrent.atomic.AtomicLong(10)
  val shrinkAfterProbe = new java.util.concurrent.atomic.AtomicLong(-1)
  def reset(): Unit = {
    fetchCalls.set(0); failFirst.set(0); total.set(10); shrinkAfterProbe.set(-1)
  }
}
