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
