package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{IncrementalFilter, Parse, Upsert}

/** Unit tests for the pipeline layer, covering the fixture cases of
  * FIXTURES.md §B (anti-join recency, upsert semantics, JSON:API
  * parse).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // ===== IncrementalFilter (F2/J3/T1, etl.py:14-20) =====

  test("incremental filter drops recent keys case-insensitively") {
    val candidates = Seq("Nike", "Adidas", "VANS", "Converse").toDF("name")
    val recent = Seq("nike", "vans").toDF("name")
    val out = IncrementalFilter(candidates, recent, "name", "name").as[String].collect().sorted
    assert(out.toSeq == Seq("Adidas", "Converse"))
  }

  test("incremental filter dedups candidates (set semantics, etl.py:20)") {
    val candidates = Seq("A", "A", "B").toDF("name")
    val recent = Seq.empty[String].toDF("name")
    assert(IncrementalFilter(candidates, recent, "name", "name").count() == 2)
  }

  test("incremental filter with empty recent set keeps all distinct candidates") {
    val candidates = Seq(1, 2, 3).toDF("id")
    val recent = Seq.empty[Int].toDF("id")
    assert(IncrementalFilter(candidates, recent, "id", "id", caseInsensitive = false).count() == 3)
  }

  test("recency watermark is strictly greater-than (etl.py:15)") {
    val sink = Seq(
      (1, java.sql.Timestamp.valueOf("2024-06-01 12:00:00")),
      (2, java.sql.Timestamp.valueOf("2024-06-01 12:00:01"))).toDF("id", "updated_at")
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
    val recent = IncrementalFilter.recent(sink, "updated_at", cutoff)
    assert(recent.select("id").as[Int].collect().toSeq == Seq(2))
  }

  // ===== Upsert (K1/T2, db.py:51-67) =====

  private val base = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("id", "s", "v")

  test("upsert inserts new PKs and overwrites existing wholesale") {
    val updates = Seq((2, "B2", 99.0), (3, "c", 30.0)).toDF("id", "s", "v")
    val out = Upsert(base, updates, Seq("id")).orderBy("id")
      .as[(Int, String, Double)].collect().toSeq
    assert(out == Seq((1, "a", 10.0), (2, "B2", 99.0), (3, "c", 30.0)))
  }

  test("upsert is idempotent (T2: at-least-once + idempotent = effectively-once)") {
    val updates = Seq((2, "B2", 99.0)).toDF("id", "s", "v")
    val once = Upsert(base, updates, Seq("id"))
    val twice = Upsert(once, updates, Seq("id"))
    assert(twice.orderBy("id").collect().toSeq == once.orderBy("id").collect().toSeq)
  }

  test("upsert leaves absent PKs absent (T4: absence is not knowledge)") {
    val updates = Seq.empty[(Int, String, Double)].toDF("id", "s", "v")
    assert(Upsert(base, updates, Seq("id")).count() == 2)
  }

  test("applyAll: later batches win over earlier ones (T3 eager commits)") {
    val b1 = Seq((1, "x1", 1.0)).toDF("id", "s", "v")
    val b2 = Seq((1, "x2", 2.0)).toDF("id", "s", "v")
    val out = Upsert.applyAll(base, Seq(b1, b2), Seq("id"))
      .filter($"id" === 1).as[(Int, String, Double)].collect().toSeq
    assert(out == Seq((1, "x2", 2.0)))
  }

  test("upsert picks a deterministic winner for duplicate PKs within one batch") {
    val dupes = Seq((2, "zz", 1.0), (2, "aa", 2.0)).toDF("id", "s", "v")
    val out1 = Upsert(base, dupes, Seq("id")).filter($"id" === 2)
      .as[(Int, String, Double)].collect().toSeq
    val out2 = Upsert(base, dupes.orderBy($"v".desc), Seq("id")).filter($"id" === 2)
      .as[(Int, String, Double)].collect().toSeq
    assert(out1 == out2)                     // input order irrelevant
    assert(out1 == Seq((2, "aa", 2.0)))      // non-PK-column ordering decides
  }

  test("version-column upsert: highest version wins among duplicate PKs") {
    val base = Seq((1, "old", 1L)).toDF("id", "v", "ver")
    val dupes = Seq((1, "mid", 5L), (1, "new", 9L), (2, "x", 3L)).toDF("id", "v", "ver")
    val out = Upsert(base, dupes, Seq("id"), versionCol = "ver").orderBy("id")
      .as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "new", 9L), (2, "x", 3L)))
    // a STALE redelivery can never clobber newer sink state — the
    // version outranks source priority, which is what makes
    // out-of-order at-least-once delivery effectively-once
    val stale = Seq((1, "older", 0L)).toDF("id", "v", "ver")
    val out2 = Upsert(out.toDF("id", "v", "ver"), stale, Seq("id"), versionCol = "ver")
      .filter($"id" === 1).as[(Int, String, Long)].head()
    assert(out2 == ((1, "new", 9L)))
    // version-aware in-batch dedup picks the same winner the merge does
    val kept = Upsert.dedupeByPk(dupes, Seq("id"), versionCol = "ver")
      .filter($"id" === 1).as[(Int, String, Long)].head()
    assert(kept == ((1, "new", 9L)))
  }

  test("upsert supports composite PKs") {
    val b = Seq((1, "us", 10.0), (1, "eu", 11.0)).toDF("id", "region", "v")
    val u = Seq((1, "eu", 99.0)).toDF("id", "region", "v")
    val out = Upsert(b, u, Seq("id", "region")).orderBy("region")
      .as[(Int, String, Double)].collect().toSeq
    assert(out == Seq((1, "eu", 99.0), (1, "us", 10.0)))
  }

  // ===== JdbcSink (K1 against an RDBMS target, db.py:51-67) =====

  test("JDBC sink upserts via staging + MERGE against embedded Derby") {
    import graft.pipeline.JdbcSink
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    System.setProperty("derby.system.home", dbDir) // keep derby.log out of the repo
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val opts = Map(
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      // Derby maps Spark strings to CLOB, which it refuses to compare;
      // the text column must be an explicit VARCHAR
      "createTableColumnTypes" -> "name VARCHAR(64)")

    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
    JdbcSink.upsert(base, url, "sink_t", Seq("id"), opts)
    // overwrite PK 2 wholesale, insert PK 3 — delivered twice in-batch
    val updates = Seq((2L, "B2", 21.0), (3L, "c", 30.0), (3L, "c0", 29.0))
      .toDF("id", "name", "v")
    JdbcSink.upsert(updates, url, "sink_t", Seq("id"), opts)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "sink_t")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load().orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    // same semantics as the DataFrame-side Upsert: last writer wins
    // wholesale, absent PKs stay, in-batch duplicates collapse to the
    // deterministic tiebreak winner (name "c" < "c0")
    assert(back == Seq((1L, "a", 10.0), (2L, "B2", 21.0), (3L, "c", 30.0)))
    // staging table must not survive the merge
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%STAGING%", null)
      assert(!rs.next(), "staging table left behind")
    } finally conn.close()
  }

  // ===== Parse (P1-P6, db.py:79-158) =====

  private val offerJson =
    """{"data": [
      |  {"id": "off-1", "attributes": {"product_id": "11", "retailer_id": "7",
      |    "original_currency": "USD", "price_usd": "129.99", "price_gbp": "99.50",
      |    "price_eur": "119.00"}},
      |  {"id": "off-2", "attributes": {"product_id": "12", "retailer_id": "8",
      |    "original_currency": "EUR", "price_usd": "89.00", "price_gbp": "70.10",
      |    "price_eur": "82.35"}}
      |], "meta": {"page": {"total_count": 2, "current_page": 1}}}""".stripMargin

  test("parseOffers: string PK, int FK casts, exact decimal prices (db.py:99-112)") {
    val out = Parse.parseOffers(Seq(offerJson).toDF("payload"), "payload", fixedClock)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getString(0) == "off-1")
    assert(r.getInt(1) == 11 && r.getInt(2) == 7)
    assert(r.getDecimal(4) == new java.math.BigDecimal("129.99"))
    assert(out.schema("price_usd").dataType.typeName == "decimal(18,2)")
    assert(r.getTimestamp(7) == java.sql.Timestamp.valueOf("2024-06-01 12:00:00"))
  }

  test("parseProducts injects constant brand_id (P5, wdn_api.py:32-36)") {
    val json =
      """{"data": [{"id": "5", "attributes": {"name": "Air", "description": "d",
        |"release_at": "2024-01-02 00:00:00", "brand_names": "Nike, Jordan"}}],
        |"meta": {"page": {"total_count": 1, "current_page": 1}}}""".stripMargin
    val out = Parse.parseProducts(Seq(json).toDF("payload"), "payload", brandId = 42, fixedClock)
    val r = out.collect().head
    assert(r.getInt(0) == 5 && r.getInt(1) == 42)
    assert(r.getTimestamp(4) == java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
  }

  test("flattenEnvelope yields zero rows for empty data (T4, wdn_api.py:81-87)") {
    val json = """{"data": [], "meta": {"page": {"total_count": 0, "current_page": 1}}}"""
    assert(Parse.parseBrands(Seq(json).toDF("payload"), "payload", fixedClock).count() == 0)
  }

  test("parseRetailers flattens one nesting level and casts id (P1, db.py:79-85)") {
    val json =
      """{"data": [{"id": "9", "attributes": {"name": "FootLocker", "website": "fl.com"}}],
        |"meta": {"page": {"total_count": 1, "current_page": 1}}}""".stripMargin
    val out = Parse.parseRetailers(Seq(json).toDF("payload"), "payload", fixedClock)
    val r = out.collect().head
    assert(r.getInt(0) == 9 && r.getString(1) == "FootLocker" && r.getString(2) == "fl.com")
  }

  test("SCD2 history: intervals chain per key, one current row, asOf picks the right version") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val log = Seq(
      (1L, 10L, "a", "2024-01-01 00:00:00"),
      (1L, 11L, "b", "2024-02-01 00:00:00"),
      (1L, 12L, "c", "2024-03-01 00:00:00"),
      (2L, 20L, "x", "2024-01-15 00:00:00"),
      // same-timestamp tie on key 3: seq column must decide
      (3L, 30L, "p", "2024-01-01 00:00:00"),
      (3L, 31L, "q", "2024-01-01 00:00:00")
    ).toDF("k", "sq", "v", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val hist = graft.pipeline.Scd2.fromChangeLog(log, "k", "ts", "sq").cache()
    // exactly one current row per key
    assert(hist.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(hist.filter(col("is_current")).count() == 3)
    // intervals chain: each non-final row's valid_to = next row's valid_from
    val w = Window.partitionBy("k").orderBy(col("ts"), col("sq"))
    val broken = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
    assert(broken.count() == 0)
    // the tie on key 3 is ordered by the sequence column
    val k3 = hist.filter(col("k") === 3 && col("is_current")).collect().head
    assert(k3.getAs[Long]("sq") == 31L)
    // point-in-time readback: mid-February sees key 1's version "b"
    val at = graft.pipeline.Scd2.asOf(hist, lit("2024-02-15 00:00:00").cast("timestamp"))
    val v1 = at.filter(col("k") === 1).collect()
    assert(v1.length == 1 && v1.head.getAs[String]("v") == "b")
    hist.unpersist()
  }

  test("cdc merge: last writer wins, trailing tombstone deletes, same-ts ties break on event_id") {
    // u1: update then tombstone LAST -> vanishes entirely
    // u2: tombstone then a LATER update -> survives with the update
    // u3: two versions at the SAME ts -> higher event_id wins
    val log = Seq(
      (1L, 1000L, 10L, "view", 1.0),
      (2L, 2000L, 10L, "error", 0.0),
      (3L, 1000L, 20L, "error", 0.0),
      (4L, 2000L, 20L, "purchase", 5.0),
      (5L, 1000L, 30L, "click", 2.0),
      (6L, 1000L, 30L, "view", 3.0)
    ).toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
    val got = graft.operators.PipelineQueries.cdcMergeOf(log)
      .select("user_id", "last_op", "last_value")
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((20L, "purchase", 5.0), (30L, "view", 3.0)))
  }
}
