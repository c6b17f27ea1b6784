package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left row") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2")).toDF("k", "t", "name")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 13:00:00"), 120.0)).toDF("k", "qt", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("price"))
      .orderBy("t").select("name", "asof_price").as[(String, Double)].collect().toSeq
    assert(out == Seq(("p1", 100.0), ("p2", 110.0)))
  }

  test("as-of join includes an exact-timestamp tie (<= semantics, like DuckDB ASOF)") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 99.0)).toDF("k", "qt", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("price"))
    assert(out.select("asof_price").head().getDouble(0) == 99.0)
  }

  test("as-of join keeps unmatched left rows with null payload (left semantics)") {
    val probes = Seq((1L, ts("2024-01-01 08:00:00"), "early")).toDF("k", "t", "name")
    val quotes = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "qt", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("price"))
    assert(out.count() == 1)
    assert(out.select("asof_price").head().isNullAt(0))
  }

  test("as-of join never matches across keys") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val quotes = Seq((2L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "qt", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("price"))
    assert(out.select("asof_price").head().isNullAt(0))
  }

  test("forward as-of picks the earliest right row at-or-after each left row") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (1L, ts("2024-01-01 14:00:00"), "p3")).toDF("k", "t", "name")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 90.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 13:00:00"), 130.0)).toDF("k", "qt", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("price"), forward = true)
      .orderBy("t").select("name", "asof_price").collect().toSeq
    assert(out(0).getDouble(1) == 110.0) // p1 -> 11:00
    assert(out(1).getDouble(1) == 130.0) // p2 -> 13:00
    assert(out(2).isNullAt(1))           // p3: nothing after
  }

  test("forward as-of matches an exact-timestamp tie and breaks right dups by SMALLEST tiebreak") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 70.0),
      (1L, ts("2024-01-01 10:00:00"), 3L, 30.0)).toDF("k", "qt", "qid", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("qid", "price"),
      tiebreak = Some("qid"), forward = true)
    val row = out.select("asof_qid", "asof_price").head()
    assert(row.getLong(0) == 3L && row.getDouble(1) == 30.0)
  }

  test("nearest as-of tie policy: exact match wins, equidistant prefers the earlier side") {
    // mirrors AsOfQueries.asofNearest's pick logic against the oracle's
    // ORDER BY (abs, ts, id): backward at t-10m and forward at t+10m
    // are equidistant -> earlier (backward) wins; an exact-timestamp
    // right row always wins outright.
    import graft.operators.AsOfJoin
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // equidistant case
      (2L, ts("2024-01-01 10:00:00"), 200L)  // exact-match case
    ).toDF("k", "t", "pid")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:50:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (2L, ts("2024-01-01 09:59:00"), 3L),
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("k", "qt", "qid")
    val back = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("qid"), tiebreak = Some("qid"))
    val fwd = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("qid"),
      tiebreak = Some("qid"), forward = true)
    val bmap = back.collect().map(r => r.getAs[Long]("pid") -> r.getAs[Long]("asof_qid")).toMap
    val fmap = fwd.collect().map(r => r.getAs[Long]("pid") -> r.getAs[Long]("asof_qid")).toMap
    assert(bmap(100L) == 1L && fmap(100L) == 2L) // equidistant inputs: nearest picks backward (1)
    assert(fmap(200L) == 4L)                     // exact ts: forward carries it (wins outright)
  }

  test("nearest as-of picks the SMALLEST id among duplicate same-timestamp clicks strictly before the probe") {
    // r8 ADVICE: the oracle's ORDER BY (abs, ts, id ASC) picks the
    // smallest id among clicks tied at the nearest timestamp; the plain
    // backward pass would keep the greatest ("latest wins"). The
    // nearest composition's backward leg must therefore flip its
    // tiebreak. Three dup clicks strictly before, plus an equidistant
    // pair, plus dup clicks strictly after (forward leg contract).
    val purchases = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), 1.0), // dups strictly before
      (200L, 2L, ts("2024-01-01 10:00:00"), 1.0), // equidistant, dups on the before side
      (300L, 3L, ts("2024-01-01 10:00:00"), 1.0)  // dups strictly after
    ).toDF("event_id", "user_id", "ts", "value")
    def clickRow(u: Long, t: java.sql.Timestamp, id: Long) = (u, t, id, t)
    val clicks = Seq(
      clickRow(1L, ts("2024-01-01 09:30:00"), 17L),
      clickRow(1L, ts("2024-01-01 09:30:00"), 5L),
      clickRow(1L, ts("2024-01-01 09:30:00"), 9L),
      clickRow(2L, ts("2024-01-01 09:50:00"), 8L),
      clickRow(2L, ts("2024-01-01 09:50:00"), 4L),
      clickRow(2L, ts("2024-01-01 10:10:00"), 2L),
      clickRow(3L, ts("2024-01-01 10:20:00"), 31L),
      clickRow(3L, ts("2024-01-01 10:20:00"), 13L)
    ).toDF("user_id", "ts", "click_id", "click_ts")
    val out = graft.operators.AsOfQueries.nearestOf(purchases, clicks)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("asof_click_id")).toMap
    assert(out(100L) == 5L)  // smallest id among the 09:30 dups (was 17 pre-fix)
    assert(out(200L) == 4L)  // equidistant -> earlier side, smallest id among its dups
    assert(out(300L) == 13L) // forward leg keeps its smallest-wins rule
  }

  test("salted as-of equals the unsalted pass on a skewed key") {
    // one hot key carrying 2000 probes + both keys' quote streams with
    // duplicate timestamps (tiebreak exercises determinism); every
    // shard sees all quotes of its key, so results must be identical
    // row-for-row with probes spread over `shards` tasks.
    val base = ts("2024-01-01 00:00:00").getTime
    val probes = ((0 until 2000).map(i => (1L, new java.sql.Timestamp(base + i * 1000L), i.toLong)) ++
      (0 until 50).map(i => (2L, new java.sql.Timestamp(base + i * 7000L), (10000 + i).toLong)))
      .toDF("k", "t", "pid")
    val quotes = ((0 until 40).map(i => (1L, new java.sql.Timestamp(base + i * 60000L), i.toLong, i * 1.0)) ++
      (0 until 40).map(i => (1L, new java.sql.Timestamp(base + i * 60000L), (100 + i).toLong, i * 2.0)) ++
      (0 until 10).map(i => (2L, new java.sql.Timestamp(base + i * 90000L), (200 + i).toLong, i * 3.0)))
      .toDF("k", "qt", "qid", "price")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "asof_qid", "asof_price").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1).toSeq
    val plain = canon(AsOfJoin(probes, quotes, "k", "t", "qt",
      Seq("qid", "price"), tiebreak = Some("qid")))
    val sharded = canon(AsOfJoin.salted(probes, quotes, "k", "t", "qt",
      Seq("qid", "price"), tiebreak = Some("qid"), shards = 7))
    assert(sharded == plain)
    // forward direction too — the time-reversed scan shares the shard plumbing
    val plainF = canon(AsOfJoin(probes, quotes, "k", "t", "qt",
      Seq("qid", "price"), tiebreak = Some("qid"), forward = true))
    val shardedF = canon(AsOfJoin.salted(probes, quotes, "k", "t", "qt",
      Seq("qid", "price"), tiebreak = Some("qid"), forward = true, shards = 3))
    assert(shardedF == plainF)
  }

  test("backward as-of breaks right dups at one timestamp by GREATEST tiebreak") {
    val probes = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "name")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 3L, 30.0),
      (1L, ts("2024-01-01 09:00:00"), 7L, 70.0)).toDF("k", "qt", "qid", "price")
    val out = AsOfJoin(probes, quotes, "k", "t", "qt", Seq("qid", "price"),
      tiebreak = Some("qid"))
    val row = out.select("asof_qid", "asof_price").head()
    assert(row.getLong(0) == 7L && row.getDouble(1) == 70.0)
  }
}
