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
