package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def promos = Tables.orders(spark, sf0001)
    .filter(col("o_orderkey") % 100 === 0)
    .select(col("o_orderkey").as("promo_id"),
      col("o_orderdate").as("p_start"),
      (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("p_end"))

  private def ships = Tables.lineitem(spark, sf0001).select(col("l_shipdate"))

  test("bucketized range join matches the naive cross-filter at several bucket widths") {
    val naive = promos.crossJoin(ships)
      .filter(col("p_start") <= col("l_shipdate") && col("l_shipdate") < col("p_end"))
      .groupBy("promo_id").agg(count(lit(1)).as("n"))
    val naiveRows = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // widths below, at, and above the interval length — the bucket
    // dial must never change results, only the join's fan-out
    for (w <- Seq(86400L, 7L * 86400, 30L * 86400)) {
      val bucketized = RangeJoin.pointInInterval(
          ships, "l_shipdate", promos, "p_start", "p_end", bucketSeconds = w)
        .groupBy("promo_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(bucketized == naiveRows, s"bucket width $w diverged")
    }
  }

  test("bucketized range join plans a hash join, not a nested loop") {
    val j = RangeJoin.pointInInterval(
      ships, "l_shipdate", promos, "p_start", "p_end", bucketSeconds = 7L * 86400)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }

  test("boundary semantics: start inclusive, end exclusive") {
    import spark.implicits._
    val iv = Seq((1L, "2024-01-01 00:00:00", "2024-01-08 00:00:00"))
      .toDF("promo_id", "s", "e")
      .select(col("promo_id"), col("s").cast("timestamp").as("p_start"),
        col("e").cast("timestamp").as("p_end"))
    val pts = Seq("2023-12-31 23:59:59", "2024-01-01 00:00:00",
        "2024-01-07 23:59:59", "2024-01-08 00:00:00")
      .toDF("t").select(col("t").cast("timestamp").as("ts"))
    val got = RangeJoin.pointInInterval(pts, "ts", iv, "p_start", "p_end", 86400L)
      .select(col("ts").cast("string")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("2024-01-01 00:00:00", "2024-01-07 23:59:59"))
  }
}
