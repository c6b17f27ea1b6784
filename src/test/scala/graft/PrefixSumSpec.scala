package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.PrefixSum

/** The distributed prefix sum vs the plain one-window form — the
  * reduction tree must be value-identical at every level count, on
  * sparse ids, multiple partitions, and bucket-boundary edge cases.
  */
class PrefixSumSpec extends SparkSpec {

  // Deterministic "random" fixture: sparse non-contiguous ids (prime
  // stride mod a non-multiple-of-k range) across 3 partitions, values
  // derived from the id — no RNG, fully reproducible.
  private def fixture = {
    import spark.implicits._
    (0 until 5000).map { i =>
      val id = (i.toLong * 7919) % 104729 // sparse, unique (7919 coprime)
      (s"src${i % 3}", id, (id % 37) + 1)
    }.toDF("part", "id", "v")
  }

  private def plainWindow(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("want", coalesce(
      sum(col("v")).over(Window.partitionBy(col("part")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))

  test("matches the plain window exactly at levels 1, 2, 3 (small k forces deep trees)") {
    val want = plainWindow(fixture)
    for (levels <- 1 to 3) {
      val got = PrefixSum.exclusiveOffsets(fixture, Seq("part"), "id", "v", "got",
        levels = levels, k = 7) // k=7 on 5000 rows exercises every level
      val joined = got.join(want, Seq("part", "id", "v"))
      assert(joined.count() == 5000, s"levels=$levels lost rows")
      assert(joined.filter(col("got") =!= col("want")).count() == 0,
        s"levels=$levels diverged from the plain window")
    }
  }

  test("global scan (no partition columns) matches the unpartitioned window") {
    val df = fixture.drop("part")
    val want = df.withColumn("want", coalesce(
      sum(col("v")).over(Window.orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val got = PrefixSum.exclusiveOffsets(df, Seq.empty, "id", "v", "got",
      levels = 3, k = 11)
    val joined = got.join(want, Seq("id", "v"))
    assert(joined.count() == 5000)
    assert(joined.filter(col("got") =!= col("want")).count() == 0)
  }

  test("single row, single bucket, and exact-k bucket boundaries") {
    import spark.implicits._
    // ids 0..k-1 fill exactly one bucket; id k starts the next
    val df = (0L to 7L).map(i => ("a", i, 10L + i)).toDF("part", "id", "v")
    val got = PrefixSum.exclusiveOffsets(df, Seq("part"), "id", "v", "got",
      levels = 2, k = 4)
    val want = plainWindow(df)
    assert(got.join(want, Seq("part", "id", "v"))
      .filter(col("got") =!= col("want")).count() == 0)

    val one = Seq(("a", 5L, 42L)).toDF("part", "id", "v")
    val g1 = PrefixSum.exclusiveOffsets(one, Seq("part"), "id", "v", "got")
    assert(g1.head().getAs[Long]("got") == 0L)
  }

  test("multi-column form equals one single-column tree per column") {
    // two value columns through ONE tree must be bit-identical to two
    // independent trees (and hence, transitively, to the plain window)
    val df = fixture.withColumn("v2", (col("id") % 11) + 2)
    val multi = PrefixSum.exclusiveOffsetsMulti(df, Seq("part"), "id",
      Seq("v" -> "o1", "v2" -> "o2"), levels = 2, k = 7)
    val s1 = PrefixSum.exclusiveOffsets(df, Seq("part"), "id", "v", "o1",
      levels = 2, k = 7)
    val s2 = PrefixSum.exclusiveOffsets(df, Seq("part"), "id", "v2", "o2",
      levels = 2, k = 7)
    val want = s1.select(col("part"), col("id"), col("o1").as("w1"))
      .join(s2.select(col("part"), col("id"), col("o2").as("w2")), Seq("part", "id"))
    val joined = multi.join(want, Seq("part", "id"))
    assert(joined.count() == 5000)
    assert(joined.filter(
      col("o1") =!= col("w1") || col("o2") =!= col("w2")).count() == 0)
  }

  test("exclusiveRunningMax matches the plain window at levels 1, 2, 3") {
    // values deliberately NON-monotone in id (id*7919 mod 104729 vs
    // (id%37)) so the running max actually moves around, and with
    // repeated values so greatest-tie paths execute
    val want = fixture.withColumn("want",
      max(col("v")).over(Window.partitionBy(col("part")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    for (levels <- 1 to 3) {
      val got = PrefixSum.exclusiveRunningMax(fixture, Seq("part"), "id", "v", "got",
        levels = levels, k = 7)
      val joined = got.join(want, Seq("part", "id", "v"))
      assert(joined.count() == 5000, s"levels=$levels lost rows")
      assert(joined.filter(
        (col("got").isNull =!= col("want").isNull) ||
          (col("got").isNotNull && col("got") =!= col("want"))).count() == 0,
        s"levels=$levels diverged from the plain window")
    }
  }

  test("exclusiveRunningMax: each partition's first row gets null (empty prefix)") {
    val got = PrefixSum.exclusiveRunningMax(fixture, Seq("part"), "id", "v", "got",
      levels = 2, k = 7)
    val firsts = got.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("part")).orderBy(col("id"))))
      .filter(col("rn") === 1)
    assert(firsts.count() == 3)
    assert(firsts.filter(col("got").isNotNull).count() == 0)
    assert(got.filter(col("got").isNull).count() == 3) // ONLY the firsts
  }

  test("the only unbounded window in the plan runs over top-level bucket totals") {
    // plan audit: every WindowExec but one partitions by a bucket
    // column; the remaining one (the top of the tree) sees
    // n/k^levels rows. With 5000 rows, k=7, levels=3: <= 15 rows.
    val got = PrefixSum.exclusiveOffsets(fixture, Seq.empty, "id", "v", "got",
      levels = 3, k = 7)
    val plan = got.queryExecution.executedPlan.toString
    val windows = plan.split("\n").count(_.contains("Window "))
    assert(windows == 4) // 3 tree levels + the row level
    // top-level totals frame is tiny: 104729/7^3 < 400 buckets
    val topBuckets = fixture.select((col("id") / lit(343)).cast("long")).distinct().count()
    assert(topBuckets < 400)
  }
}
