package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The single-digest MinHash scheme: one md5 per shingle feeding all
  * 9 window-min orders — the plan property (digest not re-inlined per
  * order) and the window geometry the DuckDB oracle mirrors.
  */
class MinHashDigestSpec extends SparkSpec {

  test("the signature projection evaluates md5 once, not once per order") {
    // a parquet-backed frame — a local Seq would constant-fold the
    // whole projection into a LocalTableScan and prove nothing
    val sh = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        split(col("text"), " ").as("sh_arr"))
    // same two-projection shape as DedupQueries.minhashSig
    val sig = sh
      .select(col("doc_id"), TextFunctions.md5All(col("sh_arr")).as("__dig"))
      .select(col("doc_id") +:
        (0 until 9).map(i => TextFunctions.minhashOrder(col("__dig"), i).as(s"m$i")): _*)
    val plan = sig.queryExecution.executedPlan.toString
    // CollapseProject must NOT inline the non-cheap digest transform
    // into its 9 consumers — one md5 in the plan, not nine
    val md5Count = "md5".r.findAllIn(plan).length
    assert(md5Count == 1, s"expected 1 md5 in plan, found $md5Count:\n$plan")
  }

  test("orders are 8-char windows at stride 3, order 8 ending at char 32") {
    import spark.implicits._
    val df = Seq(Seq("x")).toDF("sh_arr")
      .select(TextFunctions.md5All(col("sh_arr")).as("dig"))
    val digest = df.select(element_at(col("dig"), 1)).head().getString(0)
    assert(digest.length == 32)
    val orders = df.select(
      (0 until 9).map(i => TextFunctions.minhashOrder(col("dig"), i).as(s"m$i")): _*)
      .head()
    for (i <- 0 until 9) {
      val want = digest.substring(3 * i, 3 * i + 8) // 0-based [3i, 3i+8)
      assert(orders.getString(i) == want, s"order $i window mismatch")
    }
  }

  test("each order takes the min over its own windows, not the min digest's window") {
    import spark.implicits._
    // two shingles whose digests order differently in different
    // windows — the per-order min must be windowwise, which is what
    // makes the orders (partially) independent permutations
    val df = Seq(Seq("a", "b", "c", "d", "e")).toDF("sh_arr")
      .select(TextFunctions.md5All(col("sh_arr")).as("dig"))
    val digs = df.select(col("dig")).head().getSeq[String](0)
    val got = df.select(
      (0 until 9).map(i => TextFunctions.minhashOrder(col("dig"), i).as(s"m$i")): _*)
      .head()
    for (i <- 0 until 9) {
      val want = digs.map(_.substring(3 * i, 3 * i + 8)).min
      assert(got.getString(i) == want)
    }
    // sanity: at least two different digests supply the 9 minima on
    // this fixture (if one digest won every window the independence
    // claim would be untested)
    val winners = (0 until 9).map(i => digs.minBy(_.substring(3 * i, 3 * i + 8)))
    assert(winners.distinct.size >= 2)
  }
}
