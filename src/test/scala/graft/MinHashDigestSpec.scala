package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Md5
import graft.functions.TextFunctions

/** The single-digest MinHash scheme: one md5 per shingle feeding all
  * 9 Kirsch-Mitzenmacher double-hash orders — the plan property
  * (digest not re-inlined per order) and the (h1 + i*h2) mod 2^32
  * arithmetic the DuckDB oracle mirrors.
  */
class MinHashDigestSpec extends SparkSpec {

  /** g_i(d) per the KM scheme: h1 = hex chars [0,8), h2 = [16,24). */
  private def km(digest: String, i: Int): Long =
    (java.lang.Long.parseLong(digest.substring(0, 8), 16) +
      i.toLong * java.lang.Long.parseLong(digest.substring(16, 24), 16)) % 4294967296L

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
    // count Md5 expression NODES by traversing the optimized plan —
    // CollapseProject must not inline the non-cheap digest transform
    // into its 9 consumers. (Traversal, not plan-string regex: a Spark
    // upgrade changing plan rendering must not flip this test.)
    val md5Count = sig.queryExecution.optimizedPlan
      .collect { case node =>
        node.expressions.map(_.collect { case m: Md5 => m }.size).sum }
      .sum
    assert(md5Count == 1, s"expected 1 Md5 node in the optimized plan, found $md5Count")
  }

  test("order i is (h1 + i*h2) mod 2^32 over the disjoint digest windows") {
    import spark.implicits._
    val df = Seq(Seq("x")).toDF("sh_arr")
      .select(TextFunctions.md5All(col("sh_arr")).as("dig"))
    val digest = df.select(element_at(col("dig"), 1)).head().getString(0)
    assert(digest.length == 32)
    val orders = df.select(
      (0 until 9).map(i => TextFunctions.minhashOrder(col("dig"), i).as(s"m$i")): _*)
      .head()
    for (i <- 0 until 9)
      assert(orders.getLong(i) == km(digest, i), s"order $i KM arithmetic mismatch")
    // the windows are disjoint, so consecutive orders differ by
    // exactly h2 (mod 2^32) — the linear structure KM guarantees
    val h2 = java.lang.Long.parseLong(digest.substring(16, 24), 16)
    for (i <- 1 until 9)
      assert((orders.getLong(i - 1) + h2) % 4294967296L == orders.getLong(i))
  }

  test("each order takes the min over its own hash, not the min digest's") {
    import spark.implicits._
    // several shingles whose digests order differently under different
    // orders — the per-order min must be orderwise, which is what
    // makes the orders independent permutations
    val df = Seq(Seq("a", "b", "c", "d", "e")).toDF("sh_arr")
      .select(TextFunctions.md5All(col("sh_arr")).as("dig"))
    val digs = df.select(col("dig")).head().getSeq[String](0)
    val got = df.select(
      (0 until 9).map(i => TextFunctions.minhashOrder(col("dig"), i).as(s"m$i")): _*)
      .head()
    for (i <- 0 until 9) {
      val want = digs.map(km(_, i)).min
      assert(got.getLong(i) == want)
    }
    // sanity: at least two different digests supply the 9 minima on
    // this fixture (if one digest won every order the independence
    // claim would be untested)
    val winners = (0 until 9).map(i => digs.minBy(km(_, i)))
    assert(winners.distinct.size >= 2)
  }
}
