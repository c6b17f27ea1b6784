package graft

import org.apache.spark.sql.functions._

/** Properties of the sketch/sampling operators that the DuckDB hash
  * compare cannot express: the CMS one-sided error guarantee over the
  * FULL vocabulary (q_heavy_hitters only emits the thresholded rows)
  * and the Horvitz-Thompson unbiasedness of the weighted sample.
  */
class SketchSpec extends SparkSpec {

  test("count-min estimate is an upper bound for every token") {
    val est = operators.TextAnalysisQueries.cmsEstimates(spark, sf0001)
    assert(est.count() > 0)
    assert(est.filter(col("est") < col("c_tok")).count() === 0)
  }

  test("heavy hitters are exactly the thresholded estimate rows") {
    val hh = SparkEntry.queries("q_heavy_hitters")(spark, sf0001)
    val all = operators.TextAnalysisQueries.cmsEstimates(spark, sf0001)
    val n = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " "))).count()
    val expected = all.filter(col("c_tok") * 1000 >= n).count()
    assert(hh.count() === expected)
  }

  test("weighted sample: inclusion matches an independent recomputation") {
    import java.security.MessageDigest
    val kept = SparkEntry.queries("q_weighted_sample")(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxW = docs.map(_._2).max
    def u32(id: Long): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val expected = docs.filter { case (id, w) =>
      5L * u32(id) * maxW < 4294967296L * w
    }.map(_._1).toSet
    assert(kept === expected)
  }

  test("weighted sample: HT estimator recovers corpus size approximately") {
    val sample = SparkEntry.queries("q_weighted_sample")(spark, sf0001)
    val n = Tables.documents(spark, sf0001).count().toDouble
    val ht = sample.agg(sum(col("ht_weight"))).collect()(0).getDouble(0)
    // E[sum of 1/p_i over the sample] = N exactly; one fixed draw of
    // the hash noise should land well within +-40% at 50 docs
    assert(ht > 0.6 * n && ht < 1.4 * n, s"HT=$ht vs N=$n")
  }
}
