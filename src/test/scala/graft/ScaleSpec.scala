package graft

import org.apache.spark.sql.functions._

/** Scale-path behaviors surfaced by the sf1 certification (round 9):
  * the corpus-size-adaptive embedding banding tier and the
  * directory-shaped fixture staging for the streaming sources. These
  * paths only activate beyond the correctness-gate scales, so each
  * gets a forced/planted differential here instead of an oracle row.
  */
class ScaleSpec extends SparkSpec {

  test("embTier: tier 0 up to the oracle-pinned boundary, then log-scaled bits") {
    assert(operators.DedupQueries.embTier(200L) === ((6, 3)))
    assert(operators.DedupQueries.embTier(operators.DedupQueries.EMB_TIER0_MAX) === ((6, 3)))
    val (b1, bits1) = operators.DedupQueries.embTier(20000L)
    assert(b1 === 16 && bits1 >= 8, s"got ($b1, $bits1)")
    // bits grow monotonically with corpus size and stay clamped
    val tiers = Seq(5000L, 50000L, 500000L, 5000000L, 5L * 1000 * 1000 * 1000)
      .map(n => operators.DedupQueries.embTier(n)._2)
    assert(tiers === tiers.sorted)
    assert(tiers.last <= 16)
  }

  test("adaptive tier catches every planted high-cosine pair and proposes no false positives") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    def vec(): Array[Float] = Array.fill(64)((rnd.nextDouble() - 0.5).toFloat)
    // 60 base vectors + 20 planted near-dups (tiny perturbation =>
    // cosine ~0.999): the regime production dedup targets
    val base = (0 until 60).map(i => (i.toLong, vec()))
    val dups = (0 until 20).map { i =>
      val (_, v) = base(i * 3)
      (100L + i, v.map(x => x + (rnd.nextDouble() * 0.002 - 0.001).toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("scalespec_emb").toString
    (base ++ dups).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val forced = operators.DedupQueries
      .dedupEmbeddingWith(spark, dir, forceTier = Some((16, 8)))
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

    // brute-force truth over the 80-vector corpus (spec-scale only)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val all = (base ++ dups)
    val truthHigh = (for {
      i <- all.indices; j <- all.indices if all(i)._1 < all(j)._1
      if cos(all(i)._2, all(j)._2) >= 0.95
    } yield (all(i)._1, all(j)._1)).toSet
    val truthAny = (for {
      i <- all.indices; j <- all.indices if all(i)._1 < all(j)._1
      // quantization shifts cosines by <1e-3 at this magnitude; the
      // false-positive check uses a slack bound, not the exact cut
      if cos(all(i)._2, all(j)._2) >= 0.39
    } yield (all(i)._1, all(j)._1)).toSet

    assert(truthHigh.nonEmpty && (truthHigh -- forced).isEmpty,
      s"missed high-cosine pairs: ${truthHigh -- forced}")
    assert((forced -- truthAny).isEmpty,
      s"unverified pairs emitted: ${forced -- truthAny}")
  }

  test("streaming sources flatten directory-shaped tables (sf1 fixture shape)") {
    val dir = java.nio.file.Files.createTempDirectory("scalespec_docs").toString
    val docs = Tables.read(spark, sf0001, "documents")
    // Spark-written table = DIRECTORY of part files, the ScaleGen
    // output shape that silently streamed zero rows before the fix
    docs.repartition(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val name = "scalespec_docstream"
    val q = streaming.StreamingOps.docStream(spark, dir)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table(name).count() === docs.count())
  }

  test("forced-tier embedding plan keeps the banded-join shape (no cartesian, no data x data BNLJ)") {
    // PlanSpec's guarded set sees only the sf0.001 tier-0 plan; this
    // pins the tier>0 plan the sf1+ corpus actually runs: candidate
    // generation must stay a band-key equi-join (hash-partitionable),
    // never an all-pairs product — the exact regression that made
    // q_dedup_embedding quadratic before round 9's adaptive tier.
    val plan = operators.DedupQueries
      .dedupEmbeddingWith(spark, sf0001, forceTier = Some((16, 8)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct"),
      "tier>0 embedding dedup plan contains a CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "tier>0 embedding dedup plan contains a BroadcastNestedLoopJoin")
    // the band-bucket self-join must be an equi-join on the band key
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      "tier>0 embedding dedup plan lost its band-key equi-join")
  }
}
