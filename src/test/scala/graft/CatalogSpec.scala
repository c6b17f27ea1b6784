package graft

import org.apache.spark.sql.functions._

/** Sanity invariants over the query catalog at sf0.001 (the DuckDB
  * hash-compare is the primary gate — these are fast structural
  * checks + the reference-fidelity cases from FIXTURES.md).
  */
class CatalogSpec extends SparkSpec {

  test("every query has a unique name and every oracle points at a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("q_pagerank_eps oracle unroll depth covers the schedule-derived worst case") {
    // r14 verdict item 3: the oracle unrolls the recurrence to a
    // fixed depth, and a depth below the loop's actual convergence
    // count at the Verify scale would mis-report a CORRECT loop as a
    // 0-row hash mismatch. The needed depth is derivable, not
    // guessed: the round-1 delta is SF-invariant on this generator
    // (hub in-degree, measured 1.2-1.4e10 at sf0.001-0.1 by
    // scripts/eps_probe.py) and contracts by exactly the 0.85
    // damping factor per round, so convergence at eps needs
    // ceil(1 + ln(delta1/eps) / ln(1/0.85)) rounds at ANY scale.
    // This pin trips on a future eps tightening or generator change
    // BEFORE the gate does, with a message that says what to extend.
    val sql = SparkEntry.oracleSql("q_pagerank_eps")
    val depth = "\\br(\\d+) AS".r.findAllMatchIn(sql).map(_.group(1).toInt).max
    val delta1Max = 1.4e10 // measured upper bound, SF-invariant
    val eps = 6e9          // the catalog EpsNano pin
    val worst = math.ceil(1 + math.log(delta1Max / eps) / math.log(1 / 0.85)).toInt
    assert(worst == 7, s"schedule arithmetic drifted: worst=$worst (expected 7, " +
      "the measured convergence round at sf0.1)")
    assert(depth >= worst,
      s"q_pagerank_eps oracle unrolls only r1..r$depth but the measured " +
        s"0.85-contraction schedule needs up to $worst rounds — extend the " +
        "unroll (rN/dN CTEs + it CASE + vec UNION) before any Verify scale bump")
    // depth must also cover the sf0.01 gate scale's measured count (6)
    assert(depth >= 6)
  }

  test("entry (flagship) returns rows at smoke scale with both segments ranked from 1") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val bySegment = rows.groupBy(_.getString(1))
    bySegment.foreach { case (_, rs) => assert(rs.map(_.getInt(2)).min == 1) }
    // reference drops the top bucket (sql.py:23)
    assert(!bySegment.contains("Very High End"))
  }

  test("segmentation CASE boundaries are inclusive (BETWEEN, sql.py:15)") {
    import spark.implicits._
    val df = Seq(51999.99, 52000.0, 54000.0, 54000.01).toDF("v")
      .withColumn("segment",
        when(col("v") < 52000, "Normal")
          .when(col("v").between(52000, 54000), "High End")
          .otherwise("Very High End"))
    assert(df.as[(Double, String)].collect().toSeq ==
      Seq((51999.99, "Normal"), (52000.0, "High End"),
        (54000.0, "High End"), (54000.01, "Very High End")))
  }

  test("rank has gaps after ties (RANK not DENSE_RANK, sql.py:8)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("s", 10.0), ("s", 10.0), ("s", 5.0)).toDF("seg", "v")
    val rk = df.withColumn("r", rank().over(Window.partitionBy("seg").orderBy(col("v").desc)))
      .select("r").as[Int].collect().sorted.toSeq
    assert(rk == Seq(1, 1, 3))
  }

  test("every catalog query executes non-empty at sf0.001") {
    val allowEmpty = Set.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(allowEmpty.contains(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("no catalog plan contains a cartesian product or unexpected nested-loop join") {
    // BroadcastNestedLoopJoin is legitimate only where a broadcast-tiny
    // side joins under a non-equi predicate by design: the ANN queries
    // (<= 5-row query set / 10-row centroid table). Anywhere else it —
    // or a CartesianProduct — means an equi-key was lost and the plan
    // went quadratic; this is the guard that keeps it from landing.
    // (q_bm25 and q_tfidf cross-join a single-row corpus-stats
    // aggregate; q_knn_recall composes the two ANN pipelines;
    // q_semdedup and q_semdedup_incremental read the same broadcast
    // 10-row centroid crossJoin as q_knn_ivf via the shared IVF index;
    // q_knn_sq scores the corpus against the broadcast <=5-row query
    // codes under the same non-equi self-exclusion as q_knn_brute;
    // q_heavy_hitters, q_collocations, q_weighted_sample and
    // q_global_rank ride the same single-row broadcast stats
    // crossJoin as q_bm25 — n_tokens / max-weight / corpus-count
    // scalars joined under a non-equi threshold; q_bloom_prune
    // crossJoins the single-row 8 KiB Bloom bitset every probe reads;
    // q_ks_drift's grid is source-domain x length-domain — metadata
    // cardinality, never corpus rows — plus the 1-row corpus total;
    // q_emb_recall scores the corpus against the broadcast anchor
    // sample under the same non-equi self-exclusion as q_knn_brute;
    // q_hybrid_rank's two retrieval arms broadcast the <=5-row anchor
    // set under the same non-equi self-exclusion; q_surprisal rides
    // the same single-row broadcast stats crossJoin as q_bm25 — the
    // corpus-total-tokens scalar; q_triplets joins the near-dup pairs
    // against the broadcast 64-doc negative pool under a non-equi
    // exclusion, the ANN-anchor shape; q_gapfill crossJoins the
    // broadcast 1-row hour-span aggregate to build its grid;
    // q_copurchase crossJoins the broadcast 1-row order-count scalar;
    // q_bpe_merges crossJoins each round's broadcast 1-row top-merge
    // pick into the vocabulary fold; q_pagerank_directed crossJoins
    // the broadcast 1-row dangling-mass and node-count scalars into
    // each iteration's rank update)
    // the *_sampled audit tiers plan the identical broadcast-anchor
    // shape as their unsampled parents, with the corpus side thinned
    val nestedLoopOk = Set("q_knn_brute", "q_knn_ivf", "q_knn_recall", "q_bm25",
      "q_tfidf", "q_semdedup", "q_semdedup_incremental", "q_knn_sq",
      "q_heavy_hitters", "q_collocations", "q_weighted_sample", "q_global_rank",
      "q_bloom_prune", "q_ks_drift", "q_emb_recall", "q_media_recall",
      "q_emb_recall_sampled", "q_media_recall_sampled",
      "q_emb_recall_lowrate", "q_media_recall_lowrate",
      "q_hybrid_rank", "q_surprisal", "q_triplets", "q_gapfill",
      "q_copurchase", "q_bpe_merges", "q_bpe_encode", "q_pagerank_directed",
      "q_triangles") // 1-row node/edge/triangle count scalars
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      assert(nestedLoopOk.contains(name) || !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans an unexpected BroadcastNestedLoopJoin")
    }
  }
}
