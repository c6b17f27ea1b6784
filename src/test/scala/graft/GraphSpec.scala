package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphQueries

/** Differential test for the integer PageRank: replay the exact
  * nano-unit recurrence in plain Scala over the collected fixture
  * edge list and require bit-identical ranks (the DuckDB hash gate
  * proves Spark==DuckDB; this proves both match the written-down
  * recurrence, so the two engines can't be "consistently wrong"
  * about e.g. a division-order mistake mirrored into the oracle).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank matches an independent integer-recurrence model") {
    val got = GraphQueries.pagerank(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    // independent edge derivation (straight from the tables)
    val pairs = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as[Long], col("l_suppkey").as[Long])
      .collect().distinct
    val edges = pairs.flatMap { case (c, s) =>
      Seq(2 * c -> (2 * s + 1), (2 * s + 1) -> (2 * c))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 3) {
      val recv = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for ((src, dst) <- edges) recv(dst) += r(src) / deg(src)
      r = recv.map { case (n, s) => n -> (BigInt(150000000) + s * 85 / 100) }.toMap
    }
    assert(got.size == r.size, "node set mismatch")
    for ((node, want) <- r) {
      val key = (if (node % 2 == 1) "s" else "c", node / 2)
      assert(BigInt(got(key)) == want, s"rank mismatch at node $node")
    }
  }

  test("pagerank iterations reuse the memoized edge list (one build, cached scans)") {
    val plan = GraphQueries.pagerank(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "iterations must read the SharedBuilds-cached edge frame, not rebuild it")
  }

  test("converged pagerank equals the fixed recurrence run for the same iteration count") {
    val eps = 5000000L // 0.5% of the unit rank, in nano-units
    val (ranksDf, iters) = GraphQueries.pagerankConverged(spark, sf0001, eps)
    assert(iters >= 1 && iters < 50)
    val got = ranksDf.select("node", "r").as[(Long, Long)].collect().toMap

    // independent fixed-iteration replay for exactly `iters` rounds
    val pairs = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as[Long], col("l_suppkey").as[Long])
      .collect().distinct
    val edges = pairs.flatMap { case (c, s) =>
      Seq(2 * c -> (2 * s + 1), (2 * s + 1) -> (2 * c))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> BigInt(1000000000L)).toMap
    var prev = r
    for (_ <- 1 to iters) {
      prev = r
      val recv = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for ((src, dst) <- edges) recv(dst) += r(src) / deg(src)
      r = recv.map { case (n, s) => n -> (BigInt(150000000) + s * 85 / 100) }.toMap
    }
    assert(got.view.mapValues(BigInt(_)).toMap == r,
      "converged vector differs from the fixed recurrence at the same iteration count")
    // the stopping condition really held at the returned count
    assert(r.map { case (n, v) => (v - prev(n)).abs }.max <= eps)
  }

  test("q_pagerank_eps stops at the first convergent round (6 at sf0.001)") {
    // Pin of the catalog epsilon against the measured delta schedule
    // (scripts/eps_probe.py: d5 = 6.32e9 > 6e9 >= d6 = 5.38e9 at
    // sf0.001) — a loop that runs one round long or short moves the
    // constant iters column. The definitional certification lives in
    // the DuckDB oracle; this is the cheap local regression pin.
    val df = GraphQueries.queries("q_pagerank_eps")(spark, sf0001)
    val iters = df.select("iters").distinct().as[Int].collect().toSeq
    assert(iters == Seq(6),
      s"expected convergence at round 6 at sf0.001, got $iters")
  }

  test("converged pagerank is loop-checkpoint-dial invariant (reliable vs local)") {
    // The cluster-durability dial (GRAFT_LOOP_CHECKPOINT=reliable,
    // LoopState.truncate): localCheckpoint blocks die with their
    // executor — no recompute path — so a production multi-round loop
    // flips to reliable checkpoint files. This certifies the flip is
    // a pure deployment decision: vector and iteration count are
    // identical, and the reliable path really wrote checkpoint files.
    val eps = 6000000000L // the catalog pin: 6 rounds at sf0.001
    def runWith(mode: Option[String]): (Map[Long, Long], Int) = {
      mode.foreach(sys.props("graft.loop.checkpoint") = _)
      try {
        val (df, iters) = GraphQueries.pagerankConverged(spark, sf0001, eps)
        (df.select("node", "r").as[(Long, Long)].collect().toMap, iters)
      } finally sys.props.remove("graft.loop.checkpoint")
    }
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft-test-ckpt").toString
    // pin the CONTEXT dir directly: LoopState's lazy fallback only
    // fires while the shared context has no checkpoint dir yet, and
    // another suite's reliable run may have installed one already
    spark.sparkContext.setCheckpointDir(ckptDir)
    // the dial is a JVM-global sysprop and suites run concurrently:
    // serialize the two dial tests (this and PropertySpec's) on the
    // dial object so one test's cleanup can't flip the other's loop
    // back to local mid-run
    graft.operators.LoopState.synchronized {
      val (defaultVec, defaultIters) = runWith(None)
      val (reliableVec, reliableIters) = runWith(Some("reliable"))
      assert(defaultVec.nonEmpty)
      assert(reliableVec == defaultVec,
        "reliable-checkpoint loop vector differs from the local-checkpoint loop's")
      assert(reliableIters == defaultIters)
      // the dial actually took the reliable path AND bounded its
      // storage: checkpoint dirs exist under the pinned dir, but only
      // the keep-two window survives a 6-round loop (LoopState.Loop
      // deletes older rounds once the new one materializes)
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      val remaining =
        try walk.filter(p => p.getFileName.toString.startsWith("rdd-")).count()
        finally walk.close()
      assert(remaining >= 1L && remaining <= 2L,
        s"expected 1-2 surviving reliable checkpoints (keep-two window) under " +
          s"$ckptDir after a $defaultIters-round loop, found $remaining")
    }
  }

  test("converged pagerank resumes from the last committed round after a driver crash") {
    // The durability class the reliable-checkpoint dial can't give:
    // reliable checkpoints survive EXECUTOR loss, but the round
    // counter, delta and frame refs live on the driver — a driver
    // crash restarts a multi-hour loop from round 0 unless rounds
    // commit durably. With a resume dir, each round commits
    // (vector, round, delta) via write-then-rename; this crashes a
    // run mid-loop (iteration budget exhausted after 3 committed
    // rounds) and proves the resumed run continues from round 3 to
    // the SAME vector and count as an uninterrupted reference.
    val eps = 6000000000L // 6 rounds at sf0.001
    val resume = java.nio.file.Files
      .createTempDirectory("graft-loop-resume").toString
    val (refDf, refIters) =
      GraphQueries.pagerankConverged(spark, sf0001, eps)
    val ref = refDf.select("node", "r").as[(Long, Long)].collect().toMap
    assert(refIters > 3, s"fixture converged in $refIters rounds; crash point needs > 3")
    // run 1 "crashes": budget exhausted after committing rounds 1-3
    intercept[IllegalArgumentException] {
      GraphQueries.pagerankConverged(spark, sf0001, eps,
        maxIters = 3, resumeDir = Some(resume))
    }
    // run 2 resumes at round 3 and completes
    val (df2, iters2) =
      GraphQueries.pagerankConverged(spark, sf0001, eps, resumeDir = Some(resume))
    assert(iters2 == refIters)
    assert(df2.select("node", "r").as[(Long, Long)].collect().toMap == ref,
      "resumed vector differs from the uninterrupted run's")
    // committed-round storage is bounded: only the last two rounds remain
    val dirs = new java.io.File(resume).listFiles()
      .map(_.getName).filter(_.startsWith("round_")).sorted.toSeq
    assert(dirs == Seq(s"round_${refIters - 1}", s"round_$refIters"),
      s"expected the keep-two commit window, found $dirs")
    // a mismatched eps must refuse to resume, not silently continue
    val e = intercept[IllegalArgumentException] {
      GraphQueries.pagerankConverged(spark, sf0001, eps + 1,
        resumeDir = Some(resume))
    }
    assert(e.getMessage.contains("stamp"), e.getMessage)
  }

  test("directed pagerank: planted dangling node redistributes its mass") {
    // Graph: 1 -> 2, 3 -> 2; node 2 dangles (no out-edges). N = 3,
    // all ranks start at 1e9. Iteration 1 by hand:
    //   D = r(2) = 1e9, share = D div 3 = 333333333
    //   sin(2) = r(1)/1 + r(3)/1 = 2e9; sin(1) = sin(3) = 0
    //   r(1) = r(3) = 150e6 + 85*333333333 div 100       = 433333333
    //   r(2) = 150e6 + 85*(2e9 + 333333333) div 100      = 2133333333
    // Without redistribution r(1)/r(3) would read the bare teleport
    // floor 150e6 — the dangling share is exactly what this pins.
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L)).toDF("src", "dst", "deg")
    val got = GraphQueries.pagerankDirectedOf(spark, edges, 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 433333333L, 3L -> 433333333L, 2L -> 2133333333L))
  }

  test("directed pagerank matches an independent integer-recurrence model") {
    val got = GraphQueries.pagerankDirected(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val pairs = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as[Long], col("l_suppkey").as[Long])
      .collect().distinct
    val edges = pairs.map { case (c, s) => (2 * c, 2 * s + 1) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = nodes.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 3) {
      val dm = nodes.filterNot(deg.contains).map(r).sum
      val share = dm / nodes.length
      val recv = scala.collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      for ((src, dst) <- edges) recv(dst) += r(src) / deg(src)
      r = nodes.map(n => n ->
        (BigInt(150000000) + (recv(n) + share) * 85 / 100)).toMap
    }
    assert(got.size == r.size, "node set mismatch")
    for ((node, want) <- r) {
      val key = (if (node % 2 == 1) "s" else "c", node / 2)
      assert(BigInt(got(key)) == want, s"rank mismatch at node $node")
    }
  }

  test("triangle count: 4-clique plus pendant edge counts exactly 4 triangles") {
    // K4 on {1,2,3,4} has C(4,3) = 4 triangles; the pendant edge
    // (4,5) adds a node and an edge but closes nothing. Degree
    // orientation must count each triangle exactly once whatever the
    // hub structure.
    val e0 = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)
    ).toDF("u", "v")
    val got = GraphQueries.trianglesOf(spark, e0).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((5L, 7L, 4L)))
  }

  test("triangle count: triangle-free bipartite edges count zero") {
    val e0 = Seq((1L, 10L), (1L, 12L), (3L, 10L), (3L, 12L)).toDF("u", "v")
    val got = GraphQueries.trianglesOf(spark, e0).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((4L, 4L, 0L)))
  }

  test("reliable dial refuses the driver-local temp fallback on a non-local master") {
    // r14 verdict item 4: with GRAFT_LOOP_CHECKPOINT=reliable and NO
    // explicit checkpoint dir, the old fallback silently pointed
    // setCheckpointDir at a driver-local temp dir — on a cluster that
    // is not reliable storage (executors cannot re-read driver-local
    // files after a loss), so the operator believed they bought
    // executor-loss durability and did not. The decision is factored
    // pure (LoopState.resolveCheckpointDir) so the refusal is
    // testable without standing up a non-local SparkContext.
    import graft.operators.LoopState
    for (master <- Seq("spark://cluster:7077", "yarn", "k8s://https://api:6443")) {
      val err = intercept[IllegalArgumentException] {
        LoopState.resolveCheckpointDir(master, None)
      }
      // the message must name BOTH config keys the operator can set
      assert(err.getMessage.contains("graft.checkpoint.dir"), err.getMessage)
      assert(err.getMessage.contains("GRAFT_CHECKPOINT_DIR"), err.getMessage)
    }
    // an explicit dir always wins, on any master
    assert(LoopState.resolveCheckpointDir("spark://cluster:7077",
      Some("hdfs:///graft/ckpt")) == "hdfs:///graft/ckpt")
    // local masters keep the dev/test temp-dir convenience
    val tmp = LoopState.resolveCheckpointDir("local[32]", None)
    assert(new java.io.File(tmp).isDirectory)
  }
}
