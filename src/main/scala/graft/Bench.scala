package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core (the driver contract is local[32] on a
    // 32-cpu box); SPARK_GRAFT_CPUS overrides for local experiments.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_MASTER dials the same bench onto a multi-JVM
    // local-cluster master (real exchange serialization, executor-side
    // broadcast hydration) — a perf PROFILE, not the committed-baseline
    // configuration, which stays local[32] per the driver contract.
    val spark = SessionEnv.builder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: run one small scan+aggregate so session
    // bootstrap, codegen compiler and JIT warmup are not charged to
    // whichever query happens to execute first (map order is
    // arbitrary, so that cost would land on a random query each run).
    try {
      Tables.supplier(spark, sfDir).groupBy("s_nationkey").count().count()
    } catch { case _: Throwable => () }
    // Warm the document/vector array-kernel codepaths (md5 shingling,
    // minhash transforms, quantized dot products) on a 64-row sample:
    // the generated loops are hot enough that C2 compilation dominates
    // their first execution (~5s measured), and which query pays it is
    // map-order luck. Standard steady-state benchmarking practice —
    // sampled input, results discarded, nothing precomputed or cached
    // for the measured queries.
    try {
      import org.apache.spark.sql.functions._
      import graft.functions.{TextFunctions, VectorFunctions}
      // collect(), not count(): under count() the column pruner deletes
      // the deterministic kernel expressions and the warmup would
      // execute nothing
      Tables.documents(spark, sfDir).limit(64)
        .select(col("doc_id"),
          TextFunctions.minhashOrder(
            TextFunctions.md5All(
              array_distinct(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3))), 0)
            .as("m"),
          md5(array_join(TextFunctions.md5All(TextFunctions.tokens(col("text"))), "")).as("d"))
        .collect()
      val qv = Tables.embeddings(spark, sfDir).limit(64)
        .select(VectorFunctions.quantized(col("embedding")).as("qv"))
      qv.alias("a").crossJoin(qv.alias("b"))
        .select(VectorFunctions.qdot(col("a.qv"), col("b.qv")).as("d"))
        .agg(sum(col("d"))).collect()
    } catch { case _: Throwable => () }
    // Per-query timing plus explicit failure tracking: a query that
    // throws is recorded with its error and counted in "failed", so a
    // broken query can never masquerade as a fast one in the JSON line.
    // Sorted by name: Map iteration order reshuffles whenever a query
    // is added, which moves first-touch costs (shared materializations,
    // table first-scan) onto different queries and makes per-query
    // numbers incomparable across rounds (r4's gate flagged an
    // untouched query for exactly this). A fixed order keeps every
    // round's cost attribution stable.
    // Each query runs THREE times: the first (cold) execution carries
    // whatever one-time cost lands on it — table first-scan, shared
    // materializations the dedup/text families reuse — and the
    // recorded steady number is the MIN of two further executions.
    // Keeping both stops shared-build attribution (one consumer pays
    // ~3s the whole family amortizes) from masquerading as a per-query
    // regression across rounds: the gate compares steady, the cold
    // total stays comparable with pre-r5 artifacts. Min-of-2 (round
    // 5's lesson): a single steady execution on a loaded box recorded
    // q_dedup_ngram at 8.74s steady vs 0.90s idle — steady > cold is
    // physically impossible for a memoized-build query, so one noisy
    // sample must never BE the committed artifact; the min of two
    // samples is the plan-cost estimator (box noise only ever adds).
    // /proc/stat cpu jiffies: (steal, total). The delta across the run
    // measures how much CPU the HYPERVISOR withheld — the direct
    // signature of the noisy-neighbor windows this round measured
    // (identical binaries: 67-221s cold across ten runs). loadavg only
    // shows what THIS box scheduled; steal_pct shows what it was
    // denied, so a skewed run is self-identifying in the artifact.
    def cpuJiffies(): Option[(Long, Long)] = try {
      val cols = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")), "UTF-8")
        .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
      Some((if (cols.length > 7) cols(7) else 0L, cols.sum))
    } catch { case _: Throwable => None }
    val jiffies0 = cpuJiffies()
    // SPARK_GRAFT_STEADY_RUNS sets the per-query steady sample count
    // (min-of-N). Default raised 2 -> 3 in round 7: every round-7
    // window was contended (five full runs, min composite still +29%
    // on CPU-dense kernels vs round 6's quiet window) and one extra
    // sample per query costs ~40 s wall while cutting single-burst
    // contamination of the committed artifact roughly in half (a
    // burst must now hit all three samples to survive the min).
    val steadyRuns = sys.env.getOrElse("SPARK_GRAFT_STEADY_RUNS", "3").toInt.max(1)
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run to a named subset —
    // used by the sf1 scaling certification to iterate on the
    // expensive families without paying the full 157-query sweep.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (cold, coldErr) = once()
      val (steady0, steadyErr) = if (coldErr.isDefined) (cold, coldErr) else {
        val samples = Iterator.continually(once()).take(steadyRuns).toSeq
        samples.collectFirst { case (s, Some(e)) => (s, Some(e)) }
          .getOrElse((samples.map(_._1).min, None))
      }
      // ANOMALY GUARD (r20): steady > cold is physically impossible
      // for these queries — the cold execution does strictly more work
      // (codegen compile, JIT, shared-build fills) over the same plan —
      // so a min-of-N steady above its own cold means every steady
      // sample was contaminated by a box-noise burst (r19's artifact
      // recorded q_dedup_ngram 12.69 s steady vs 3.88 s cold; min-of-3
      // cannot shed a burst that covers all three samples). Take up to
      // two EXTRA steady samples while the invariant is violated; if it
      // still holds the query is stamped into the artifact's
      // "steady_gt_cold" list so a contaminated run self-identifies.
      // Timing action, per-sample methodology and the min estimator
      // are unchanged; quiet runs take zero extra samples.
      // TOLERANCE (same round, after the first campaign): on the
      // sub-second catalog tail, scheduler jitter routinely puts a
      // 0.16 s steady over a 0.15 s cold — a magnitude-free invariant
      // stamps those as anomalies and buries the real signal. Only a
      // steady >10% AND >50 ms above its own cold counts; the r19
      // blowup class (12.69 vs 3.88) is three orders of magnitude past
      // the gate, floor jitter never reaches it.
      def gtCold(s: Double): Boolean = s > cold * 1.10 + 0.05
      var steady = steady0
      var extra = 0
      while (steadyErr.isEmpty && coldErr.isEmpty && gtCold(steady) && extra < 2) {
        val (s, e) = once()
        if (e.isEmpty) steady = math.min(steady, s)
        extra += 1
      }
      val anomalous = steadyErr.isEmpty && coldErr.isEmpty && gtCold(steady)
      (name, cold, coldErr, steady, coldErr.orElse(steadyErr), anomalous)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def jmap(f: ((String, Double, Option[String], Double, Option[String], Boolean)) => String): String =
      results.map(f).mkString("{", ",", "}")
    // cold entries null only on a COLD failure: a steady-only failure
    // must not discard the valid cold measurement (the cold total
    // includes it, so nulling it would make map and total inconsistent)
    val qs = jmap { case (k, cold, coldErr, _, _, _) => jstr(k) + ":" + coldErr.fold(cold.toString)(_ => "null") }
    val st = jmap { case (k, _, _, steady, err, _) => jstr(k) + ":" + err.fold(steady.toString)(_ => "null") }
    val errs = results.collect { case (k, _, _, _, Some(e), _) =>
      jstr(k) + ":" + jstr(e.take(200)) }.mkString("{", ",", "}")
    val anomalies = results.collect { case (k, _, _, _, None, true) => jstr(k) }
      .mkString("[", ",", "]")
    val failed = results.count(_._5.isDefined)
    // totals cover SUCCESSFUL measurements only, matching the maps
    // (a failed attempt's elapsed time is time-to-failure garbage)
    val total = results.collect { case (_, cold, None, _, _, _) => cold }.sum
    val steadyTotal = results.collect { case (_, _, _, steady, None, _) => steady }.sum
    // stamp the box's 1/5/15-min load averages so a load-skewed run is
    // self-identifying in the committed artifact (round 5's official
    // steady numbers carried ~11s of box noise nobody could see)
    val loadavg = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "unavailable" }
    val stealPct = (jiffies0, cpuJiffies()) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        f"${100.0 * (s1 - s0) / (t1 - t0)}%.2f"
      case _ => "-1"
    }
    // the master is stamped into the artifact so a multi-JVM profile
    // run can never masquerade as a contract local[32] sample
    val masterStr = SessionEnv.master(cpus)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"steady":$st,"steady_total":$steadyTotal,"steady_runs":$steadyRuns,"steady_gt_cold":$anomalies,"loadavg":${jstr(loadavg)},"steal_pct":$stealPct,"failed":$failed,"errors":$errs,"master":${jstr(masterStr)},"sf":"$sfDir"}"""
    println(line)
    // Also persist the line to a file: round 4's official artifact was
    // a truncated stdout tail and the regression gate had nothing to
    // parse. A file can't be lost to tail-capture truncation.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    // ...and APPEND to a committed history file: target/bench.json is
    // last-run-wins (round 6 lost the round-5 baseline to exactly that
    // — a dev run overwrote it before the gate compared), so every run
    // also lands in an append-only log that overwrites can't destroy.
    // SPARK_GRAFT_HIST redirects the append-only log: off-sf runs
    // (sf1 scaling certification) and subset runs must not land in the
    // committed sf0.1 history the regression gate min-composites over.
    // ... and subset or non-default-master runs (multi-JVM profiles)
    // must not land in the committed sf0.1 local[32] history the
    // regression gate min-composites over.
    // ANY off-contract master diverts — not just local-cluster: a
    // local[8] dev run (via SPARK_GRAFT_MASTER or SPARK_GRAFT_CPUS)
    // must not land in the committed history the regression gate
    // min-composites over. Contract shape = in-process local at full
    // box width, with no master override in the environment.
    val contractMaster = sys.env.get("SPARK_GRAFT_MASTER").isEmpty &&
      masterStr == s"local[${Runtime.getRuntime.availableProcessors}]"
    val hist = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_HIST",
      if (only.isDefined) "target/bench_subset.jsonl"
      else if (masterStr.startsWith("local-cluster")) "target/bench_cluster.jsonl"
      else if (!contractMaster) "target/bench_offmaster.jsonl"
      else "bench_history.jsonl"))
    java.nio.file.Files.write(hist, (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
    // A failing query must fail the PROCESS, not just a JSON field:
    // automation gating on the exit code (round 6's BENCH artifact
    // recorded rc:0 around 11 broken queries) would otherwise pass a
    // broken build. The artifacts above are written first, so the
    // failure diagnosis is never lost to the early exit.
    if (failed > 0) sys.exit(1)
  }
}
