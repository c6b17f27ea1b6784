package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * brute-force cosine top-k as the correctness baseline and an
  * IVF-style two-stage search (centroid probe -> inverted-list scan)
  * as the scale path.
  *
  * Determinism: components quantized to int64 (see
  * [[graft.functions.VectorFunctions.quantized]]); every aggregate in
  * the plan is an exact integer sum, the cosine is a single double
  * division of exact inputs, and all top-k orderings carry an id
  * tiebreak — so Spark and DuckDB produce identical rows.
  *
  * Scale design: every pairwise score is a ROW-LEVEL integer array
  * kernel (`zip_with` product + `aggregate` fold, VectorFunctions.qdot)
  * — no position-explode join, no per-pair aggregation shuffle. Pair
  * generation is the only relational step: brute force broadcasts the
  * tiny query set against the corpus scan (O(Q x N) scores, the oracle
  * baseline); IVF broadcasts the 10 centroid vectors for assignment,
  * probes `nprobe=2` lists, and scores only those candidates —
  * ~n_lists/nprobe less work at scale, where the assignment table
  * would be partitioned by list id and the centroid table is always
  * broadcast-sized. The one explode+shuffle left is the centroid
  * BUILD (element-wise sums), which reduces N x dim rows to
  * n_lists x dim — the natural tall-skinny-matrix-sum dataflow.
  */
object SimilarityQueries extends graft.QueryModule {

  private val K = 5       // neighbors returned
  private val NQ = 5      // query vectors: vec_id < NQ
  private val NPROBE = 2  // IVF centroid lists probed
  private val SEM_T = 0.40 // SemDedup cosine threshold (same as embedding LSH)

  /** Pair-join sublist cap: any IVF list with more than SEM_CAP members
    * is hash-subsplit into ceil(n/SEM_CAP) sublists before SemDedup's
    * in-list all-pairs, so per-list pair generation is bounded at
    * O(SEM_CAP^2) per sublist REGARDLESS of corpus size — the effective
    * cluster count grows linearly with the corpus (SemDedup's own
    * design contract, arXiv:2303.09540: k grows so cluster size stays
    * bounded), exactly like PrefixSum bounds its per-task rows. The
    * sub key is an md5 hash of the vec_id (the house cross-engine
    * RNG), not vec_id parity, so planted id-adjacent pairs are not
    * systematically separated. Missing a cross-sublist pair is the
    * same approximation as a finer k-means clustering — the documented
    * SemDedup tradeoff — and the DuckDB oracle recomputes the exact
    * same subsplit, so the fixture (50-row lists -> n_sub=2) exercises
    * the bucketing end-to-end. 32 keeps worst-case pairs/sublist at
    * ~500 rows; a production run would raise it toward executor-task
    * comfort (~10^4).
    */
  private val SEM_CAP = 32

  import graft.functions.VectorFunctions._

  /** Quantized vectors with precomputed squared norms:
    * (vec_id, label, qv: array<bigint>, n2).
    */
  private def qvecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantized(col("embedding")).as("qv"))
      .withColumn("n2", qnorm2(col("qv")))

  /** The shared IVF index build, memoized per (session, dir) via
    * [[graft.SharedBuilds]]: (vecs cached, per-vector affinity
    * ranking, subsplit rank-1 assignment). knnIvf reads vecs + ranked
    * (query probes rank <= NPROBE) + the assignment; semDedup and
    * semDedupIncremental read vecs + the assignment (semDedup also
    * its `sub` column — see [[SEM_CAP]]). The centroid table stays
    * internal to the build — it is baked into `ranked` and has no
    * direct consumer. One cached build serves all consumers, the role
    * the persisted index plays in a production ANN system.
    */
  private def ivfIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    graft.SharedBuilds.getOrBuild[(DataFrame, DataFrame, DataFrame)](
        "sim.ivfIndex", spark, dir) { scope =>
      val vecs = scope.cached(qvecs(spark, dir))
      // centroid BUILD: element-wise component sums per label, rebuilt
      // into an array — the one explode+shuffle in the pipeline
      // (N x dim rows down to n_lists rows)
      val cent = vecs
        .select(col("label"), posexplode(col("qv")).as(Seq("p", "q")))
        .groupBy(col("label"), col("p")).agg(sum(col("q")).as("sumq"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("p"), col("sumq")))),
          s => s.getField("sumq")).as("cv"))
        .select(col("label").as("clabel"), col("cv"), qnorm2(col("cv")).as("c2"))
      // affinity(v, centroid) = dot(v, sum_c)/(|v||sum_c|) — row-level
      // kernel against the broadcast 10-row centroid table; one window
      // pass serves assignment (rank 1) and query probes (rank <= NPROBE)
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("aff").desc, col("clabel"))
      val ranked = scope.cached(vecs
        .crossJoin(broadcast(cent))
        .select(col("vec_id"), col("clabel"),
          qcosine(qdot(col("qv"), col("cv")), col("n2"), col("c2")).as("aff"))
        .withColumn("arnk", row_number().over(wAssign)))
      // rank-1 assignment with the SEM_CAP hash-subsplit: n_sub =
      // ceil(list_size / SEM_CAP) (exact integer arithmetic), sub =
      // md5(vec_id) mod n_sub. The list-size aggregate is n_lists
      // rows — always broadcastable.
      val counts = ranked.filter(col("arnk") === 1)
        .groupBy(col("clabel")).agg(count(lit(1)).as("n_in_list"))
        .select(col("clabel"),
          expr(s"(n_in_list + ${SEM_CAP - 1}) div $SEM_CAP").as("n_sub"))
      val assigned = scope.cached(ranked.filter(col("arnk") === 1)
        .join(broadcast(counts), Seq("clabel"))
        .select(col("vec_id"), col("clabel").as("list_id"),
          pmod(conv(substring(md5(concat(lit("sub:"), col("vec_id").cast("string"))), 1, 8), 16, 10)
            .cast("long"), col("n_sub")).as("sub")))
      (vecs, ranked, assigned)
    }

  /** Top-k per query by (cosine desc, neighbor_id): one window over the
    * scored pairs. Spark plans partial+final WindowGroupLimit for the
    * rank-filter shape, so only k rows per query survive each side of
    * the exchange.
    */
  private def topK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "neighbor_id", "rnk", "cosine")
  }

  /** Rerank depth of the scalar-quantized two-stage search. */
  private val RERANK = 2 * K

  /** Int8 scalar-quantized two-stage ANN — the compressed-index scale
    * path: at corpus scale the full-precision vectors don't fit hot
    * storage, so candidate generation runs over per-vector symmetric
    * int8 codes (8x smaller than the fp64 components, integer-SIMD
    * dot kernels) and only the top-RERANK survivors per query are
    * re-scored with the full-precision cosine. Quantization: scale
    * m = max|component| (floored at 1), code_i = sign(qv_i) *
    * round_half_up(|qv_i| * 127 / m) in [-127, 127] — exact integer
    * arithmetic both engines reproduce literally (the // floor
    * division runs on non-negative operands only). The output carries
    * BOTH scores, so the hash compare certifies the int8 candidate
    * ranking itself, not just the reranked result.
    */
  def knnSq(spark: SparkSession, dir: String): DataFrame = {
    // the code table is a persisted index artifact like the IVF
    // assignment — memoized per (session, dir), built once
    val coded = graft.SharedBuilds.getOrBuild[DataFrame](
        "sim.sqCodes", spark, dir) { scope =>
      scope.cached(qvecs(spark, dir)
        .withColumn("m", greatest(
          aggregate(col("qv"), lit(0L), (acc, x) => greatest(acc, abs(x))), lit(1L)))
        .withColumn("q8", transform(col("qv"), x =>
          when(x < 0, -floor((abs(x) * lit(254L) + col("m")) / (col("m") * 2)))
            .otherwise(floor((x * lit(254L) + col("m")) / (col("m") * 2)))
            .cast("bigint")))
        .withColumn("n28", qnorm2(col("q8")))
        .select("vec_id", "qv", "n2", "q8", "n28"))
    }
    val queries = coded.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"),
        col("q8").as("q_q8"), col("n28").as("q_n28"),
        col("qv").as("q_qv"), col("n2").as("q_n2"))

    // stage 1: int8 scores only — one corpus scan against the
    // broadcast query codes, top-RERANK per query survives
    val w8 = Window.partitionBy(col("query_id")).orderBy(col("sq_cosine").desc, col("neighbor_id"))
    val cand = coded
      .join(broadcast(queries.select("query_id", "q_q8", "q_n28")),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        qcosine(qdot(col("q_q8"), col("q8")), col("q_n28"), col("n28")).as("sq_cosine"))
      .withColumn("srnk", row_number().over(w8))
      .filter(col("srnk") <= RERANK)

    // stage 2: full-precision rerank of the survivors only
    val wX = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .join(coded.select(col("vec_id").as("neighbor_id"), col("qv"), col("n2")), Seq("neighbor_id"))
      .join(broadcast(queries.select("query_id", "q_qv", "q_n2")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("sq_cosine"),
        qcosine(qdot(col("q_qv"), col("qv")), col("q_n2"), col("n2")).as("cosine"))
      .withColumn("rnk", row_number().over(wX))
      .filter(col("rnk") <= K)
      .select("query_id", "neighbor_id", "rnk", "cosine", "sq_cosine")
  }

  /** Per-label centroid, long form (label, component position, mean in
    * quantized 1e-3 units) — the k-means/IVF aggregate exposed as its
    * own checked operator: one Lloyd-recompute step, the tall-skinny
    * matrix column-sum dataflow (N x dim rows -> n_labels x dim).
    * Exact integer component sums; ONE double division per component.
    * Long form keeps every output column scalar, so the cross-engine
    * hash compare stays byte-exact.
    */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(quantized(col("embedding"))).as(Seq("pos", "qc")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("qc")).as("s"))
      .select(
        col("label"), col("pos").cast("int").as("pos"), col("n_vecs"),
        (col("s").cast("double") / col("n_vecs").cast("double")).as("c"))

  /** Per-dimension embedding-space moments — the index-health audit a
    * pipeline runs BEFORE trusting any distance-based stage: a
    * dimension whose variance numerator n*sum_q2 - sum_q^2 is ~0 is
    * collapsed (contributes nothing to any distance and is prunable),
    * and wildly unequal per-axis ranges mean raw L2 is dominated by a
    * few axes (normalize first). Moments are exact integers over the
    * shared quantized units: sums accumulate as DECIMAL(38,0) so
    * overflow is loud, then cast to BIGINT for the output contract.
    *
    * Scale: one position-explode (n_vecs x dim rows) into a hash
    * groupBy on the dimension index — map-side partial aggregation
    * does the heavy reduction and the output domain is dim rows.
    */
  def embStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Tables.embeddings(spark, dir)
      .select(posexplode(quantized(col("embedding"))).as(Seq("pos", "qc")))
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("qc").cast(DecimalType(38, 0))).cast("long").as("sum_q"),
        sum((col("qc").cast(DecimalType(38, 0)) * col("qc"))).cast("long").as("sum_q2"),
        min(col("qc")).as("min_q"),
        max(col("qc")).as("max_q"))
      .select(col("pos").cast("int").as("pos"), col("n_vecs"),
        col("sum_q"), col("sum_q2"), col("min_q"), col("max_q"))
  }

  /** ANN quality audit: IVF recall@k against the brute-force ground
    * truth — the eval a pipeline runs before trusting an approximate
    * index. Pure composition of the two search pipelines; one join +
    * per-query aggregate on k-row sets.
    */
  def knnRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = knnBrute(spark, dir).select("query_id", "neighbor_id")
    val approx = knnIvf(spark, dir).select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("k"), col("n_hit"),
        (col("n_hit").cast("double") / col("k").cast("double")).as("recall"))
  }

  /** Per-arm list depth and the RRF smoothing constant (k=60, the
    * value from the original Cormack/Clarke/Buettcher paper that
    * virtually every hybrid-search deployment ships unchanged).
    */
  private val HYBRID_DEPTH = 10
  private val RRF_K = 60

  /** Hybrid retrieval via Reciprocal Rank Fusion — the fusion stage a
    * RAG / retrieval pipeline runs over its lexical and semantic
    * arms: each anchor query (vec_id < NQ; doc_id aligns 1:1) gets a
    * top-HYBRID_DEPTH list from BOTH arms — 3-shingle Jaccard against
    * the shared shingle build (the lexical arm) and exact quantized
    * cosine (the semantic arm) — and the fused score is
    * rrf = 1/(k + r_lex) + 1/(k + r_sem) over list ranks, missing-arm
    * contribution zero, top-K by (rrf desc, doc). Rank arithmetic is
    * integer; the two 1/(k+r) divisions and ONE fixed-order addition
    * are the only doubles, so both engines produce identical scores.
    *
    * Scale: the arms here are the same broadcast-anchors x corpus
    * row-level kernels as [[knnBrute]] / the dedup shingle paths — at
    * production scale each arm is served by its index (BM25 postings,
    * IVF lists; both built elsewhere in this module) and the fusion
    * join is list-sized (queries x 2*DEPTH rows), trivially
    * partitioned by query. This operator certifies the fusion
    * arithmetic the indexes feed.
    */
  def hybridRank(spark: SparkSession, dir: String): DataFrame = {
    // semantic arm — exact cosine, anchor set broadcast
    val vecs = qvecs(spark, dir)
    val qv = vecs.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val wSem = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("doc_id"))
    val sem = vecs.join(broadcast(qv), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        qcosine(qdot(col("q_qv"), col("qv")), col("q_n2"), col("n2")).as("cosine"))
      .withColumn("r_sem", row_number().over(wSem))
      .filter(col("r_sem") <= HYBRID_DEPTH)
      .select("query_id", "doc_id", "r_sem")

    // lexical arm — 3-shingle Jaccard over the shared shingle build
    val sh = DedupQueries.sharedShingles(spark, dir)
      .filter(size(col("sh_arr")) > 0)
      .select(col("doc_id"), col("sh_arr"))
    val qsh = sh.filter(col("doc_id") < NQ)
      .select(col("doc_id").as("query_id"), col("sh_arr").as("q_sh"))
    val wLex = Window.partitionBy(col("query_id")).orderBy(col("jaccard").desc, col("doc_id"))
    val lex = sh.join(broadcast(qsh), col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"),
        size(array_intersect(col("q_sh"), col("sh_arr"))).cast("long").as("c"),
        size(col("q_sh")).cast("long").as("n_a"),
        size(col("sh_arr")).cast("long").as("n_b"))
      .filter(col("c") > 0)
      .select(col("query_id"), col("doc_id"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
          .as("jaccard"))
      .withColumn("r_lex", row_number().over(wLex))
      .filter(col("r_lex") <= HYBRID_DEPTH)
      .select("query_id", "doc_id", "r_lex")

    // fusion — lex term + sem term, in that fixed order
    val wH = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("query_id", "doc_id"), "full")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("r_lex"), lit(0)).cast("long").as("r_lex"),
        coalesce(col("r_sem"), lit(0)).cast("long").as("r_sem"))
      .withColumn("rrf",
        when(col("r_lex") > 0, lit(1.0) / (lit(RRF_K) + col("r_lex"))).otherwise(lit(0.0)) +
          when(col("r_sem") > 0, lit(1.0) / (lit(RRF_K) + col("r_sem"))).otherwise(lit(0.0)))
      .withColumn("rank_hybrid", row_number().over(wH))
      .filter(col("rank_hybrid") <= K)
      .select("query_id", "doc_id", "r_lex", "r_sem", "rrf", "rank_hybrid")
  }

  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val vecs = qvecs(spark, dir)
    val queries = vecs.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    // broadcast the query set; one corpus scan, dot + cosine per row
    val scored = vecs
      .join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        qcosine(qdot(col("q_qv"), col("qv")), col("q_n2"), col("n2")).as("cosine"))
    topK(scored)
  }

  /** IVF: centroids = exact per-label component sums (the mean's 1/n
    * cancels inside cosine, so centroids stay integer-exact); every
    * vector is assigned to its nearest centroid; a query probes the
    * NPROBE nearest centroid lists and scans only those.
    */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val (vecs, ranked, asg) = ivfIndex(spark, dir)

    // a probe scans the whole logical list — the subsplit `sub` column
    // only bounds semDedup's pair join, never a query's candidate set
    val assigned = asg.select(col("vec_id"), col("list_id"))

    val probes = ranked
      .filter(col("vec_id") < NQ && col("arnk") <= NPROBE)
      .select(col("vec_id").as("query_id"), col("clabel").as("p_list"))
      .join(vecs.select(col("vec_id"), col("qv").as("q_qv"), col("n2").as("q_n2")),
        col("query_id") === col("vec_id"))
      .select("query_id", "p_list", "q_qv", "q_n2")

    // scan only the probed lists; score candidates row-level
    val scored = assigned
      .join(vecs, Seq("vec_id"))
      .join(broadcast(probes),
        col("p_list") === col("list_id") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        qcosine(qdot(col("q_qv"), col("qv")), col("q_n2"), col("n2")).as("cosine"))
    topK(scored)
  }

  /** SemDedup — semantic deduplication over embeddings (Abbas et al.
    * 2023, arXiv:2303.09540): cluster the corpus (here: the IVF
    * nearest-centroid assignment), compute pairwise cosine only WITHIN
    * each cluster, and keep one representative per semantic group —
    * deterministically the smallest vec_id with no closer-than-
    * threshold neighbor of smaller id in its cluster. Every vector is
    * output with its cluster, keep decision, and (for dropped rows)
    * the winning duplicate — filter-with-reasons, like q_quality_gate.
    *
    * Scale: the cluster-bounded all-pairs IS the SemDedup design point
    * — k grows with the corpus so cluster size stays bounded. Here the
    * effective k grows via the [[SEM_CAP]] hash-subsplit (pairs join
    * on (list_id, sub)), so per-sublist pair counts are bounded at
    * O(SEM_CAP^2) at ANY corpus size; pair generation is an equi-join,
    * and each pair costs one row-level integer-dot kernel (no explode,
    * no per-pair shuffle). The greedy smallest-id rule needs one
    * aggregate over the above-threshold pairs, not transitive closure.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val (vecs, _, assigned) = ivfIndex(spark, dir)

    val pairs = assigned.alias("a").join(assigned.alias("b"),
        col("a.list_id") === col("b.list_id") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    val close = pairs
      .join(vecs.select(col("vec_id").as("va"), col("qv").as("qa"), col("n2").as("na")), Seq("va"))
      .join(vecs.select(col("vec_id").as("vb"), col("qv").as("qb"), col("n2").as("nb")), Seq("vb"))
      .select(col("va"), col("vb"),
        qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= SEM_T)
    // a vector is dropped iff a smaller-id neighbor sits within the
    // threshold in its cluster; the smallest such id is the survivor
    // it duplicates
    val nn = close.groupBy(col("vb").as("vec_id")).agg(min(col("va")).as("dup_of"))
    assigned.join(nn, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** Incremental SemDedup — dedup-at-ingest for the semantic family,
    * the same production shape [[DedupQueries.dedupIncremental]] gives
    * the text family: an ARRIVING batch (vec_id % 10 = 0 stands in for
    * it) is deduped against the existing corpus by probing ONLY the
    * IVF lists nearest each new vector — the batch never joins the
    * full corpus and the corpus is never self-paired.
    *
    * Scale: the candidate join is batch-probes x corpus-assignment on
    * (list_id, sub) — the SAME [[SEM_CAP]] hash-subsplit that bounds
    * the batch path's pair join, so per-ingest cost is |batch| x
    * NPROBE x SEM_CAP exact kernels REGARDLESS of corpus size (the
    * r17 sf10 run caught the unsubsplit form joining each probe
    * against whole ~20k-member lists — ~10^9 kernels at 200k vectors,
    * a GC death that would be terminal at corpus scale). Each probe
    * compares against the sublist the NEW vector's own md5 selects —
    * a missed cross-sublist pair is the identical
    * finer-clustering approximation the batch path documents at
    * [[SEM_CAP]], with the identical catch probability. At 100 TB the
    * assignment table is a persisted index partitioned by
    * (list_id, sub) that each ingest batch point-probes. The affinity
    * ranking is read from the shared memoized index — at scale the
    * centroids are a stable, broadcast-sized artifact that ingest
    * reuses rather than recomputes.
    */
  def semDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (vecs, ranked, assigned) = ivfIndex(spark, dir)
    val corpus = assigned.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("corpus_id"), col("list_id"), col("sub"))
    // n_sub per list from the full assignment — the same definition
    // the batch subsplit used (n_lists rows, always broadcastable)
    val nsub = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_in_list"))
      .select(col("list_id"),
        expr(s"(n_in_list + ${SEM_CAP - 1}) div $SEM_CAP").as("n_sub"))
    // each new vector probes its NPROBE nearest lists (the ranking the
    // index already carries), not just its assignment — a near-dup
    // sitting across the assignment boundary is still found; within
    // each probed list it reads ONE sublist, keyed by its own md5
    val probes = ranked.filter(col("vec_id") % 10 === 0 && col("arnk") <= NPROBE)
      .select(col("vec_id").as("new_id"), col("clabel").as("list_id"))
      .join(broadcast(nsub), Seq("list_id"))
      .select(col("new_id"), col("list_id"),
        pmod(conv(substring(md5(concat(lit("sub:"), col("new_id").cast("string"))), 1, 8), 16, 10)
          .cast("long"), col("n_sub")).as("sub"))
    val close = probes.join(corpus, Seq("list_id", "sub"))
      .join(vecs.select(col("vec_id").as("new_id"), col("qv").as("qa"), col("n2").as("na")),
        Seq("new_id"))
      .join(vecs.select(col("vec_id").as("corpus_id"), col("qv").as("qb"), col("n2").as("nb")),
        Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= SEM_T)
    val nn = close.groupBy(col("new_id")).agg(min(col("corpus_id")).as("dup_of"))
    assigned.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("list_id"))
      .join(nn, col("vec_id") === col("new_id"), "left")
      .select(col("vec_id"), col("list_id"),
        col("dup_of").isNull.as("kept"), col("dup_of"))
  }

  /** Dev diagnostic (Dev `ivfprof`): member count per (list_id, sub)
    * sublist of the subsplit IVF assignment — the scale evidence that
    * semDedup's pair generation stays bounded regardless of corpus
    * size (pairs per sublist = n*(n-1)/2 <= ~SEM_CAP^2/2).
    */
  private[graft] def ivfProfile(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, assigned) = ivfIndex(spark, dir)
    assigned.groupBy(col("list_id"), col("sub"))
      .agg(count(lit(1)).as("n_members"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_centroids" -> centroids,
    "q_emb_stats" -> embStats,
    "q_knn_recall" -> knnRecall,
    "q_knn_brute" -> knnBrute,
    "q_knn_ivf" -> knnIvf,
    "q_knn_sq" -> knnSq,
    "q_hybrid_rank" -> hybridRank,
    "q_semdedup" -> semDedup,
    "q_semdedup_incremental" -> semDedupIncremental
  )

  private val compsCte: String =
    """q AS (
      |  SELECT vec_id, label,
      |         generate_subscripts(embedding, 1) AS p,
      |         CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS q
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM q GROUP BY vec_id
      |)""".stripMargin

  /** Shared oracle CTE block: centroid build, affinity ranking, and the
    * rank-1 assignment — mirrored by q_knn_ivf, q_semdedup, and
    * q_semdedup_incremental (assumes `$compsCte` precedes it).
    */
  private val ivfAssignCte: String =
    """cent AS (
      |  SELECT label, p, CAST(sum(q) AS BIGINT) AS sumq FROM q GROUP BY label, p
      |), cent_norm AS (
      |  SELECT label, CAST(sum(sumq * sumq) AS BIGINT) AS c2 FROM cent GROUP BY label
      |), aff AS (
      |  SELECT v.vec_id AS vid, c.label AS clabel,
      |         CAST(sum(v.q * c.sumq) AS DOUBLE) /
      |           (sqrt(CAST(vn.n2 AS DOUBLE)) * sqrt(CAST(cn.c2 AS DOUBLE))) AS aff
      |  FROM q v
      |  JOIN cent c ON v.p = c.p
      |  JOIN norms vn ON vn.vec_id = v.vec_id
      |  JOIN cent_norm cn ON cn.label = c.label
      |  GROUP BY v.vec_id, c.label, vn.n2, cn.c2
      |), assigned AS (
      |  SELECT vid AS vec_id, clabel AS list_id FROM (
      |    SELECT vid, clabel, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY aff DESC, clabel) AS arnk
      |    FROM aff
      |  ) x WHERE arnk = 1
      |)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_centroids" ->
      """WITH q AS (
        |  SELECT label,
        |         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
        |         CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS qc
        |  FROM embeddings
        |)
        |SELECT label, pos, count(*) AS n_vecs,
        |       CAST(CAST(sum(qc) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS c
        |FROM q GROUP BY label, pos""".stripMargin,
    "q_emb_stats" ->
      """WITH q AS (
        |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
        |         CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS qc
        |  FROM embeddings
        |)
        |SELECT pos, count(*) AS n_vecs,
        |       CAST(sum(CAST(qc AS DECIMAL(38,0))) AS BIGINT) AS sum_q,
        |       CAST(sum(CAST(qc AS DECIMAL(38,0)) * qc) AS BIGINT) AS sum_q2,
        |       min(qc) AS min_q, max(qc) AS max_q
        |FROM q GROUP BY pos""".stripMargin,
    // both arms re-derived (shingle CTE mirrors the dedup family's;
    // q/norms is the shared comps CTE), ranks fused with the same
    // fixed-order 1/(k+r) arithmetic
    "q_hybrid_rank" ->
      s"""WITH $compsCte,
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), sh0 AS (
        |  SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS s
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
        |lexp AS (
        |  SELECT a.doc_id AS query_id, b.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND b.doc_id <> a.doc_id
        |  WHERE a.doc_id < $NQ
        |  GROUP BY 1, 2
        |), lexr AS (
        |  SELECT query_id, p.doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY CAST(c AS DOUBLE) / CAST(za.n + zb.n - c AS DOUBLE) DESC,
        |                    p.doc_id) AS r_lex
        |  FROM lexp p
        |  JOIN sizes za ON za.doc_id = p.query_id
        |  JOIN sizes zb ON zb.doc_id = p.doc_id
        |), lex AS (SELECT query_id, doc_id, r_lex FROM lexr WHERE r_lex <= $HYBRID_DEPTH),
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM q a JOIN q b ON a.p = b.p AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < $NQ
        |  GROUP BY 1, 2
        |), semr AS (
        |  SELECT query_id, d.doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY CAST(dot AS DOUBLE) /
        |                    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) DESC,
        |                    d.doc_id) AS r_sem
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.query_id
        |  JOIN norms nb ON nb.vec_id = d.doc_id
        |), sem AS (SELECT query_id, doc_id, r_sem FROM semr WHERE r_sem <= $HYBRID_DEPTH),
        |fused AS (
        |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
        |         coalesce(l.doc_id, s.doc_id) AS doc_id,
        |         CAST(coalesce(l.r_lex, 0) AS BIGINT) AS r_lex,
        |         CAST(coalesce(s.r_sem, 0) AS BIGINT) AS r_sem
        |  FROM lex l FULL JOIN sem s ON l.query_id = s.query_id AND l.doc_id = s.doc_id
        |), scoredf AS (
        |  SELECT query_id, doc_id, r_lex, r_sem,
        |         (CASE WHEN r_lex > 0 THEN CAST(1 AS DOUBLE) / ($RRF_K + r_lex)
        |               ELSE CAST(0 AS DOUBLE) END)
        |         + (CASE WHEN r_sem > 0 THEN CAST(1 AS DOUBLE) / ($RRF_K + r_sem)
        |                 ELSE CAST(0 AS DOUBLE) END) AS rrf
        |  FROM fused
        |)
        |SELECT query_id, doc_id, r_lex, r_sem, rrf, rank_hybrid FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf DESC, doc_id) AS INT) AS rank_hybrid
        |  FROM scoredf
        |) z WHERE rank_hybrid <= $K""".stripMargin,
    "q_knn_brute" -> bruteOracle,
    // recall@k audit: both pipelines run as nested-WITH subqueries of
    // the same oracle text the individual queries are checked against
    "q_knn_recall" ->
      s"""WITH brute AS (
        |$bruteOracle
        |), ivf AS (
        |$ivfOracle
        |)
        |SELECT b.query_id, count(*) AS k,
        |       CAST(sum(CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |       CAST(sum(CASE WHEN v.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE) AS recall
        |FROM brute b
        |LEFT JOIN ivf v ON v.query_id = b.query_id AND v.neighbor_id = b.neighbor_id
        |GROUP BY b.query_id""".stripMargin,
    "q_knn_ivf" -> ivfOracle,
    // int8 codes: m = GREATEST(max|q|, 1) per vector; the CASE keeps
    // the // floor division on non-negative operands in both engines
    "q_knn_sq" ->
      s"""WITH $compsCte,
        |m AS (SELECT vec_id, GREATEST(max(abs(q)), 1) AS m FROM q GROUP BY vec_id),
        |q8 AS (
        |  SELECT q.vec_id, q.p,
        |         CASE WHEN q.q < 0 THEN -((abs(q.q) * 254 + m.m) // (2 * m.m))
        |              ELSE (q.q * 254 + m.m) // (2 * m.m) END AS c
        |  FROM q JOIN m ON m.vec_id = q.vec_id
        |), norms8 AS (SELECT vec_id, CAST(sum(c * c) AS BIGINT) AS n28 FROM q8 GROUP BY vec_id),
        |dots8 AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         CAST(sum(a.c * b.c) AS BIGINT) AS dot8
        |  FROM q8 a JOIN q8 b ON a.p = b.p AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id < $NQ
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT query_id, neighbor_id, sq_cosine FROM (
        |    SELECT query_id, neighbor_id, sq_cosine,
        |           ROW_NUMBER() OVER (PARTITION BY query_id
        |             ORDER BY sq_cosine DESC, neighbor_id) AS srnk
        |    FROM (
        |      SELECT query_id, neighbor_id,
        |             CAST(dot8 AS DOUBLE) /
        |               (sqrt(CAST(na.n28 AS DOUBLE)) * sqrt(CAST(nb.n28 AS DOUBLE))) AS sq_cosine
        |      FROM dots8
        |      JOIN norms8 na ON na.vec_id = query_id
        |      JOIN norms8 nb ON nb.vec_id = neighbor_id
        |    ) s0
        |  ) s WHERE srnk <= $RERANK
        |), dots AS (
        |  SELECT c.query_id, c.neighbor_id, c.sq_cosine,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN q a ON a.vec_id = c.query_id
        |  JOIN q b ON b.vec_id = c.neighbor_id AND a.p = b.p
        |  GROUP BY 1, 2, 3
        |), scored AS (
        |  SELECT query_id, neighbor_id, sq_cosine,
        |         CAST(dot AS DOUBLE) /
        |           (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = neighbor_id
        |)
        |SELECT query_id, neighbor_id, rnk, cosine, sq_cosine FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= $K""".stripMargin,
    "q_semdedup" ->
      s"""WITH $compsCte,
        |$ivfAssignCte,
        |asub AS (
        |  SELECT a.vec_id, a.list_id,
        |         ('0x' || substr(md5('sub:' || CAST(a.vec_id AS VARCHAR)), 1, 8))::UBIGINT
        |           % CAST(c.n_sub AS UBIGINT) AS sub
        |  FROM assigned a
        |  JOIN (SELECT list_id, (count(*) + ${SEM_CAP - 1}) // $SEM_CAP AS n_sub
        |        FROM assigned GROUP BY list_id) c USING (list_id)
        |), pairs AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM asub a JOIN asub b
        |    ON a.list_id = b.list_id AND a.sub = b.sub AND a.vec_id < b.vec_id
        |), dots AS (
        |  SELECT p.va, p.vb, CAST(sum(x.q * y.q) AS BIGINT) AS dot
        |  FROM pairs p
        |  JOIN q x ON x.vec_id = p.va
        |  JOIN q y ON y.vec_id = p.vb AND x.p = y.p
        |  GROUP BY 1, 2
        |), close AS (
        |  SELECT va, vb FROM dots
        |  JOIN norms na ON na.vec_id = va
        |  JOIN norms nb ON nb.vec_id = vb
        |  WHERE CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= $SEM_T
        |), nn AS (SELECT vb AS vec_id, min(va) AS dup_of FROM close GROUP BY vb)
        |SELECT a.vec_id, a.list_id,
        |       (n.dup_of IS NULL) AS kept, n.dup_of
        |FROM assigned a LEFT JOIN nn n ON n.vec_id = a.vec_id""".stripMargin,
    "q_semdedup_incremental" ->
      s"""WITH $compsCte,
        |$ivfAssignCte,
        |nsub AS (
        |  SELECT list_id, (count(*) + ${SEM_CAP - 1}) // $SEM_CAP AS n_sub
        |  FROM assigned GROUP BY list_id
        |), probes AS (
        |  SELECT x.new_id, x.list_id,
        |         ('0x' || substr(md5('sub:' || CAST(x.new_id AS VARCHAR)), 1, 8))::UBIGINT
        |           % CAST(c.n_sub AS UBIGINT) AS sub
        |  FROM (
        |    SELECT vid AS new_id, clabel AS list_id FROM (
        |      SELECT vid, clabel, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY aff DESC, clabel) AS prnk
        |      FROM aff WHERE vid % 10 = 0
        |    ) y WHERE prnk <= $NPROBE
        |  ) x JOIN nsub c USING (list_id)
        |), corpus AS (
        |  SELECT a.vec_id AS corpus_id, a.list_id,
        |         ('0x' || substr(md5('sub:' || CAST(a.vec_id AS VARCHAR)), 1, 8))::UBIGINT
        |           % CAST(c.n_sub AS UBIGINT) AS sub
        |  FROM assigned a JOIN nsub c USING (list_id)
        |  WHERE a.vec_id % 10 <> 0
        |), cand AS (
        |  SELECT p.new_id, c.corpus_id
        |  FROM probes p JOIN corpus c ON p.list_id = c.list_id AND p.sub = c.sub
        |), dots AS (
        |  SELECT cd.new_id, cd.corpus_id, CAST(sum(x.q * y.q) AS BIGINT) AS dot
        |  FROM cand cd
        |  JOIN q x ON x.vec_id = cd.new_id
        |  JOIN q y ON y.vec_id = cd.corpus_id AND x.p = y.p
        |  GROUP BY 1, 2
        |), close AS (
        |  SELECT new_id, corpus_id FROM dots
        |  JOIN norms na ON na.vec_id = new_id
        |  JOIN norms nb ON nb.vec_id = corpus_id
        |  WHERE CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= $SEM_T
        |), nn AS (SELECT new_id AS vec_id, min(corpus_id) AS dup_of FROM close GROUP BY new_id)
        |SELECT a.vec_id, a.list_id,
        |       (n.dup_of IS NULL) AS kept, n.dup_of
        |FROM assigned a LEFT JOIN nn n ON n.vec_id = a.vec_id
        |WHERE a.vec_id % 10 = 0""".stripMargin
  )

  private lazy val bruteOracle: String =
    s"""WITH $compsCte,
      |dots AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         CAST(sum(a.q * b.q) AS BIGINT) AS dot
      |  FROM q a JOIN q b ON a.p = b.p AND a.vec_id <> b.vec_id
      |  WHERE a.vec_id < $NQ
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT query_id, neighbor_id,
      |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      |  FROM dots
      |  JOIN norms na ON na.vec_id = query_id
      |  JOIN norms nb ON nb.vec_id = neighbor_id
      |)
      |SELECT query_id, neighbor_id, rnk, cosine FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
      |  FROM scored
      |) r WHERE rnk <= $K""".stripMargin

  private lazy val ivfOracle: String =
      s"""WITH $compsCte,
        |$ivfAssignCte,
        |probes AS (
        |  SELECT vid AS query_id, clabel AS list_id FROM (
        |    SELECT vid, clabel, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY aff DESC, clabel) AS prnk
        |    FROM aff WHERE vid < $NQ
        |  ) x WHERE prnk <= $NPROBE
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN assigned a ON p.list_id = a.list_id
        |  WHERE p.query_id <> a.vec_id
        |), dots AS (
        |  SELECT c.query_id, c.neighbor_id, CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN q a ON a.vec_id = c.query_id
        |  JOIN q b ON b.vec_id = c.neighbor_id AND a.p = b.p
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots
        |  JOIN norms na ON na.vec_id = query_id
        |  JOIN norms nb ON nb.vec_id = neighbor_id
        |)
        |SELECT query_id, neighbor_id, rnk, cosine FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= $K""".stripMargin
}
