package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-curation operators — the remaining stages a training-data
  * pipeline runs between raw ingestion and tokenization: benchmark
  * decontamination, deterministic stratified subsampling, overlapping
  * context-window chunking, BM25 relevance scoring, and a
  * skew-hardened aggregation built on [[graft.pipeline.Salting]].
  *
  * Determinism: every fraction is a single double division of exact
  * integer counts; the BM25 score spells one explicit IEEE expression
  * tree that the oracle repeats verbatim; sampling decisions compare
  * md5 hex prefixes (the house cross-engine RNG), never rand().
  *
  * Scale design: decontamination joins the corpus against the
  * benchmark's n-gram set — the benchmark side is tiny by construction
  * (held-out eval suites), so the planner broadcasts it and the corpus
  * side streams map-only. Sampling and chunking are pure per-row
  * expressions (no shuffle at all). BM25 shuffles once per aggregation
  * level like tf-idf. The salted aggregate demonstrates the two-phase
  * (salt → partial → merge) shape that survives a key holding half the
  * corpus, with the unsalted GROUP BY as its oracle.
  */
object CurationQueries extends graft.QueryModule {

  /** Benchmark decontamination: flag training documents sharing any
    * word-3-shingle with the held-out benchmark slice (doc_id % 20 = 0
    * — 5% of the corpus standing in for an eval suite). Reports the
    * absolute hit count and the contaminated-shingle fraction; docs
    * too short to shingle are excluded, mirroring the oracle's
    * shingle-driven derivation.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // the corpus 3-shingle build is the SAME shared materialization
    // the dedup family reads (DedupQueries.sharedShingles) — one
    // cached build per (session, dir) serves both families; the
    // size filter and bench flag are cheap expressions over the
    // cached frame
    val sh = DedupQueries.sharedShingles(spark, dir)
      .select("doc_id", "sh_arr")
      .filter(size(col("sh_arr")) > 0)
      .withColumn("is_bench", col("doc_id") % 20 === 0)

    // the benchmark's distinct shingle set — small side of the join;
    // no broadcast hint (same policy as lang_id/tfidf): the planner
    // broadcasts it from its size estimate, and a pathologically large
    // benchmark degrades to a shuffle join instead of an OOM
    val bench = sh.filter(col("is_bench"))
      .select(explode(col("sh_arr")).as("s")).distinct()

    val train = sh.filter(!col("is_bench"))
    val hits = train.select(col("doc_id"), explode(col("sh_arr")).as("s"))
      .join(bench, Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))

    train.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_sh"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_sh").cast("double"))
          .as("overlap_frac"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-filter decontamination pre-filter — the 100 TB shape of
    * [[decontaminate]]. The exact-join form above broadcasts the
    * benchmark's shingle STRINGS; once the benchmark grows past
    * broadcast size (a full eval-suite union is billions of n-grams)
    * that plan degrades to a corpus-wide shuffle. Here the benchmark
    * side instead compresses to a constant-size Bloom bitset
    * ([[graft.functions.BloomFilterAggregator]], BLOOM_WORDS*64 bits
    * regardless of benchmark cardinality), the corpus probes it with
    * row-local bit reads (map-only, no shuffle, no join), and ONLY the
    * Bloom-positive shingles — true hits plus a bounded false-positive
    * trickle — reach the exact verification join. One-sided error
    * makes this lossless: a Bloom negative is a certain non-member, so
    * the exact join's result is identical to [[decontaminate]]'s while
    * touching a fraction of the rows. K=3 positions per shingle by the
    * house Kirsch-Mitzenmacher scheme ((h1 + i*h2) mod M over the two
    * disjoint md5 windows — same decorrelation as
    * [[graft.functions.TextFunctions.minhashOrder]]).
    *
    * The 64k-bit M is deliberately small for the fixture so the
    * false-positive path actually executes (at sf0.01 the bench set
    * fills ~9% of the bits → a handful of `is_fp` rows); production
    * sizes M from the benchmark cardinality (m ≈ -n·ln(p)/ln(2)², still
    * KiB-to-MiB for billions of entries — the broadcast that always
    * fits). Output: every train doc with ≥1 Bloom-positive shingle,
    * its Bloom hit count, its exact hit count, and whether the doc was
    * a pure false positive.
    */
  private val BloomWords = 1024 // 65536 bits
  private val BloomM = BloomWords.toLong * 64

  private def bloomPositions(digest: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = (0 until 3).map { i =>
    (conv(substring(digest, 1, 8), 16, 10).cast("long") +
      lit(i.toLong) * conv(substring(digest, 17, 8), 16, 10).cast("long")) % lit(BloomM)
  }

  /** The 1-row benchmark Bloom bitset frame (column `bits`:
    * array<bigint>, BloomWords words) — shared by [[bloomPrune]] and
    * the driver-side [[bloomBits]] collector.
    */
  private def benchBloomFrame(spark: SparkSession, dir: String): DataFrame = {
    val bloomAgg = udaf(new graft.functions.BloomFilterAggregator(BloomWords))
    DedupQueries.sharedShingles(spark, dir)
      .select("doc_id", "sh_arr")
      .filter(size(col("sh_arr")) > 0 && col("doc_id") % 20 === 0)
      .select(explode(col("sh_arr")).as("s"))
      .select(md5(col("s")).as("d"))
      .select(explode(array(bloomPositions(col("d")): _*)).as("p"))
      .agg(bloomAgg(col("p")).as("bits"))
  }

  /** The benchmark Bloom bitset as a DRIVER-SIDE value — the artifact
    * a streaming ingest gate embeds as a literal (index-build-at-
    * startup, the same pattern as the memoized IVF index; the bitset
    * is KiB regardless of benchmark cardinality, so collecting the one
    * row is not a driver-side data loop).
    */
  def bloomBits(spark: SparkSession, dir: String): Seq[Long] =
    benchBloomFrame(spark, dir).head().getSeq[Long](0)

  /** SQL predicate: does ANY element of the array<string> column
    * `shCol` set all 3 Bloom positions in the array<bigint> literal
    * column `bitsCol`? Mirrors [[bloomPrune]]'s probe arithmetic
    * exactly (same KM positions over the two disjoint md5 windows,
    * same word/offset layout) — one definition of the probe for the
    * batch pruner and the streaming gate.
    */
  private[graft] def bloomProbeSql(shCol: String, bitsCol: String): String = {
    def pos(i: Int) =
      s"((cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) + " +
        s"$i * cast(conv(substring(md5(s), 17, 8), 16, 10) as bigint)) % $BloomM)"
    def bit(i: Int) =
      s"(shiftright(element_at($bitsCol, cast(${pos(i)} div 64 as int) + 1), " +
        s"cast(${pos(i)} % 64 as int)) & 1) = 1"
    s"exists($shCol, s -> ${bit(0)} AND ${bit(1)} AND ${bit(2)})"
  }

  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val M = BloomM

    val sh = DedupQueries.sharedShingles(spark, dir)
      .select("doc_id", "sh_arr")
      .filter(size(col("sh_arr")) > 0)
      .withColumn("is_bench", col("doc_id") % 20 === 0)

    def positions(digest: org.apache.spark.sql.Column) = bloomPositions(digest)

    val bloom = benchBloomFrame(spark, dir)

    // map-only probe: 3 bit reads per shingle against the broadcast
    // 8 KiB bitset; bit b of the filter lives in word b div 64 at
    // offset b mod 64 (same layout the aggregator writes)
    def bitSet(p: String): org.apache.spark.sql.Column =
      expr(s"(shiftright(element_at(bits, cast($p div 64 as int) + 1), " +
        s"cast($p % 64 as int)) & 1) = 1")
    val probed = sh.filter(!col("is_bench"))
      .select(col("doc_id"), explode(col("sh_arr")).as("s"))
      .withColumn("d", md5(col("s")))
      .withColumn("p0", positions(col("d"))(0))
      .withColumn("p1", positions(col("d"))(1))
      .withColumn("p2", positions(col("d"))(2))
      .crossJoin(broadcast(bloom))
      .withColumn("hit", bitSet("p0") && bitSet("p1") && bitSet("p2"))

    val perDoc = probed.groupBy("doc_id").agg(
      count(lit(1)).as("n_sh"),
      sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom"))

    // exact verification joins ONLY the Bloom-positive shingles
    val benchSet = sh.filter(col("is_bench"))
      .select(explode(col("sh_arr")).as("s")).distinct()
    val exact = probed.filter(col("hit")).select("doc_id", "s")
      .join(benchSet, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))

    perDoc.filter(col("n_bloom") > 0)
      .join(exact, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_sh"), col("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (coalesce(col("n_exact"), lit(0L)) === 0).as("is_fp"))
  }

  /** Robust (median/MAD) length outliers per language — the
    * high-breakdown companion to the 2-sigma gate [[outlier]]: mean
    * and sigma are themselves dragged by the extreme docs they are
    * meant to catch (a few 10 MB pages inflate sigma until nothing is
    * an outlier), while median and MAD tolerate up to 50% corruption.
    * Flag = |x - median| > 3 * MAD, MAD = median of absolute
    * deviations. Percentiles are the exact interpolated form (same
    * machinery and scale caveat as [[winsorize]]/q_median: exact
    * per-group percentile sorts within the language partition; the
    * approx variant is the 100 TB dial). The interpolated midpoints
    * are .5/.25-granular binary rationals of integer inputs — exact
    * doubles both engines reproduce bit-identically.
    */
  def madOutlier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
    val med = docs.groupBy("lang").agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = docs.join(med, Seq("lang"))
      .withColumn("adev", abs(col("n_chars") - col("med")))
    val mad = dev.groupBy("lang").agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(mad, Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("med"), col("mad"),
        (col("adev") > lit(3.0) * col("mad")).as("is_outlier"))
  }

  /** Per-source distribution drift: the exact two-sample
    * Kolmogorov-Smirnov statistic of each source's document-length
    * distribution against the REST of the corpus — the monitoring
    * stage that catches a crawler regression or a source gone
    * boilerplate (its length histogram shifts) before it pollutes a
    * training mix. KS = sup over x of |F_s(x) - F_rest(x)|; the sup
    * of a step-function difference is attained at a jump point, so
    * evaluating at every distinct length is exact, and the float-free
    * cross-multiplied form |cum_s*n_rest - cum_rest*n_s| keeps the
    * comparison in exact integers (DECIMAL(18,0) products -> loud
    * overflow past 1e18 docs, the house policy; the single reported
    * `ks` ratio is one IEEE division both engines reproduce).
    *
    * Scale: one shuffle to count (source, length) cells; the dense
    * grid is source-domain x length-domain — METADATA cardinality
    * (doc lengths are bounded; a corpus with unbounded value domains
    * buckets them first, same dial as the range join's W), never
    * corpus rows. The per-source cumsum windows partition by source;
    * the one unpartitioned window runs over the distinct-length
    * domain only. Output: one row per source with the exact KS
    * numerator and its sample sizes.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, dir).select("source", "n_chars")
    val counts = docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val sources = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val values = docs.select("n_chars").distinct()
    val total = docs.agg(count(lit(1)).as("n_tot"))

    val gcum = counts.groupBy("n_chars").agg(sum(col("c")).as("g"))
      .withColumn("cum_g", sum(col("g")).over(Window.orderBy("n_chars")))
      .select("n_chars", "cum_g")

    val dense = sources.crossJoin(values)
      .join(counts, Seq("source", "n_chars"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_s",
        sum(col("c")).over(Window.partitionBy("source").orderBy("n_chars")))
      .join(gcum, Seq("n_chars"))
      .crossJoin(broadcast(total))

    val dec = DecimalType(18, 0)
    dense
      .withColumn("n_rest", col("n_tot") - col("n_s"))
      .withColumn("d_num",
        abs(col("cum_s").cast(dec) * col("n_rest").cast(dec) -
          (col("cum_g") - col("cum_s")).cast(dec) * col("n_s").cast(dec)))
      .groupBy("source")
      .agg(
        first(col("n_s")).as("n_s"),
        first(col("n_rest")).as("n_rest"),
        max(col("d_num")).cast("long").as("ks_num"))
      .withColumn("ks",
        col("ks_num").cast("double") /
          (col("n_s").cast("double") * col("n_rest").cast("double")))
  }

  /** Deterministic stratified subsample: keep a document iff the md5
    * of its id falls under its language's hex threshold — 50% for
    * `en`, 25% for everything else. Pure map-only filter: no shuffle,
    * no rand(), reproducible across retries/engines, and the kept set
    * of a lower rate is a subset of a higher one (threshold monotone),
    * which is how production pipelines carve nested corpus tiers.
    */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 4))
      .withColumn("threshold", when(col("lang") === "en", lit("8000")).otherwise(lit("4000")))
      .filter(col("bucket") < col("threshold"))
      .select("doc_id", "lang", "bucket")

  /** Weight-proportional Poisson sampling with Horvitz-Thompson
    * reweighting — the "sample long documents more, reweight so
    * estimates stay unbiased" pass of corpus curation. Inclusion
    * probability p_i = n_chars / (5 * max_chars); a doc is kept iff
    * u(doc_id) < 2^32 * p_i, evaluated as the all-integer inequality
    * 5 * u * max_w < 2^32 * n_chars (u = first 8 md5 hex chars of the
    * salted id — uniform on [0, 2^32), reproducible, partition-
    * independent). ht_weight = 1/p_i makes any sample-side sum an
    * unbiased corpus estimate. Products run in DECIMAL on the Spark
    * side so a width overflow is a loud NULL, not a silent long wrap
    * (the oracle's BIGINT arithmetic errors loudly — same policy).
    *
    * Shape: map-only over the corpus plus a 1-row broadcast max; no
    * shuffle, no order dependence — at 100 TB this is a pure scan.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val stats = docs.agg(max(col("n_chars")).as("max_w"))
    docs
      .withColumn("u",
        conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"))
      .crossJoin(broadcast(stats))
      .filter(
        col("u").cast("decimal(38,0)") * col("max_w").cast("decimal(38,0)") * lit(5) <
          lit(4294967296L).cast("decimal(38,0)") * col("n_chars").cast("decimal(38,0)"))
      .select(col("doc_id"), col("n_chars"), col("u"),
        ((col("max_w") * lit(5)).cast("double") / col("n_chars").cast("double"))
          .as("ht_weight"))
  }

  /** Exact global rank + percentile of every document by n_chars with
    * NO single-task pass over corpus rows — the curriculum-ordering /
    * quantile-assignment primitive a naive
    * `rank() over (order by ...)` turns into a one-task sort of the
    * whole corpus. Shape: counts per DISTINCT value (one shuffle,
    * value-domain-sized output), exclusive prefix sum over the value
    * domain through the [[graft.pipeline.PrefixSum]] L-level tree
    * (bounded rows per task at any domain size), then a value-domain
    * join back (AQE broadcasts it when small). rank = 1 + count of
    * strictly smaller values — RANK() semantics with ties exactly;
    * pct = below / (N - 1) is PERCENT_RANK(), one double division of
    * exact integers.
    */
  def globalRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val vals = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val cum = graft.pipeline.PrefixSum.exclusiveOffsets(
      vals, Seq.empty, "n_chars", "cnt", "below")
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    docs.join(cum.select(col("n_chars"), col("below")), Seq("n_chars"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("n_chars"),
        (col("below") + lit(1L)).as("rk"),
        (col("below").cast("double") / (col("n_docs") - lit(1)).cast("double"))
          .as("pct"))
  }

  /** Per-stratum fixed quota: the 10 documents per language with the
    * smallest id-hash — the deterministic equivalent of per-group
    * reservoir sampling (uniform because md5 is, reproducible because
    * nothing is random). One window pass per stratum; at corpus scale
    * this is a partial TopK per group (WindowGroupLimit pushes the
    * limit into the sort), never a full per-group sort.
    */
  def sampleGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", md5(concat(lit("grp:"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select("doc_id", "lang", "h", "rn")
  }

  /** Overlapping context-window chunking: token windows of 8 with
    * stride 4 (half-overlap), the standard shape for long-document
    * training and retrieval indexing. One row-level expression per doc
    * (sequence → slice → join): no shuffle; at 100 TB this is a pure
    * map stage whose output partitioning follows the input's.
    */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0, size(toks) - 1, 4)")).as("st"))
      .select(
        col("doc_id"),
        (col("st") / 4).cast("int").as("chunk_id"),
        expr("array_join(slice(toks, st + 1, 8), ' ')").as("chunk_text"),
        least(lit(8), size(col("toks")) - col("st")).cast("int").as("n_tokens"))

  /** Repeated-segment (boilerplate) removal — the C4/RefinedWeb line-
    * dedup pass re-expressed over token segments (the fixture text has
    * no newlines): a document is cut into consecutive 8-token segments,
    * a segment that appears in >= 3 distinct documents corpus-wide is
    * boilerplate (headers, footers, chants), and each document is
    * reassembled from its surviving segments in order. Output carries
    * the removal accounting plus an md5 digest of the reassembled text
    * so the oracle certifies the exact cleaned string.
    *
    * Shape: segmentation is a row-level expression (sequence → slice),
    * one explode+groupBy builds the segment document-frequency table,
    * one equi-join annotates segments, one per-doc aggregate
    * reassembles (array_sort of (seg_idx, seg) structs — collect_list
    * drops the NULLed removed segments). Three shuffles total, all on
    * keys that partition freely; the df table is the only corpus-wide
    * state and it shrinks with dedup pressure. At 100 TB this is the
    * same shape as the shingle-df build the dedup family already runs.
    */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val segs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, (size(toks) - 1) div 8), " +
            "i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"))
          .as(Seq("seg_idx", "seg")))
    val df = segs.groupBy(col("seg")).agg(countDistinct(col("doc_id")).as("n_docs"))
    segs.join(df, Seq("seg"))
      .withColumn("keep", col("n_docs") < 3)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("keep"), size(split(col("seg"), " ")).cast("long"))
          .otherwise(0L)).as("n_kept_tokens"),
        collect_list(when(col("keep"), struct(col("seg_idx"), col("seg"))))
          .as("kept"))
      .select(
        col("doc_id"), col("n_segments"), col("n_removed"), col("n_kept_tokens"),
        md5(array_join(
          transform(array_sort(col("kept")), s => s.getField("seg")), " "))
          .as("cleaned_digest"))
  }

  /** BM25 (k1 = 1.2, b = 0.75) top-5 terms per document. The idf
    * factor is the monotone-equivalent N/df ratio (same policy as
    * tf-idf: no log — libm is only 1-ulp-accurate and could flip
    * cross-engine ranks). The whole score is ONE explicit expression
    * tree over exact integer inputs, repeated verbatim in the oracle,
    * so both engines produce bit-identical doubles and therefore
    * identical ranks.
    */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    // every downstream frame (df, dl, corpus stats, the scored join)
    // derives from the SHARED (doc, term, tf) materialization — the
    // smallest shape that still determines everything; dl = sum of tf
    // counts per doc == the raw token count, no second pass over raw
    // tokens.
    val tf = TextAnalysisQueries.sharedTermFreq(spark, dir)
    // dl and df read the staged doc-/vocabulary-level statistics
    // (sharedDocStats / sharedTokenStats) instead of re-aggregating
    // the tf build per run — identical exact integer values.
    val dl = TextAnalysisQueries.sharedDocStats(spark, dir)
      .select(col("doc_id"), col("n_tokens").as("dl"))
    val df = TextAnalysisQueries.sharedTokenStats(spark, dir)
      .select(col("tok"), col("df"))
    // corpus stats ride in on a 1-row broadcast cross join — no
    // driver-side collect, so the plan is one job end-to-end
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val scored = tf.join(df, Seq("tok")).join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("score",
        (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") /
              (col("sum_dl").cast("double") / col("n_docs").cast("double"))))) *
          (col("n_docs").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("doc_id", "tok", "tf", "df", "dl", "score", "rnk")
  }

  /** Skew-hardened aggregate: lineitem's return-flag column has three
    * values covering the whole table — the canonical hot-key shape.
    * The salted two-phase plan (salt on a row attribute → partial
    * aggregate over (key, salt) → merge per key) bounds any single
    * reducer at 1/buckets of the hot key. Decimal partial sums keep
    * the result exact regardless of how rows split across salts; the
    * oracle is the PLAIN single-phase GROUP BY, so the hash match
    * certifies the salted decomposition is lossless.
    */
  def skewAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Salting
    // one salted pass computes BOTH partials (sum + count) — a
    // twoPhaseAgg call per aggregate would scan and shuffle the fact
    // table once per output column
    Tables.lineitem(spark, dir)
      .withColumn("q", col("l_quantity").cast("decimal(18,2)"))
      .withColumn("__salt", Salting.salt(col("l_orderkey"), 16))
      .groupBy(col("l_returnflag"), col("__salt"))
      .agg(sum(col("q")).as("__psum"), count(col("q")).as("__pcnt"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("__psum")).as("sum_q"), sum(col("__pcnt")).as("n_rows"))
      .select(
        col("l_returnflag"),
        col("sum_q").cast("double").as("sum_qty"),
        col("n_rows"))
  }

  /** Batch per-source token quota, prefix-cap form: a doc is kept iff
    * the running token total of its source (in doc_id order, itself
    * included) stays within the budget — the window-expressible batch
    * analog of StreamingOps.sourceTokenBudget (which does true
    * first-fit: later small docs may still fit after a large one is
    * skipped; a running-kept-sum is not a plain window, which is
    * exactly why the streaming form uses flatMapGroupsWithState).
    * The running sum is a two-level prefix sum so no single task ever
    * scans a whole source (see below); all arithmetic is integer.
    */
  def quota(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    // Sources are FEW (a handful of crawls/datasets), so a plain
    // per-source window would funnel each source's entire history
    // through ONE WindowExec task — the same single-task scan q_pack
    // avoids. PrefixSum.exclusiveOffsets computes the running total as
    // a reduction tree within each source: no task ever sees more
    // than 1000 rows until the top level, which carries n_source/10^6
    // bucket totals at the default depth (see PrefixSum's bound —
    // deeper trees are one parameter away).
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.pipeline.PrefixSum
      .exclusiveOffsets(docs, Seq("source"), "doc_id", "n_tok", "cum_off")
      .withColumn("cum_tok", col("cum_off") + col("n_tok"))
      .withColumn("kept", col("cum_tok") <= budget)
      .select("doc_id", "source", "n_tok", "cum_tok", "kept")
  }

  /** Statistical length-outlier gate: flag documents whose char count
    * sits more than 2 standard deviations from their language's mean —
    * the distribution-based cousin of the fixed-threshold quality
    * gates. The 2-sigma test is evaluated as the exact integer
    * inequality (n*x - s)^2 > 4*(n*s2 - s^2) (the float form
    * rearranged to cancel every division), so both engines decide the
    * boundary identically; only the reported mean is a double, one
    * division of exact sums.
    *
    * Width: every product runs in DECIMAL(38,0), not int64 — at corpus
    * scale n*s2 alone (n ~ 10^12 docs x s2 ~ 10^22) is ~10^34, far past
    * long range, and non-ANSI long arithmetic would WRAP silently and
    * corrupt is_outlier flags. Decimal keeps the inequality exact up to
    * 38 digits, and past that Spark yields NULL rather than a wrong
    * boolean — a loud, detectable failure. The squared terms stay
    * under 10^35 for any corpus below ~10^17 chars total per language.
    * Fixture booleans are unchanged, so the int-typed oracle still
    * hash-matches.
    *
    * Scale shape: one tiny per-language stats aggregate broadcast back
    * over the corpus — two map passes and one small shuffle, no
    * quadratic stage.
    */
  def outlier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
    val x = col("n_chars").cast("decimal(19,0)")
    val stats = docs.groupBy("lang").agg(
      count(lit(1)).cast("decimal(19,0)").as("n"),
      sum(x).as("s"),
      sum(x * x).as("s2")) // (19,0)*(19,0) -> decimal(38,0), no wrap
    docs.join(stats, Seq("lang"))
      .withColumn("nx_s", col("n") * x - col("s"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        (col("s").cast("double") / col("n").cast("double")).as("lang_mean"),
        (col("nx_s") * col("nx_s")
          > lit(4) * (col("n") * col("s2") - col("s") * col("s"))).as("is_outlier"))
  }

  /** Winsorization: clip each document's length to its language's
    * [P5, P95] band — the clip-don't-drop alternative to the outlier
    * gate for features feeding downstream statistics. Exact
    * interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, bit-identical — same policy as q_median); the
    * clip itself is least/greatest, no branching hazard. Same scale
    * shape as q_outlier: tiny per-language stats, broadcast back.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "n_chars")
    val bands = docs.groupBy("lang").agg(
      expr("percentile(n_chars, 0.05)").as("p5"),
      expr("percentile(n_chars, 0.95)").as("p95"))
    docs.join(bands, Seq("lang"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("p5"), col("p95"),
        least(greatest(col("n_chars").cast("double"), col("p5")), col("p95"))
          .as("clipped"))
  }

  /** Sequence packing (concatenate-and-chop): lay every document's
    * tokens end-to-end in doc_id order and chop the stream into fixed
    * 256-token training windows; each doc reports its global token
    * offset and the first/last window it lands in. The global prefix
    * sum is [[graft.pipeline.PrefixSum]]'s reduction tree — a plain
    * global window would put the entire corpus through ONE WindowExec
    * task; here only n/10^6 top-level bucket totals do at the default
    * depth (~10^4 rows for a 100 TB corpus; the bound and the levels
    * dial are documented on PrefixSum). All arithmetic is integer, so
    * both engines agree exactly.
    */
  def pack(spark: SparkSession, dir: String): DataFrame = {
    val B = 256L // tokens per packed training sequence
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.pipeline.PrefixSum
      .exclusiveOffsets(docs, Seq.empty, "doc_id", "n_tok", "offset")
      .select(
        col("doc_id"), col("n_tok"), col("offset"),
        expr(s"offset div $B").as("bin_start"),
        expr(s"(offset + n_tok - 1) div $B").as("bin_end"))
  }

  /** Packed-sequence boundary masks — the companion [[pack]] feeds:
    * for every 256-token training bin, the ordered in-bin start
    * offsets of the documents it contains (what cross-document
    * attention-mask construction consumes; a doc entering mid-bin
    * starts at its clamped local offset, a doc carried over from the
    * previous bin contributes boundary 0). Bins come from exploding
    * each doc's [bin_start, bin_end] span — row count is
    * total_tokens/B + n_docs, linear. Boundaries emit as a
    * comma-joined string ordered by (offset, doc_id): deterministic,
    * and scalar-typed so the cross-engine hash compare stays exact
    * (array cells don't survive the harness's sort).
    */
  def packMasks(spark: SparkSession, dir: String): DataFrame = {
    val B = 256L
    pack(spark, dir)
      .select(col("doc_id"), col("offset"),
        explode(expr("sequence(bin_start, bin_end)")).as("bin"))
      .withColumn("local_start", greatest(col("offset") - col("bin") * lit(B), lit(0L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(array_sort(collect_list(struct(col("local_start"), col("doc_id")))),
            x => x.getField("local_start").cast("string")), ",").as("boundaries"))
  }

  /** The END-TO-END curation pipeline — what a user of this library
    * actually ships: every document dispositioned through the full
    * chain (exact dedup → near-dup dedup → benchmark exclusion →
    * decontamination → quality gate), with the FIRST failing stage as
    * the audit reason and a leakage-safe split for the survivors. One
    * query = the whole "raw crawl in, training corpus out" contract;
    * every constituent is an independently hash-checked operator
    * ([[graft.operators.DedupQueries.dedupClusters]], [[qualityGate]],
    * [[decontaminate]], [[leakSafeSplit]]), and the composed oracle
    * re-derives all five stages in SQL, so the hash match certifies
    * the COMPOSITION (join domains, NULL handling at each stage
    * boundary, reason precedence), not just the parts.
    *
    * Reason precedence (first match wins): exact_dup (not its text
    * class's min doc_id), near_dup (carries a cluster label other than
    * itself), benchmark (the held-out eval slice, doc_id % 20 = 0 —
    * eval docs must never train), contaminated (shares a 3-shingle
    * with the benchmark), low_quality (fails the composite gate).
    * keep = no reason; split only for keepers.
    *
    * Scale shape: five equi-joins on doc_id, every input either a
    * memoized shared build (duplicate classes, cluster labels) or a
    * map-heavy checked operator; nothing here adds a shuffle beyond
    * what the constituents already do, so the composition inherits
    * their 100 TB stories unchanged.
    */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val exactMap = DedupQueries.exactClassMap(spark, dir)
    val labels = DedupQueries.dedupClusters(spark, dir)
    val qg = qualityGate(spark, dir).select(col("doc_id"), col("keep").as("q_keep"))
    val deco = decontaminate(spark, dir).select("doc_id", "contaminated")
    val spl = leakSafeSplit(spark, dir).select("doc_id", "split")

    docs
      .join(exactMap, Seq("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .join(qg, Seq("doc_id"))
      .join(deco, Seq("doc_id"), "left")
      .join(spl, Seq("doc_id"))
      .withColumn("reason",
        when(col("exact_rep") =!= col("doc_id"), "exact_dup")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
            "near_dup")
          .when(col("doc_id") % 20 === 0, "benchmark")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .when(!col("q_keep"), "low_quality"))
      .select(col("doc_id"),
        col("reason").isNull.as("keep"),
        col("reason"),
        when(col("reason").isNull, col("split")).as("split"))
  }

  /** [[curatedCorpus]]'s INCREMENTAL form — how a 100 TB pipeline
    * actually runs day to day: an ARRIVING batch (doc_id % 10 = 0
    * stands in for it) is dispositioned against the standing corpus
    * without ever re-processing the corpus itself. Stages and reason
    * precedence mirror the batch composition where the semantics are
    * batch-vs-corpus: exact_dup = byte-identical to a corpus document
    * (hash semi-join against the corpus md5 set), near_dup = has a
    * verified corpus near-dup from the incremental band-probe pipeline
    * ([[graft.operators.DedupQueries.dedupIncremental]] — batch x
    * corpus, never corpus^2), benchmark = the held-out eval slice,
    * contaminated = shares a 3-shingle with it, low_quality = the
    * row-local quality expression (the SAME
    * [[graft.operators.TextAnalysisQueries.qualityExpr]] the streaming
    * ingest gate applies — corpus-relative stages like the 2-sigma
    * outlier need corpus statistics and belong to the batch
    * recompute). Intra-batch duplicates likewise: ingest-order state
    * is the streaming gate's job
    * ([[graft.streaming.StreamingOps.ingestGateStream]]). The
    * composed oracle re-derives every stage, so the hash certifies
    * the batch-vs-corpus domain split at each boundary.
    */
  def curatedIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysisQueries
    val docs = Tables.documents(spark, dir)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpusHashes = docs.filter(col("doc_id") % 10 =!= 0)
      .select(md5(col("text")).as("__h")).distinct()
      .withColumn("__exact", lit(true))
    val near = DedupQueries.dedupIncremental(spark, dir)
      .select(col("new_id").as("doc_id")).distinct()
      .withColumn("__near", lit(true))
    val deco = decontaminate(spark, dir).select("doc_id", "contaminated")

    batch
      .select(col("doc_id"), md5(col("text")).as("__h"),
        (TextAnalysisQueries.qualityExpr(split(col("text"), " ")) >= 0.5)
          .as("__q_ok"))
      .join(corpusHashes, Seq("__h"), "left")
      .join(near, Seq("doc_id"), "left")
      .join(deco, Seq("doc_id"), "left")
      .withColumn("reason",
        when(coalesce(col("__exact"), lit(false)), "exact_dup")
          .when(coalesce(col("__near"), lit(false)), "near_dup")
          .when(col("doc_id") % 20 === 0, "benchmark")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .when(!coalesce(col("__q_ok"), lit(false)), "low_quality"))
      .select(col("doc_id"), col("reason").isNull.as("keep"), col("reason"))
  }

  /** The composite curation gate — the decision a pipeline actually
    * executes: keep a document iff its quality score clears 0.5 AND it
    * is not repetitive AND its length is not a 2-sigma outlier, with
    * each reason carried in the output (auditable drops, the
    * filter-with-reasons shape). Pure composition of three checked
    * operators; docs too short to produce a bigram can't be
    * boilerplate, so their repetition flag coalesces to false.
    */
  def qualityGate(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysisQueries.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    val rep = TextAnalysisQueries.repetition(spark, dir)
      .select(col("doc_id"), col("repetitive"))
    val outl = outlier(spark, dir).select(col("doc_id"), col("is_outlier"))
    quality
      .join(rep, Seq("doc_id"), "left")
      .join(outl, Seq("doc_id"))
      .select(
        col("doc_id"), col("quality"),
        coalesce(col("repetitive"), lit(false)).as("repetitive"),
        col("is_outlier"),
        (col("quality") >= 0.5 &&
          !coalesce(col("repetitive"), lit(false)) && !col("is_outlier")).as("keep"))
  }

  /** Leakage-safe train/val/test split: the deterministic hash split
    * every training pipeline needs, with the guard naive splits miss —
    * NEAR-DUPLICATES MUST LAND IN THE SAME SPLIT, or the test set is
    * contaminated by paraphrases of training documents. The split unit
    * is therefore the near-dup CLUSTER (q_dedup_clusters labels;
    * singletons form their own group), hashed md5("split:" || group)
    * into 50/25/25 by the first-byte ranges [00,80) / [80,c0) /
    * [c0,ff] — the same deterministic md5-threshold sampling as
    * q_sample_hash, so re-runs and late-arriving cluster members are
    * stable.
    *
    * Scale shape: one left join of the corpus against the cluster
    * labels (labels are the small side — only clustered docs carry
    * one), then map-only hashing; the cluster labels themselves reuse
    * the shared minhash pipeline's memoized build.
    */
  def leakSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val labels = DedupQueries.dedupClusters(spark, dir)
    // Exact-text classes are the FLOOR under the near-dup clusters:
    // cluster labels only exist for shingled docs (a 2-token doc has
    // no 3-shingle and so can never appear in the minhash pipeline),
    // so without this two byte-identical short docs would fall back
    // to their own doc_ids and could hash into different splits —
    // exactly the leakage this operator exists to prevent. The class
    // map explodes the MEMOIZED duplicate-class frame (no text-keyed
    // shuffle of its own; NULL-text docs included — a text-equality
    // join would drop them). The near-dup cluster label wins where
    // present (a superset grouping: members of an exact class inside
    // a cluster all carry the cluster's label).
    docs.join(DedupQueries.exactClassMap(spark, dir), Seq("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("exact_rep")))
      .withColumn("h", substring(md5(concat(lit("split:"), col("group_id"))), 1, 2))
      .select(
        col("doc_id"), col("lang"), col("group_id"),
        when(col("h") < "80", "train").when(col("h") < "c0", "val")
          .otherwise("test").as("split"))
  }

  /** Source mixing weights — the data-mixing dial: per-source token
    * counts temperature-flattened to sqrt (alpha = 0.5, the standard
    * multilingual/multi-source rebalancing curve) and normalized
    * against the LARGEST source, so the weight is one exact double
    * division of two correctly-rounded sqrts (a sum-normalization of
    * DOUBLES would be float-order-dependent across engines; max and
    * the integer token sum are exact). One corpus aggregate; the
    * corpus-wide stats come from a GLOBAL WINDOW over the per-source
    * rows — a single task over n_sources rows, bounded by source
    * cardinality (a handful by definition), which beats the
    * crossJoin-broadcast-stats shape here because that would
    * re-derive (re-scan) the per-source aggregate for the stats row.
    */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSource
      .withColumn("max_tok", max(col("n_tokens")).over(w))
      .withColumn("tot_tok", sum(col("n_tokens")).over(w))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (sqrt(col("n_tokens").cast("double")) / sqrt(col("max_tok").cast("double")))
          .as("weight"),
        (col("n_tokens").cast("double") / col("tot_tok").cast("double"))
          .as("natural_share"))
  }

  /** Hashed-feature linear classifier scoring — the model-based
    * quality-filter stage (the fastText-style classifier of the
    * CCNet / GPT-3 / LLaMA data recipes, applied at corpus scale):
    * every token feature-hashes into one of 64 buckets (first 8 md5
    * hex chars mod 64 — the hashing trick, so the model is closed
    * over an unbounded vocabulary), a learned model is a dense
    * 64-entry weight vector, and a document's score is the sum of its
    * tokens' bucket weights; keep = score >= 0. No model artifact
    * ships in this container, so the weight VALUES are a
    * deterministic stand-in (w[b] = (b*37 mod 21) - 10, zero-mean
    * over the bucket domain) — the Spark-side shape is the real one:
    * the weight table folds into the expression tree as literals (at
    * scale: a broadcast array), scoring is a map-only `aggregate()`
    * fold over the token array — no shuffle, no explode, whole-stage
    * codegen — and the decision threshold is an exact integer
    * comparison. Swapping in real learned weights changes only the 64
    * literals.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val tokWeight =
      "((cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 64) * 37) % 21 - 10"
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr(s"aggregate(split(text, ' '), cast(0 as bigint), (acc, t) -> acc + ($tokWeight))")
        .as("score"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        (col("score").cast("double") / col("n_tokens").cast("double")).as("margin"),
        (col("score") >= 0L).as("keep"))
  }

  /** Target-domain data selection — the importance-selection stage of
    * the DSIR family (Xie et al., arXiv:2302.03169: select pretraining
    * data that looks like a target domain by comparing hashed n-gram
    * feature distributions between target and raw pools). Target pool
    * here is the doc_id % 20 = 0 slice (the same held-out convention
    * the decontamination stage uses); features are the classifier's
    * 64-bucket token hash. DSIR's per-token log(p_target/p_raw) is
    * replaced by its SIGN — vote = +1/0/-1 per token occurrence by
    * the exact integer cross-multiplication ct*Nr vs cr*Nt — so a
    * doc's affinity is an exact integer sum both engines reproduce
    * bit-for-bit (the log-free monotone-vote policy used throughout;
    * a production run would plug real log-ratio weights into the same
    * dataflow). Output: every raw-pool doc with its vote total,
    * per-token affinity, and the selected flag (vote > 0).
    *
    * Shape: bucket stats are ONE conditional aggregation over the
    * exploded token stream (output domain 64 rows, map-side partial
    * aggregation does the reduction); totals ride a bounded window
    * over those 64 rows; scoring is a broadcast equi-join on bucket +
    * one per-doc aggregation. No crossJoin, no driver collect; the
    * token explode partitions freely at 100 TB.
    */
  def targetSelect(spark: SparkSession, dir: String): DataFrame = {
    val DecimalType38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("bucket",
        expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 64"))
      .withColumn("is_target", col("doc_id") % 20 === 0)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val stats = toks.groupBy(col("bucket"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("cr"))
      .withColumn("nt", sum(col("ct")).over(wAll))
      .withColumn("nr", sum(col("cr")).over(wAll))
    val votes = toks.filter(!col("is_target"))
      .join(broadcast(stats), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // cross-multiply in DECIMAL(38,0): corpus-scale counts
        // (~10^13 tokens) square to ~10^26 — past long, inside 38
        // digits; overflow stays loud, never a silent wrap
        sum(when(col("ct").cast(DecimalType38) * col("nr") >
              col("cr").cast(DecimalType38) * col("nt"), 1L)
          .when(col("ct").cast(DecimalType38) * col("nr") <
              col("cr").cast(DecimalType38) * col("nt"), -1L)
          .otherwise(0L)).as("vote"))
    votes.select(col("doc_id"), col("n_tokens"), col("vote"),
      (col("vote").cast("double") / col("n_tokens").cast("double")).as("affinity"),
      (col("vote") > 0).as("selected"))
  }

  /** Per-source corpus health card — the report a curation pipeline
    * publishes per crawl/source before mixing decisions: document and
    * token mass, quality-gate pass count, near-dup membership count,
    * language spread, and the derived fractions. Every counted flag
    * is integer-exact (the SHARED quality expression thresholded at
    * 0.5, near-dup membership from the shared cluster labels); the
    * two fractions are single double divisions of those integers.
    *
    * Scale: one pass over documents into a source-keyed hash
    * aggregate (source cardinality output), a broadcast-sized anti
    * membership join against the memoized cluster labels, and one
    * countDistinct Expand over a two-column slim projection — all
    * bounded by source x lang domains, never corpus rows.
    */
  def domainStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("source"), col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tok"),
        (TextAnalysisQueries.qualityExpr(col("toks")) >= 0.5).as("quality_ok"))
    val dupes = DedupQueries.dedupClusters(spark, dir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id"), lit(true).as("is_dup"))
      // distinct = EXISTS semantics, mirroring the oracle: the label
      // frame is one-row-per-doc today, but a duplicate label row
      // would otherwise inflate n_docs AND n_near_dup while the
      // oracle's EXISTS stays robust (r8 ADVICE). doc_id-keyed, cheap.
      .distinct()
    docs.join(dupes, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_near_dup"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("dup_frac",
        col("n_near_dup").cast("double") / col("n_docs").cast("double"))
      .withColumn("quality_frac",
        col("n_quality_ok").cast("double") / col("n_docs").cast("double"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_domain_stats" -> domainStats,
    "q_target_select" -> targetSelect,
    "q_quality_classifier" -> qualityClassifier,
    "q_mix_weights" -> mixWeights,
    "q_split" -> leakSafeSplit,
    "q_boilerplate" -> boilerplate,
    "q_decontaminate" -> decontaminate,
    "q_bloom_prune" -> bloomPrune,
    "q_ks_drift" -> ksDrift,
    "q_mad_outlier" -> madOutlier,
    "q_global_rank" -> globalRank,
    "q_weighted_sample" -> weightedSample,
    "q_sample_hash" -> sampleHash,
    "q_sample_group" -> sampleGroup,
    "q_chunk" -> chunk,
    "q_pack" -> pack,
    "q_pack_masks" -> packMasks,
    "q_bm25" -> bm25,
    "q_outlier" -> outlier,
    "q_quota" -> quota,
    "q_quality_gate" -> qualityGate,
    "q_curated_corpus" -> curatedCorpus,
    "q_curated_incremental" -> curatedIncremental,
    "q_winsorize" -> winsorize,
    "q_skew_agg" -> skewAgg
  )

  // factored out so the q_curated_corpus composition can nest it
  private lazy val oracleDecontaminate: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '), 1) AS pos
      |  FROM documents
      |), sh0 AS (
      |  SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS s
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |), sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
      |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM train GROUP BY doc_id),
      |hits AS (
      |  SELECT t.doc_id, count(*) AS n_hits
      |  FROM train t JOIN bench b ON t.s = b.s GROUP BY t.doc_id
      |)
      |SELECT z.doc_id, z.n_sh, coalesce(h.n_hits, 0) AS n_hits,
      |       CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(z.n_sh AS DOUBLE) AS overlap_frac,
      |       coalesce(h.n_hits, 0) > 0 AS contaminated
      |FROM sizes z LEFT JOIN hits h ON h.doc_id = z.doc_id""".stripMargin

  private lazy val oraclesOutlier: String =
    """WITH stats AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(n_chars) AS BIGINT) AS s,
      |         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
      |  FROM documents GROUP BY lang
      |)
      |SELECT d.doc_id, d.lang, d.n_chars,
      |       CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS lang_mean,
      |       (t.n * d.n_chars - t.s) * (t.n * d.n_chars - t.s)
      |         > 4 * (t.n * t.s2 - t.s * t.s) AS is_outlier
      |FROM documents d JOIN stats t ON t.lang = d.lang""".stripMargin

  def oracles: Map[String, String] = Map(
    // shares the recursive-CTE cluster labels (near-dup membership)
    // and restates the gate's quality formula on (n_tok, n_dis)
    "q_domain_stats" ->
      s"""${DedupQueries.ccLabelsCte},
        |toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), stats AS (
        |  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_dis
        |  FROM toks GROUP BY doc_id
        |), q AS (
        |  SELECT d.doc_id, d.source, d.lang, s.n_tok,
        |         (least(CAST(s.n_tok AS DOUBLE) / 50.0, 1.0) *
        |          (0.5 + 0.5 * (CAST(s.n_dis AS DOUBLE) / CAST(s.n_tok AS DOUBLE))))
        |           >= 0.5 AS quality_ok,
        |         EXISTS (SELECT 1 FROM labels l
        |                 WHERE l.doc_id = d.doc_id AND l.cluster_id <> d.doc_id)
        |           AS is_dup
        |  FROM documents d JOIN stats s USING (doc_id)
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS dup_frac,
        |       CAST(sum(CASE WHEN quality_ok THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS quality_frac
        |FROM q GROUP BY source""".stripMargin,
    // same 64-bucket hash, same integer cross-multiplication votes
    // (HUGEINT mirrors the DECIMAL(38,0) width policy)
    "q_target_select" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 8))::UBIGINT
        |              AS BIGINT) % 64 AS bucket,
        |         doc_id % 20 = 0 AS is_target
        |  FROM documents
        |), stats AS (
        |  SELECT bucket,
        |         CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |         CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
        |  FROM toks GROUP BY bucket
        |), tot AS (
        |  SELECT bucket, ct, cr,
        |         CAST(sum(ct) OVER () AS BIGINT) AS nt,
        |         CAST(sum(cr) OVER () AS BIGINT) AS nr
        |  FROM stats
        |)
        |SELECT t.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN CAST(s.ct AS HUGEINT) * s.nr > CAST(s.cr AS HUGEINT) * s.nt THEN 1
        |                     WHEN CAST(s.ct AS HUGEINT) * s.nr < CAST(s.cr AS HUGEINT) * s.nt THEN -1
        |                     ELSE 0 END) AS BIGINT) AS vote,
        |       CAST(sum(CASE WHEN CAST(s.ct AS HUGEINT) * s.nr > CAST(s.cr AS HUGEINT) * s.nt THEN 1
        |                     WHEN CAST(s.ct AS HUGEINT) * s.nr < CAST(s.cr AS HUGEINT) * s.nt THEN -1
        |                     ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS affinity,
        |       CAST(sum(CASE WHEN CAST(s.ct AS HUGEINT) * s.nr > CAST(s.cr AS HUGEINT) * s.nt THEN 1
        |                     WHEN CAST(s.ct AS HUGEINT) * s.nr < CAST(s.cr AS HUGEINT) * s.nt THEN -1
        |                     ELSE 0 END) AS BIGINT) > 0 AS selected
        |FROM toks t JOIN tot s ON s.bucket = t.bucket
        |WHERE NOT t.is_target
        |GROUP BY t.doc_id""".stripMargin,
    // same bucket hash, same stand-in weight arithmetic, per token
    "q_quality_classifier" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(list_sum(list_transform(string_split(text, ' '), t ->
        |           (CAST(('0x' || substring(md5(t), 1, 8))::UBIGINT AS BIGINT) % 64)
        |             * 37 % 21 - 10)) AS BIGINT) AS score
        |  FROM documents
        |)
        |SELECT doc_id, n_tokens, score,
        |       CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS margin,
        |       score >= 0 AS keep
        |FROM scored""".stripMargin,
    "q_global_rank" ->
      """SELECT doc_id, n_chars,
        |       RANK() OVER (ORDER BY n_chars) AS rk,
        |       PERCENT_RANK() OVER (ORDER BY n_chars) AS pct
        |FROM documents""".stripMargin,
    "q_weighted_sample" ->
      """WITH stats AS (SELECT CAST(max(n_chars) AS BIGINT) AS max_w FROM documents)
        |SELECT doc_id, n_chars,
        |       CAST(('0x' || substr(md5('ws:' || doc_id), 1, 8))::UBIGINT AS BIGINT) AS u,
        |       CAST(max_w * 5 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS ht_weight
        |FROM documents, stats
        |WHERE CAST(('0x' || substr(md5('ws:' || doc_id), 1, 8))::UBIGINT AS BIGINT) * max_w * 5
        |      < 4294967296 * n_chars""".stripMargin,
    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), seg AS (
        |  SELECT doc_id, CAST((pos - 1) // 8 AS INT) AS seg_idx,
        |         string_agg(tok, ' ' ORDER BY pos) AS seg
        |  FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT seg, count(DISTINCT doc_id) AS n_docs FROM seg GROUP BY seg
        |)
        |SELECT s.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_segments,
        |       CAST(sum(CASE WHEN d.n_docs < 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |       CAST(coalesce(sum(len(string_split(s.seg, ' '))) FILTER (WHERE d.n_docs < 3), 0) AS BIGINT) AS n_kept_tokens,
        |       md5(coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx) FILTER (WHERE d.n_docs < 3), '')) AS cleaned_digest
        |FROM seg s JOIN df d ON d.seg = s.seg
        |GROUP BY s.doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH per_source AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), stats AS (
        |  SELECT CAST(max(n_tokens) AS BIGINT) AS max_tok,
        |         CAST(sum(n_tokens) AS BIGINT) AS tot_tok FROM per_source
        |)
        |SELECT source, n_docs, n_tokens,
        |       sqrt(CAST(n_tokens AS DOUBLE)) / sqrt(CAST(max_tok AS DOUBLE)) AS weight,
        |       CAST(n_tokens AS DOUBLE) / CAST(tot_tok AS DOUBLE) AS natural_share
        |FROM per_source, stats""".stripMargin,
    "q_split" ->
      s"""${DedupQueries.ccLabelsCte},
        |exact AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS exact_rep
        |  FROM documents
        |)
        |SELECT doc_id, lang, group_id,
        |       CASE WHEN substr(md5('split:' || group_id), 1, 2) < '80' THEN 'train'
        |            WHEN substr(md5('split:' || group_id), 1, 2) < 'c0' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT d.doc_id, d.lang,
        |         COALESCE(l.cluster_id, e.exact_rep) AS group_id
        |  FROM documents d
        |  JOIN exact e ON e.doc_id = d.doc_id
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |) g""".stripMargin,
    "q_decontaminate" -> oracleDecontaminate,
    "q_bloom_prune" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), sh0 AS (
        |  SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS s
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |bpos AS (
        |  SELECT DISTINCT CAST((('0x'||substr(md5(s),1,8))::UBIGINT
        |        + g.i * ('0x'||substr(md5(s),17,8))::UBIGINT) % 65536 AS BIGINT) AS p
        |  FROM bench, (SELECT unnest([0,1,2]) AS i) g
        |),
        |khits AS (
        |  SELECT t.doc_id, t.s, count(*) AS k_in
        |  FROM train t, (SELECT unnest([0,1,2]) AS i) g
        |  WHERE CAST((('0x'||substr(md5(t.s),1,8))::UBIGINT
        |        + g.i * ('0x'||substr(md5(t.s),17,8))::UBIGINT) % 65536 AS BIGINT)
        |        IN (SELECT p FROM bpos)
        |  GROUP BY t.doc_id, t.s
        |),
        |bloomsh AS (SELECT doc_id, s FROM khits WHERE k_in = 3),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM train GROUP BY doc_id),
        |nbloom AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom FROM bloomsh GROUP BY doc_id),
        |nexact AS (SELECT b2.doc_id, CAST(count(*) AS BIGINT) AS n_exact
        |           FROM bloomsh b2 JOIN bench b ON b2.s = b.s GROUP BY b2.doc_id)
        |SELECT z.doc_id, z.n_sh, nb.n_bloom,
        |       CAST(coalesce(ne.n_exact, 0) AS BIGINT) AS n_exact,
        |       coalesce(ne.n_exact, 0) = 0 AS is_fp
        |FROM sizes z JOIN nbloom nb ON nb.doc_id = z.doc_id
        |LEFT JOIN nexact ne ON ne.doc_id = z.doc_id""".stripMargin,
    "q_mad_outlier" ->
      """WITH med AS (
        |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY lang
        |), dev AS (
        |  SELECT d.doc_id, d.lang, d.n_chars, m.med,
        |         abs(d.n_chars - m.med) AS adev
        |  FROM documents d JOIN med m ON m.lang = d.lang
        |), mad AS (
        |  SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang
        |)
        |SELECT v.doc_id, v.lang, v.n_chars, v.med, a.mad,
        |       v.adev > 3 * a.mad AS is_outlier
        |FROM dev v JOIN mad a ON a.lang = v.lang""".stripMargin,
    "q_ks_drift" ->
      """WITH src AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM documents),
        |vals AS (SELECT DISTINCT n_chars FROM documents),
        |cnt AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2
        |),
        |gcum AS (
        |  SELECT n_chars, SUM(g) OVER (ORDER BY n_chars) AS cum_g
        |  FROM (SELECT n_chars, count(*) AS g FROM documents GROUP BY 1) t
        |),
        |grid AS (SELECT s.source, s.n_s, v.n_chars FROM src s CROSS JOIN vals v),
        |dense AS (
        |  SELECT g.source, g.n_s, g.n_chars, coalesce(c.c, 0) AS c
        |  FROM grid g
        |  LEFT JOIN cnt c ON c.source = g.source AND c.n_chars = g.n_chars
        |),
        |cum AS (
        |  SELECT source, n_s, n_chars, c,
        |         SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum_s
        |  FROM dense
        |),
        |ks AS (
        |  SELECT d.source, d.n_s, t.n_tot - d.n_s AS n_rest,
        |         CAST(max(abs(d.cum_s * (t.n_tot - d.n_s)
        |               - (g.cum_g - d.cum_s) * d.n_s)) AS BIGINT) AS ks_num
        |  FROM cum d JOIN gcum g ON g.n_chars = d.n_chars CROSS JOIN tot t
        |  GROUP BY 1, 2, 3
        |)
        |SELECT source, n_s, n_rest, ks_num,
        |       CAST(ks_num AS DOUBLE) / (CAST(n_s AS DOUBLE) * CAST(n_rest AS DOUBLE)) AS ks
        |FROM ks""".stripMargin,
    "q_sample_group" ->
      """SELECT doc_id, lang, h, rn FROM (
        |  SELECT doc_id, lang,
        |         md5('grp:' || CAST(doc_id AS VARCHAR)) AS h,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY lang
        |           ORDER BY md5('grp:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
        |  FROM documents
        |) r WHERE rn <= 10""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang,
        |       substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
        |FROM documents
        |WHERE substring(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 4)
        |      < CASE WHEN lang = 'en' THEN '8000' ELSE '4000' END""".stripMargin,
    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text,' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 4)) AS st FROM t
        |)
        |SELECT doc_id, CAST(st // 4 AS INT) AS chunk_id,
        |       array_to_string(toks[st + 1 : st + 8], ' ') AS chunk_text,
        |       CAST(least(8, len(toks) - st) AS INT) AS n_tokens
        |FROM s""".stripMargin,
    "q_pack" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         CAST(coalesce(sum(n_tok) OVER (
        |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM d
        |)
        |SELECT doc_id, n_tok, "offset",
        |       "offset" // 256 AS bin_start,
        |       ("offset" + n_tok - 1) // 256 AS bin_end
        |FROM o""".stripMargin,
    "q_pack_masks" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tok,
        |         CAST(coalesce(sum(n_tok) OVER (
        |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM d
        |), spans AS (
        |  SELECT doc_id, "offset",
        |         unnest(range("offset" // 256, ("offset" + n_tok - 1) // 256 + 1)) AS bin
        |  FROM o
        |), local AS (
        |  SELECT bin, doc_id, greatest("offset" - bin * 256, 0) AS local_start FROM spans
        |)
        |SELECT bin, count(*) AS n_docs,
        |       string_agg(CAST(local_start AS VARCHAR), ','
        |                  ORDER BY local_start, doc_id) AS boundaries
        |FROM local GROUP BY bin""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
        |), df AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
        |), stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
        |), scored AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df, l.dl,
        |         (CAST(t.tf AS DOUBLE) * 2.2) /
        |           (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |             (CAST(l.dl AS DOUBLE) /
        |               (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))) *
        |           (CAST(s.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score
        |  FROM tf t
        |  JOIN df d ON d.tok = t.tok
        |  JOIN dl l ON l.doc_id = t.doc_id
        |  CROSS JOIN stats s
        |)
        |SELECT doc_id, tok, tf, df, dl, score, rnk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= 5""".stripMargin,
    "q_outlier" -> oraclesOutlier,
    "q_quota" ->
      """SELECT doc_id, source,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |       CAST(sum(len(string_split(text, ' '))) OVER (
        |         PARTITION BY source ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
        |       CAST(sum(len(string_split(text, ' '))) OVER (
        |         PARTITION BY source ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) <= 2000 AS kept
        |FROM documents""".stripMargin,
    // the full pipeline oracle: every stage re-derived in SQL — the
    // recursive near-dup closure, the exact-class floor, the quality
    // gate's three sub-oracles, the decontamination overlap, and the
    // split hash — then the same reason-precedence CASE
    "q_curated_corpus" ->
      s"""${DedupQueries.ccLabelsCte},
        |exact AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS exact_rep
        |  FROM documents
        |),
        |qg AS (
        |  WITH q AS (
        |${TextAnalysisQueries.oracles("q_text_quality")}
        |  ), r AS (
        |${TextAnalysisQueries.oracles("q_repetition")}
        |  ), o AS (
        |${oraclesOutlier}
        |  )
        |  SELECT q.doc_id,
        |         (q.quality >= 0.5 AND NOT coalesce(r.repetitive, FALSE)
        |          AND NOT o.is_outlier) AS q_keep
        |  FROM q
        |  LEFT JOIN r ON r.doc_id = q.doc_id
        |  JOIN o ON o.doc_id = q.doc_id
        |),
        |deco AS (
        |$oracleDecontaminate
        |),
        |spl AS (
        |  SELECT d.doc_id,
        |         CASE WHEN substr(md5('split:' || g.group_id), 1, 2) < '80' THEN 'train'
        |              WHEN substr(md5('split:' || g.group_id), 1, 2) < 'c0' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents d
        |  JOIN (
        |    SELECT d2.doc_id, COALESCE(l.cluster_id, e.exact_rep) AS group_id
        |    FROM documents d2
        |    JOIN exact e ON e.doc_id = d2.doc_id
        |    LEFT JOIN labels l ON l.doc_id = d2.doc_id
        |  ) g ON g.doc_id = d.doc_id
        |),
        |base AS (
        |  SELECT d.doc_id,
        |         CASE WHEN e.exact_rep <> d.doc_id THEN 'exact_dup'
        |              WHEN l.cluster_id IS NOT NULL AND l.cluster_id <> d.doc_id THEN 'near_dup'
        |              WHEN d.doc_id % 20 = 0 THEN 'benchmark'
        |              WHEN coalesce(c.contaminated, FALSE) THEN 'contaminated'
        |              WHEN NOT q.q_keep THEN 'low_quality'
        |         END AS reason,
        |         s.split AS raw_split
        |  FROM documents d
        |  JOIN exact e ON e.doc_id = d.doc_id
        |  LEFT JOIN labels l ON l.doc_id = d.doc_id
        |  JOIN qg q ON q.doc_id = d.doc_id
        |  LEFT JOIN deco c ON c.doc_id = d.doc_id
        |  JOIN spl s ON s.doc_id = d.doc_id
        |)
        |SELECT doc_id, reason IS NULL AS keep, reason,
        |       CASE WHEN reason IS NULL THEN raw_split END AS split
        |FROM base""".stripMargin,
    // batch-vs-corpus disposition: the incremental near-dup oracle and
    // decontamination nest as CTEs; exact is a corpus md5 semi-join;
    // quality is the row-local expression (the streaming gate's)
    "q_curated_incremental" ->
      s"""WITH inc AS (
        |${DedupQueries.oracleDedupIncremental}
        |), deco AS (
        |$oracleDecontaminate
        |), nearids AS (SELECT DISTINCT new_id FROM inc),
        |corpus_h AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
        |), btoks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |  FROM documents WHERE doc_id % 10 = 0
        |), q AS (
        |  SELECT doc_id,
        |         least(CAST(count(*) AS DOUBLE) / 50.0, 1.0) *
        |           (0.5 + 0.5 * (CAST(count(DISTINCT tok) AS DOUBLE) / CAST(count(*) AS DOUBLE))) AS quality
        |  FROM btoks GROUP BY doc_id
        |), base AS (
        |  SELECT b.doc_id,
        |         CASE WHEN ch.h IS NOT NULL THEN 'exact_dup'
        |              WHEN n.new_id IS NOT NULL THEN 'near_dup'
        |              WHEN b.doc_id % 20 = 0 THEN 'benchmark'
        |              WHEN coalesce(c.contaminated, FALSE) THEN 'contaminated'
        |              WHEN NOT coalesce(qq.quality >= 0.5, FALSE) THEN 'low_quality'
        |         END AS reason
        |  FROM documents b
        |  LEFT JOIN corpus_h ch ON ch.h = md5(b.text)
        |  LEFT JOIN nearids n ON n.new_id = b.doc_id
        |  LEFT JOIN deco c ON c.doc_id = b.doc_id
        |  LEFT JOIN q qq ON qq.doc_id = b.doc_id
        |  WHERE b.doc_id % 10 = 0
        |)
        |SELECT doc_id, reason IS NULL AS keep, reason FROM base""".stripMargin,
    "q_quality_gate" ->
      s"""WITH q AS (
        |${TextAnalysisQueries.oracles("q_text_quality")}
        |), r AS (
        |${TextAnalysisQueries.oracles("q_repetition")}
        |), o AS (
        |${oraclesOutlier}
        |)
        |SELECT q.doc_id, q.quality,
        |       coalesce(r.repetitive, FALSE) AS repetitive,
        |       o.is_outlier,
        |       (q.quality >= 0.5 AND NOT coalesce(r.repetitive, FALSE)
        |        AND NOT o.is_outlier) AS keep
        |FROM q
        |LEFT JOIN r ON r.doc_id = q.doc_id
        |JOIN o ON o.doc_id = q.doc_id""".stripMargin,
    "q_winsorize" ->
      """WITH bands AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS p5,
        |         quantile_cont(n_chars, 0.95) AS p95
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.doc_id, d.lang, d.n_chars, b.p5, b.p95,
        |       least(greatest(CAST(d.n_chars AS DOUBLE), b.p5), b.p95) AS clipped
        |FROM documents d JOIN bands b ON b.lang = d.lang""".stripMargin,
    "q_skew_agg" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
