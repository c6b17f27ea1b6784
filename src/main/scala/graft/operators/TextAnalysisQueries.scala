package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis operators over `documents` — the LLM-pipeline quality
  * toolkit: language ID, quality scoring, token counting, document
  * fingerprinting.
  *
  * Determinism: all scoring sums are integer counts (no float log-prob
  * sums, which would be summation-order-dependent across engines);
  * ratios are single double divisions of exact integers; argmax picks
  * carry an explicit tiebreak.
  *
  * Scale design: the only non-per-row state is the language profile
  * (langs x vocabulary) — tiny, so its join broadcasts; everything else
  * is per-document map work or a per-doc window, which partitions
  * freely. At 100 TB the profile build is one shuffle over (lang, tok)
  * and the scorer stays a broadcast join.
  */
object TextAnalysisQueries extends graft.QueryModule {

  /** The (doc_id, tok, tf) term-frequency aggregate, materialized ONCE
    * per (session, sf-dir) and shared by every token-statistics
    * consumer (tf-idf, BM25, diversity) — same explicit-shared-
    * intermediate policy as DedupQueries.sharedShingles: one
    * explode+aggregate build, identical plan fragment everywhere, the
    * role a materialized staging table plays in a production pipeline.
    */
  private[operators] def sharedTermFreq(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("text.termFreq", spark, dir) { scope =>
      scope.cached(Tables.documents(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    }

  /** Vocabulary-level token statistics, staged once per (session, dir)
    * on top of [[sharedTermFreq]]: total occurrences (`c_tok`),
    * document frequency (`df`), earliest containing doc (`first_doc`).
    * Before r19, six consumers (tf-idf, BM25, collocations, CMS
    * estimates, surprisal, vocab growth) EACH re-ran this tf-wide
    * shuffle on every execution; staged, the shuffle happens once and
    * every consumer reads a vocabulary-bounded cached frame (guide
    * §1.6/§2.2 — shuffle the big frame once, reuse the small result).
    * The derived columns are exact integer aggregates, so consumer
    * results are bit-identical to their previous per-run aggregation.
    */
  private[operators] def sharedTokenStats(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("text.tokStats", spark, dir) { scope =>
      scope.cached(sharedTermFreq(spark, dir)
        .groupBy(col("tok"))
        .agg(sum(col("tf")).as("c_tok"), count(lit(1)).as("df"),
          min(col("doc_id")).as("first_doc")))
    }

  /** Document-level token statistics, staged once per (session, dir):
    * token count (`n_tokens`), distinct-term count (`n_distinct`),
    * exact decimal sum of squared term frequencies (`s2`). Serves
    * BM25's length normalization (dl = n_tokens), the Gini diversity
    * score (which is a pure projection of this frame), and vocab
    * growth's per-bucket token totals — each previously a separate
    * per-run doc-side aggregation of the term-frequency build.
    */
  private[operators] def sharedDocStats(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("text.docStats", spark, dir) { scope =>
      scope.cached(sharedTermFreq(spark, dir)
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          sum(col("tf").cast("decimal(19,0)") * col("tf").cast("decimal(19,0)"))
            .as("s2")))
    }

  /** Unigram-profile language ID: the corpus' own (lang, token) counts
    * are the model; a doc's score for a language is the sum of that
    * language's counts over the doc's token occurrences (integer-
    * exact); prediction = argmax score, ties to the alphabetically
    * first language.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    // Everything downstream works on per-doc term COUNTS, not raw
    // occurrences: profile(lang, tok) = sum of tf, and a doc's score =
    // sum(tf * cnt) — identical values to summing cnt per occurrence,
    // but the explode+aggregate runs once, the cached frame is
    // (doc, distinct-term) sized, and the score join carries distinct
    // terms instead of every token occurrence. Memoized: the profile
    // build and the score join both read it, as does langConfusion.
    val tf = graft.SharedBuilds.getOrBuild[DataFrame]("text.langTf", spark, dir) { scope =>
      scope.cached(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("tf")))
    }
    // the (lang x vocabulary) profile is itself staged: langId runs
    // once for q_lang_id and once more inside langConfusion, and the
    // profile aggregate was re-shuffled from langTf on every execution
    val profile = graft.SharedBuilds.getOrBuild[DataFrame](
        "text.langProfile", spark, dir) { scope =>
      scope.cached(tf.groupBy(col("lang").as("p_lang"), col("tok").as("p_tok"))
        .agg(sum(col("tf")).as("cnt")))
    }

    // No broadcast hint: the profile is (lang x vocabulary)-sized, which
    // grows with the corpus — a forced broadcast OOMs at scale. AQE
    // picks broadcast at runtime whenever the built side is actually
    // small (it is on every fixture SF).
    val scores = tf
      .join(profile, col("tok") === col("p_tok"))
      .groupBy(col("doc_id"), col("lang"), col("p_lang"))
      .agg(sum(col("tf") * col("cnt")).as("score"))

    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("p_lang"))
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("p_lang").as("pred_lang"), col("score"))
  }

  /** Heuristic quality score from length/diversity/stopword signals.
    * All ratios are double divisions of exact integer counts. Counts
    * are row-level array expressions (size / array_distinct / filter)
    * — a map-only stage, no explode+groupBy shuffle; the oracle spells
    * the same counts out with unnest+GROUP BY.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"), col("n_chars"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        size(expr("filter(toks, t -> t IN ('the', 'a'))")).cast("long").as("n_stop"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("avg_tok_len",
        (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens").cast("double"))
      .withColumn("quality", qualityExpr(col("toks")))
      .select("doc_id", "n_tokens", "n_distinct", "n_stop",
        "distinct_ratio", "stop_ratio", "avg_tok_len", "quality")
  }

  /** The quality score as a standalone expression over a whitespace
    * token array — the SAME arithmetic tree as [[qualityScore]]'s
    * `quality` column (length term x distinct-ratio term, identical
    * cast chain, so the doubles are bit-identical), factored out so
    * the streaming ingest gate
    * ([[graft.streaming.StreamingOps.ingestGateStream]]) applies the
    * one batch-checked definition rather than a re-derivation that
    * could drift.
    */
  private[graft] def qualityExpr(toks: Column): Column = {
    val nTok = size(toks).cast("long").cast("double")
    val nDis = size(array_distinct(toks)).cast("long").cast("double")
    least(nTok / lit(50.0), lit(1.0)) * (lit(0.5) + lit(0.5) * (nDis / nTok))
  }

  /** Whitespace token count plus a BPE-ish subword estimate
    * (ceil(len/4) pieces per word, integer arithmetic). Row-level
    * array aggregate — map-only, no shuffle.
    */
  /** BPE-ish pre-tokenization pattern — the GPT-2 segmentation classes
    * (letter runs, digit runs, punctuation runs, each with an optional
    * leading space) WITHOUT the lookahead, so the same pattern is
    * valid in both Java regex (Spark) and RE2 (DuckDB) and both
    * engines produce identical match lists. A real tokenizer's vocab
    * merge happens after this split; the match COUNT is the
    * budget-estimation signal a pipeline needs.
    */
  private val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"), col("n_chars"),
        size(col("toks")).cast("long").as("ws_tokens"),
        expr("aggregate(toks, 0L, (acc, tok) -> acc + (length(tok) + 3) div 4)")
          .as("subword_est"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("bpe_tokens"))

  /** Winnowing fingerprint: md5 rolling hashes of token 4-grams, local
    * minima over a 5-hash sliding window, digest = md5 of the sorted
    * distinct minima. Standard winnowing guarantees shared substrings
    * of length >= window+gram-1 produce shared fingerprints.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    // Entire winnowing pipeline as row-level array expressions (gram
    // hashes -> sliding minima -> sorted distinct -> digest): map-only,
    // no explode, no window shuffle. The oracle mirrors it with
    // lead()/min() OVER windows; values are identical.
    Tables.documents(spark, dir)
      // cheap equivalent of size(hs) > 0 — see repetition(): filtering
      // on the derived array would push the md5 gram build below the
      // spread Exchange onto a single task
      .filter(size(split(col("text"), " ")) >= 4)
      .withColumn("hs",
        TextFunctions.md5All(
          TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 4)))
      .withColumn("fps",
        array_sort(array_distinct(TextFunctions.winnowMinima(col("hs"), 5))))
      .select(
        col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        md5(array_join(col("fps"), "")).as("digest"))
  }

  /** TF-IDF-style top-5 terms per doc. Score = tf * N / df computed as
    * one exact integer product and one double division (identical in
    * both engines); no log() — libm implementations are only
    * 1-ulp-accurate and would risk cross-engine rank flips, and the
    * ranking is monotone-equivalent anyway.
    */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    // N rides in on a 1-row broadcast cross join (same shape as bm25's
    // corpus stats) — a driver-side docs.count() would be an extra job
    // and a plan-splitting driver hop
    val stats = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    // shared materialization: the df build and the scored join both
    // read it, as do BM25 and diversity
    val tf = sharedTermFreq(spark, dir)
    // df reads the staged vocabulary statistics (sharedTokenStats)
    // instead of re-shuffling tf per run — same exact counts.
    val df = sharedTokenStats(spark, dir).select(col("tok"), col("df"))
    // df is vocabulary-sized — no broadcast hint (see langId); AQE
    // broadcasts it at runtime when small.
    val scored = tf.join(df, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("doc_id", "tok", "tf", "df", "score", "rnk")
  }

  /** Gopher-style repetition filter: per doc, the duplicate-bigram
    * fraction (1 - distinct/total) and the most-frequent-bigram
    * fraction — the standard "remove boilerplate/chant text" quality
    * gates of large-corpus pipelines. All counts are row-level array
    * kernels over the (duplicate-preserving) bigram array — map-only;
    * the flag compares integers (5*(n-nd) > n is dup_frac > 20%) so
    * both engines agree exactly, and the reported fractions are single
    * double divisions. Docs with no bigram (< 2 tokens) are excluded,
    * mirroring the oracle's window-driven bigram derivation.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    Tables.documents(spark, dir)
      // the cheap equivalent of size(bg) > 0 (a k-shingle exists iff
      // the doc has >= k tokens): filtering on the DERIVED array
      // pushes the predicate — and with it the whole shingle build —
      // below the spread Exchange, where the scan's natural split
      // count serializes it onto one task and the build then runs
      // AGAIN above the exchange
      .filter(size(split(col("text"), " ")) >= 2)
      .withColumn("bg", TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2))
      .withColumn("n_bg", size(col("bg")).cast("long"))
      .withColumn("nd_bg", size(array_distinct(col("bg"))).cast("long"))
      // occurrences of the most frequent bigram: fused sort +
      // run-length kernel (graft.functions.MaxMultiplicity) — O(n log
      // n) per doc in one codegen loop. The count-per-distinct
      // composable form rescanned the array per distinct element
      // (O(n * distinct)) and made this the slowest map-only query in
      // the catalog; a sort + `aggregate` fold fixes the asymptotics
      // but its struct accumulator runs interpreted per element.
      .withColumn("top_bg",
        graft.functions.MaxMultiplicity.max_multiplicity(col("bg")))
      .select(
        col("doc_id"), col("n_bg"),
        ((col("n_bg") - col("nd_bg")).cast("double") / col("n_bg").cast("double"))
          .as("dup_bigram_frac"),
        (col("top_bg").cast("double") / col("n_bg").cast("double"))
          .as("top_bigram_frac"),
        (lit(5) * (col("n_bg") - col("nd_bg")) > col("n_bg") ||
          lit(5) * col("top_bg") > col("n_bg")).as("repetitive"))
  }

  /** Language-ID evaluation rollup: per true language, how many docs
    * the unigram-profile classifier got right — the accuracy cross-tab
    * every model-in-the-loop pipeline tracks. Reuses [[langId]]
    * end-to-end; accuracy is one double division of exact counts.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    langId(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .select(
        col("lang"), col("n_docs"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs").cast("double")).as("accuracy"))

  /** Gini lexical diversity: 1 - sum((tf_i / n)^2) per document — the
    * repeated-token concentration measure (the entropy alternative
    * that stays cross-engine exact: no log(), so the whole score is
    * integer sums n^2 and sum(tf^2) and ONE double division). High
    * concentration (low diversity) marks boilerplate/spam the same way
    * unigram entropy would, with identical ordering on fixed n.
    *
    * Width: the squares run in DECIMAL, not int64 (same policy as
    * q_outlier). These are PER-DOCUMENT sums, so long would only wrap
    * on a single >3e9-token document — but decimal costs nothing here
    * and makes an overflow a NULL instead of a silently wrong score.
    */
  def diversity(spark: SparkSession, dir: String): DataFrame =
    // pure projection of the staged per-doc statistics — the
    // aggregation itself is shared with BM25/vocabGrowth via
    // sharedDocStats (identical aggregate expressions, same results)
    sharedDocStats(spark, dir)
      .withColumn("nn",
        col("n_tokens").cast("decimal(19,0)") * col("n_tokens").cast("decimal(19,0)"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        ((col("nn") - col("s2")).cast("double") /
          col("nn").cast("double")).as("gini_diversity"))

  /** PII scrub over the customer table: mask every digit of the
    * identifying name column, count the digits that were masked, and
    * lift the numeric id into its own column — the detect/mask/measure
    * shape of a pipeline PII pass (the fixture's only digit-bearing
    * identifier is `c_name`, "Customer#000000007"). Deterministic
    * across engines: Spark's regexp_replace is global by default,
    * DuckDB's needs the 'g' flag (spelled in the oracle); digit counts
    * are integer length arithmetic; extraction takes the first match
    * in both engines.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("masked_name"),
        (length(col("c_name")) - length(regexp_replace(col("c_name"), "[0-9]", "")))
          .as("n_digits_masked"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("bigint").as("extracted_id"))

  /** Per-document n-gram novelty — the corpus-diversity curve: the
    * fraction of a doc's distinct 3-shingles that no EARLIER doc
    * (doc_id order) contains. High-novelty docs expand corpus
    * coverage; a falling curve is the saturation signal a crawl
    * scheduler watches. Shape: one groupBy over corpus shingles for
    * first-occurrence doc (min doc_id), one join back, one per-doc
    * aggregate — reuses the dedup family's shared shingle
    * materialization; docs too short for a shingle drop out (same
    * rule as the shingle-driven dedup oracles).
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val ex = DedupQueries.sharedShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh_arr")).as("s"))
    val firsts = ex.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(firsts, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
  }

  /** Heaps-law vocabulary growth — the crawl-saturation curve at
    * corpus granularity (the corpus-level complement of
    * [[ngramNovelty]]'s per-doc curve): bucket documents by ingest
    * order (doc_id div 100), count the NEW vocabulary each bucket
    * introduces (tokens whose first occurrence falls there) beside the
    * bucket's total token volume, and report both as cumulative
    * curves. A flattening cum_vocab against a linear cum_tokens is
    * the "more data, nothing new" signal that ends a crawl; Heaps'
    * V(n) ~ K*n^beta fits directly on the two cumulative columns.
    *
    * Shape: first-occurrence doc per token is one groupBy over the
    * shared term-frequency build; everything after operates on the
    * BUCKET domain (corpus_size/100 rows). That domain still grows
    * linearly with the corpus, so the two cumulative sums run through
    * [[graft.pipeline.PrefixSum]]'s L-level reduction tree rather than
    * a global ORDER BY window — no task ever sees more than k bucket
    * rows — and BOTH columns share ONE tree (exclusiveOffsetsMulti:
    * one set of bucket shuffles and descent joins, not one tree per
    * column). The oracle stays the plain-window SQL; integer
    * arithmetic makes the tree bit-identical, the hash match
    * certifies it.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    // both per-bucket rollups now aggregate the STAGED statistics
    // frames (vocabulary- and doc-sized) instead of re-shuffling the
    // full term-frequency build twice per run: first_doc is staged in
    // sharedTokenStats, per-doc token totals in sharedDocStats, and
    // sum-of-sums regroups to identical exact integers.
    val newPerBucket = sharedTokenStats(spark, dir)
      .groupBy(expr("first_doc div 100").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val tokPerBucket = sharedDocStats(spark, dir)
      .groupBy(expr("doc_id div 100").as("bucket"))
      .agg(sum(col("n_tokens")).as("n_tok"))
    val perBucket = newPerBucket.join(tokPerBucket, Seq("bucket"), "full")
      .select(col("bucket"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"))
    val withBoth = graft.pipeline.PrefixSum.exclusiveOffsetsMulti(
      perBucket, Seq.empty, "bucket", Seq("n_new" -> "__cv", "n_tok" -> "__ct"))
    withBoth.select(col("bucket"), col("n_new"), col("n_tok"),
      (col("__cv") + col("n_new")).as("cum_vocab"),
      (col("__ct") + col("n_tok")).as("cum_tokens"))
  }

  /** PMI-style collocation mining — corpus phrase detection (the
    * word2vec-phrases / "new york" -> "new_york" preprocessing step of
    * a training-data pipeline). Score = lift = P(w1 w2) / (P(w1)P(w2))
    * computed as c_pair * N / (c1 * c2) — monotone-equivalent to PMI
    * (log of it) without a cross-engine log(); exact integer products
    * in DECIMAL (overflow is a loud NULL, not a silent wrap — same
    * width policy as diversity/outlier), ONE double division. Noise
    * floor c_pair >= 5, top-3 per leading word.
    *
    * Shape: one explode+groupBy for pair counts, unigram counts reuse
    * the shared term-frequency build, N rides a 1-row broadcast. The
    * two unigram joins are vocabulary-sized — AQE broadcasts when
    * small (same no-hint policy as langId). The rank window partitions
    * by leading word: per-partition width is bounded by vocabulary,
    * never corpus size, so it holds at 100 TB.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val pairs = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 2)
      .select(explode(
        TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2)).as("g"))
      .select(
        split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
    // unigram counts and the corpus total both read the staged
    // vocabulary statistics; sum(c_tok) over the vocabulary equals
    // sum(tf) over the corpus exactly (integer sum of sums)
    val uni = sharedTokenStats(spark, dir).select(col("tok"), col("c_tok"))
    val stats = uni.agg(sum(col("c_tok")).as("n_tokens"))
    val scored = pairs
      .filter(col("c_pair") >= 5)
      .join(uni.select(col("tok").as("w1"), col("c_tok").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c_tok").as("c2")), Seq("w2"))
      .crossJoin(broadcast(stats))
      .withColumn("lift",
        (col("c_pair").cast("decimal(38,0)") * col("n_tokens").cast("decimal(38,0)"))
          .cast("double") /
          (col("c1").cast("decimal(38,0)") * col("c2").cast("decimal(38,0)"))
            .cast("double"))
    val w = Window.partitionBy(col("w1")).orderBy(col("lift").desc, col("w2"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("w1", "w2", "c_pair", "c1", "c2", "n_tokens", "lift", "rnk")
  }

  /** Count-min-sketch frequency estimation + heavy-hitter report: 4
    * hash rows x 64 buckets (256 cells TOTAL — the fixed-memory sketch
    * that replaces an unbounded per-key count table when the key
    * domain explodes: URLs, hosts, n-grams at 100 TB), estimate =
    * min over rows of the keyed cell, reported for every token at or
    * above 0.1% corpus frequency next to its exact count. est >= exact
    * always (CMS one-sided guarantee — pinned in SketchSpec for EVERY
    * token); the hash compare certifies the sketch cells themselves
    * since est is derived from them.
    *
    * Shape: cell build is one groupBy over (row, bucket) — output
    * bounded at d*w rows regardless of corpus size; the estimate join
    * broadcasts the 256-cell table. Exact counts ride the shared
    * term-frequency build (at true scale the exact side exists only
    * for this audit; production reads the sketch alone).
    */
  /** (tok, c_tok, est) for EVERY token — the unfiltered CMS estimate
    * frame [[heavyHitters]] thresholds; SketchSpec asserts the
    * one-sided est >= c_tok guarantee over all of it.
    */
  private[graft] def cmsEstimates(spark: SparkSession, dir: String): DataFrame = {
    val uni = sharedTokenStats(spark, dir).select(col("tok"), col("c_tok"))
    val keyed = uni.select(col("tok"), col("c_tok"),
        explode(graft.functions.TextFunctions.cmsKeys(col("tok"))).as("rb"))
      .select(col("tok"), col("c_tok"), col("rb.r").as("r"), col("rb.b").as("b"))
    val cells = keyed.groupBy(col("r"), col("b")).agg(sum(col("c_tok")).as("cell"))
    keyed.join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("tok"), col("c_tok"))
      .agg(min(col("cell")).as("est"))
  }

  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // corpus total from the staged vocabulary stats (sum of sums —
    // exact), a vocabulary-sized aggregate instead of a tf-wide one
    val stats = sharedTokenStats(spark, dir).agg(sum(col("c_tok")).as("n_tokens"))
    cmsEstimates(spark, dir)
      .crossJoin(broadcast(stats))
      .filter(col("c_tok") * 1000 >= col("n_tokens"))
      .select(col("tok"), col("c_tok"), col("est"),
        (col("est") - col("c_tok")).as("err"))
  }

  /** Unigram-surprisal scoring — the perplexity-bucket quality filter
    * of the CCNet/GPT-3 curation recipes (partition a corpus by how
    * "surprising" a language model finds each document), in a log-free
    * cross-engine-exact form: a token's surprisal is the BIT LENGTH of
    * floor(total_corpus_tokens / corpus_count(tok)) — i.e.
    * floor(log2(1/p)) + 1 of its inverse unigram probability — so
    * boilerplate tokens score low, rare tokens high, and every value
    * is an exact integer (float log-prob sums are summation-order-
    * dependent across engines; bit lengths are not). Per doc: token
    * count, total surprisal bits, and the mean in exact milli-bits
    * (integer division) — the score a perplexity-bucket gate
    * thresholds on.
    *
    * Scale: corpus token counts are one (tok) aggregate over the
    * shared term-frequency build; scoring is one equi-join on tok
    * (AQE broadcasts the vocabulary side when small) plus one per-doc
    * hash aggregate. No windows, no driver state.
    */
  def surprisal(spark: SparkSession, dir: String): DataFrame = {
    val tf = sharedTermFreq(spark, dir)
    val cnt = sharedTokenStats(spark, dir).select(col("tok"), col("c_tok").as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total"))
    tf.join(cnt, Seq("tok"))
      .crossJoin(broadcast(total))
      // bin() of a positive long has length floor(log2(x)) + 1 —
      // integer-exact bit length, the log-free surprisal unit
      .withColumn("bits", length(bin(expr("total DIV cnt"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(col("tf") * col("bits")).as("sum_bits"))
      .withColumn("mean_millibits", expr("(sum_bits * 1000) DIV n_toks"))
  }

  /** BPE tokenizer training, round one: the freq-weighted adjacent
    * symbol-pair counts a byte-pair-encoding trainer computes to pick
    * its first merge (Sennrich et al., arXiv:1508.07909). The classic
    * corpus-scale trick is the whole point of the Spark shape: pairs
    * are counted over the WORD-FREQUENCY TABLE, not the corpus — each
    * distinct word contributes its in-word pairs once, weighted by its
    * corpus frequency — so after the first aggregate every downstream
    * row count is vocabulary-bounded (Heaps-law sublinear in corpus
    * size). Top 50 merge candidates under a total order
    * (count desc, pair asc), so the cut is deterministic cross-engine.
    *
    * Scale: two shuffles, both with map-side partial aggregation —
    * corpus tokens → word freqs (combiner collapses each partition to
    * its local vocabulary), then vocabulary → pair counts (domain =
    * alphabet², tiny). The pair expansion is a row-local transform
    * over character positions; TakeOrderedAndProject handles the
    * top-50. A full trainer iterates merge rounds; each round is this
    * same job over the re-segmented vocabulary, never the corpus.
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    bpePairsOf(Tables.documents(spark, dir))

  private[graft] def bpePairsOf(docs: DataFrame): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - lit(1)),
          i => struct(
            col("w").substr(i, lit(1)).as("lhs"),
            col("w").substr(i + lit(1), lit(1)).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
      .limit(50)
  }

  /** Iterated BPE tokenizer training (Sennrich et al.,
    * arXiv:1508.07909 §3): MergeRounds rounds of count-adjacent-pairs
    * → pick the top merge → re-segment the VOCABULARY and recount.
    * Extends [[bpePairs]] (round one only) with the loop a real
    * trainer runs, and proves the property that makes BPE trainable
    * at corpus scale: after the single corpus scan that builds the
    * word-frequency table, every round's input is the vocabulary
    * frame — re-segmentation is a row-local fold over each word's
    * symbol list, weighted recounting is a vocabulary-sized
    * aggregate, and the corpus is never rescanned (PlanSpec pins the
    * executed plan to the cached vocabulary build, zero document
    * scans).
    *
    * Merge application is greedy left-to-right, non-overlapping —
    * standard BPE: scanning symbols left to right, (lhs, rhs) merges
    * whenever the PREVIOUS EMITTED symbol is exactly lhs and the
    * current is rhs; a symbol just produced by a merge can never
    * match lhs again this round (lhs+rhs != lhs). The segmentation is
    * carried as a comma-joined string (words containing ',' are
    * excluded up front), so the fold is one codegen'd `aggregate`
    * higher-order function per word: append x fused (no comma) when
    * it merges with the tail symbol, comma-separated otherwise. The
    * oracle runs the IDENTICAL fold via DuckDB's list_reduce, and the
    * per-round top-1/top-10 cuts share a total order
    * (count desc, lhs, rhs) so the unrolled CTEs agree exactly.
    *
    * Scale: the chosen merge is a 1-row broadcast into the
    * vocabulary fold — the whole loop is vocabulary-bounded
    * (Heaps-law sublinear in corpus size); round r's lineage replays
    * earlier folds over the CACHED vocabulary, so the DAG costs
    * O(rounds^2) vocabulary-local passes and zero corpus work.
    */
  private val MergeRounds = 3

  /** Adjacent-pair counts of a comma-joined segmentation column,
    * freq-weighted: the per-round recount. Row-local expansion,
    * one map-side-combined aggregate over the (tiny) pair domain.
    */
  private def segPairCounts(seg: DataFrame): DataFrame = {
    val arr = split(col("seg"), ",")
    seg
      .select(col("freq"), explode(
        when(size(arr) > 1,
          transform(sequence(lit(1), size(arr) - 1),
            i => struct(element_at(arr, i).as("lhs"),
              element_at(arr, i + 1).as("rhs"))))
          .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** Greedy left-to-right merge of (lhs, rhs) over a symbol array,
    * rebuilt as the comma-joined segmentation string: append fused
    * when the tail symbol is exactly lhs and x is rhs (the
    * ends_with(",lhs") check is exact — symbols never contain
    * commas, so ",lhs" can only suffix-match a complete tail symbol).
    */
  private[graft] def applyMerge(arr: Column, lhs: Column, rhs: Column): Column =
    aggregate(arr, lit(""),
      (acc, x) => when(acc === "", x)
        .when(x === rhs && (acc === lhs || endswith(acc, concat(lit(","), lhs))),
          concat(acc, x))
        .otherwise(concat(acc, lit(","), x)))

  /** The shared training chain: per round the pair-count frame over
    * the current segmentation, plus the final segmentation after ALL
    * MergeRounds chosen merges applied in order. Everything is lazy —
    * [[bpeMerges]] only executes the per-round pair frames,
    * [[bpeEncode]] only the final segmentation — and every frame
    * derives from the memoized vocabulary build (one corpus scan).
    */
  private def bpeTrain(spark: SparkSession, dir: String): (Seq[DataFrame], DataFrame) =
    // The whole training chain is memoized, not just the vocabulary:
    // the per-round pair-count frames and the final segmentation are
    // staged via CacheScope like every other shared build (the
    // minhashReps / recallAudit pattern). Unstaged, every execution of
    // either consumer (q_bpe_merges, q_bpe_encode) replays round r's
    // fold over rounds 1..r-1 — O(rounds^2) vocabulary-local passes of
    // split/fold/aggregate string work per run (measured r19:
    // q_bpe_encode 0.79 s steady, q_bpe_merges 0.53 s at sf0.1, most
    // of it re-deriving the same per-round recounts). Staged, a round's
    // recount is computed once and each consumer reads the cached
    // frames — exactly the materialized artifact a production tokenizer
    // trainer keeps per merge round. All frames are vocabulary-bounded
    // (Heaps-law sublinear), so the staging cost holds at 100 TB.
    graft.SharedBuilds.getOrBuild[(Seq[DataFrame], DataFrame)](
        "text.bpeTrain", spark, dir) { scope =>
      // One corpus scan, memoized: (initial segmentation, freq) per
      // distinct word. The comma guard keeps the separator unambiguous.
      val vocab = graft.SharedBuilds.getOrBuild[DataFrame]("text.bpeVocab", spark, dir) { s =>
        s.cached(
          Tables.documents(spark, dir)
            .select(explode(split(col("text"), " ")).as("w"))
            .filter(length(col("w")) >= 2 && !col("w").contains(","))
            .groupBy(col("w")).agg(count(lit(1)).as("freq"))
            .select(
              concat_ws(",", filter(split(col("w"), ""), c => c =!= lit(""))).as("seg"),
              col("freq")))
      }
      var seg = vocab
      val pairsPerRound = (1 to MergeRounds).map { _ =>
        val pairs = scope.cached(segPairCounts(seg))
        val top = pairs.orderBy(col("pair_count").desc, col("lhs"), col("rhs")).limit(1)
          .select(col("lhs").as("m_lhs"), col("rhs").as("m_rhs"))
        seg = seg.crossJoin(broadcast(top))
          .select(applyMerge(split(col("seg"), ","), col("m_lhs"), col("m_rhs")).as("seg"),
            col("freq"))
        pairs
      }
      (pairsPerRound, scope.cached(seg))
    }

  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(spark, dir)._1.zipWithIndex.map { case (pairs, i) =>
      pairs.orderBy(col("pair_count").desc, col("lhs"), col("rhs")).limit(10)
        .select(lit(i + 1).as("merge_round"), col("lhs"), col("rhs"), col("pair_count"))
    }.reduce(_ unionByName _)
      .orderBy(col("merge_round"), col("pair_count").desc, col("lhs"), col("rhs"))

  /** BPE ENCODE — apply the learned merge table: the corpus token
    * distribution after segmenting every word with all MergeRounds
    * merges, top 50 tokens by frequency under a total order. This is
    * the other half of a tokenizer's life: [[bpeMerges]] trains,
    * this applies the trained table, and the same scale property
    * holds — application is a row-local fold per DISTINCT word
    * (frequency-weighted), so the encoded distribution costs
    * vocabulary-bounded work after the one memoized corpus scan.
    * Oracle: the q_bpe_merges CTE chain extended by one more
    * list_reduce application and an unnest-count.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(spark, dir)._2
      .select(col("freq"), explode(split(col("seg"), ",")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("token_count"))
      .orderBy(col("token_count").desc, col("token"))
      .limit(50)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merges" -> bpeMerges,
    "q_bpe_encode" -> bpeEncode,
    "q_bpe_pairs" -> bpePairs,
    "q_surprisal" -> surprisal,
    "q_heavy_hitters" -> heavyHitters,
    "q_collocations" -> collocations,
    "q_ngram_novelty" -> ngramNovelty,
    "q_vocab_growth" -> vocabGrowth,
    "q_tfidf" -> tfidfTop,
    "q_lang_id" -> langId,
    "q_text_quality" -> qualityScore,
    "q_token_count" -> tokenCount,
    "q_fingerprint" -> fingerprint,
    "q_repetition" -> repetition,
    "q_diversity" -> diversity,
    "q_lang_confusion" -> langConfusion,
    "q_pii_scrub" -> piiScrub
  )

  def oracles: Map[String, String] = Map(
    "q_bpe_merges" ->
      """WITH words AS (
        |  SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  WHERE length(tok) >= 2 AND NOT contains(tok, ',')
        |  GROUP BY tok
        |), l1 AS (
        |  SELECT list_transform(generate_series(1, length(w)), i -> substring(w, i, 1)) AS l, freq
        |  FROM words
        |), p1i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l1),
        |p1 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p1i GROUP BY 1, 2),
        |m1 AS (SELECT lhs, rhs FROM p1 ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
        |l2 AS (
        |  SELECT string_split(list_reduce(l, (acc, x) -> acc ||
        |           CASE WHEN x = m.rhs AND (acc = m.lhs OR ends_with(acc, ',' || m.lhs))
        |                THEN '' ELSE ',' END || x), ',') AS l, freq
        |  FROM l1, m1 m
        |), p2i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l2),
        |p2 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p2i GROUP BY 1, 2),
        |m2 AS (SELECT lhs, rhs FROM p2 ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
        |l3 AS (
        |  SELECT string_split(list_reduce(l, (acc, x) -> acc ||
        |           CASE WHEN x = m.rhs AND (acc = m.lhs OR ends_with(acc, ',' || m.lhs))
        |                THEN '' ELSE ',' END || x), ',') AS l, freq
        |  FROM l2, m2 m
        |), p3i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l3),
        |p3 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p3i GROUP BY 1, 2),
        |o1 AS (SELECT 1 AS merge_round, lhs, rhs, pair_count FROM p1
        |       ORDER BY pair_count DESC, lhs, rhs LIMIT 10),
        |o2 AS (SELECT 2 AS merge_round, lhs, rhs, pair_count FROM p2
        |       ORDER BY pair_count DESC, lhs, rhs LIMIT 10),
        |o3 AS (SELECT 3 AS merge_round, lhs, rhs, pair_count FROM p3
        |       ORDER BY pair_count DESC, lhs, rhs LIMIT 10)
        |SELECT * FROM o1 UNION ALL SELECT * FROM o2 UNION ALL SELECT * FROM o3
        |ORDER BY merge_round, pair_count DESC, lhs, rhs""".stripMargin,
    "q_bpe_encode" ->
      """WITH words AS (
        |  SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  WHERE length(tok) >= 2 AND NOT contains(tok, ',')
        |  GROUP BY tok
        |), l1 AS (
        |  SELECT list_transform(generate_series(1, length(w)), i -> substring(w, i, 1)) AS l, freq
        |  FROM words
        |), p1i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l1),
        |p1 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p1i GROUP BY 1, 2),
        |m1 AS (SELECT lhs, rhs FROM p1 ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
        |l2 AS (
        |  SELECT string_split(list_reduce(l, (acc, x) -> acc ||
        |           CASE WHEN x = m.rhs AND (acc = m.lhs OR ends_with(acc, ',' || m.lhs))
        |                THEN '' ELSE ',' END || x), ',') AS l, freq
        |  FROM l1, m1 m
        |), p2i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l2),
        |p2 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p2i GROUP BY 1, 2),
        |m2 AS (SELECT lhs, rhs FROM p2 ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
        |l3 AS (
        |  SELECT string_split(list_reduce(l, (acc, x) -> acc ||
        |           CASE WHEN x = m.rhs AND (acc = m.lhs OR ends_with(acc, ',' || m.lhs))
        |                THEN '' ELSE ',' END || x), ',') AS l, freq
        |  FROM l2, m2 m
        |), p3i AS (SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i FROM l3),
        |p3 AS (SELECT l[i] AS lhs, l[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p3i GROUP BY 1, 2),
        |m3 AS (SELECT lhs, rhs FROM p3 ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
        |l4 AS (
        |  SELECT string_split(list_reduce(l, (acc, x) -> acc ||
        |           CASE WHEN x = m.rhs AND (acc = m.lhs OR ends_with(acc, ',' || m.lhs))
        |                THEN '' ELSE ',' END || x), ',') AS l, freq
        |  FROM l3, m3 m
        |)
        |SELECT tok AS token, CAST(sum(freq) AS BIGINT) AS token_count
        |FROM (SELECT freq, unnest(l) AS tok FROM l4) t
        |GROUP BY tok ORDER BY token_count DESC, token LIMIT 50""".stripMargin,
    "q_bpe_pairs" ->
      """WITH words AS (
        |  SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  WHERE length(tok) >= 2
        |  GROUP BY tok
        |), positions AS (
        |  SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
        |  FROM words
        |)
        |SELECT substr(w, i, 1) AS lhs, substr(w, i + 1, 1) AS rhs,
        |       CAST(sum(freq) AS BIGINT) AS pair_count
        |FROM positions
        |GROUP BY 1, 2
        |ORDER BY pair_count DESC, lhs, rhs
        |LIMIT 50""".stripMargin,
    "q_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), cnt AS (
        |  SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnt
        |), bits AS (
        |  SELECT tf.doc_id, tf.tf,
        |         length(format('{:b}', total // cnt)) AS bits
        |  FROM tf JOIN cnt USING (tok) CROSS JOIN tot
        |)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |       CAST(sum(tf * bits) AS BIGINT) AS sum_bits,
        |       CAST((sum(tf * bits) * 1000) // sum(tf) AS BIGINT) AS mean_millibits
        |FROM bits GROUP BY doc_id""".stripMargin,
    "q_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), firsts AS (
        |  SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok
        |), nv AS (
        |  SELECT first_doc // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_new
        |  FROM firsts GROUP BY 1
        |), tc AS (
        |  SELECT doc_id // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_tok
        |  FROM toks GROUP BY 1
        |), j AS (
        |  SELECT coalesce(nv.bucket, tc.bucket) AS bucket,
        |         coalesce(n_new, 0) AS n_new, coalesce(n_tok, 0) AS n_tok
        |  FROM nv FULL OUTER JOIN tc ON nv.bucket = tc.bucket
        |)
        |SELECT bucket, n_new, n_tok,
        |       CAST(SUM(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab,
        |       CAST(SUM(n_tok) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens
        |FROM j""".stripMargin,
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text,' ')) AS tok FROM documents
        |), uni AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c_tok FROM toks GROUP BY tok
        |), stats AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks),
        |keyed AS (
        |  SELECT tok, c_tok, r,
        |         CAST(('0x' || substr(md5('cm' || r || ':' || tok), 1, 8))::UBIGINT % 64 AS BIGINT) AS b
        |  FROM uni, (SELECT unnest([0,1,2,3]) AS r) rows
        |), cells AS (
        |  SELECT r, b, CAST(sum(c_tok) AS BIGINT) AS cell FROM keyed GROUP BY r, b
        |)
        |SELECT k.tok, k.c_tok, CAST(min(c.cell) AS BIGINT) AS est,
        |       CAST(min(c.cell) - k.c_tok AS BIGINT) AS err
        |FROM keyed k JOIN cells c ON c.r = k.r AND c.b = k.b, stats s
        |GROUP BY k.tok, k.c_tok, s.n_tokens
        |HAVING k.c_tok * 1000 >= s.n_tokens""".stripMargin,
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), bg0 AS (
        |  SELECT tok AS w1, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM toks
        |), pair AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
        |  FROM bg0 WHERE w2 IS NOT NULL GROUP BY 1, 2
        |), uni AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c_tok FROM toks GROUP BY 1
        |), stats AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM toks),
        |scored AS (
        |  SELECT p.w1, p.w2, p.c_pair, u1.c_tok AS c1, u2.c_tok AS c2, s.n_tokens,
        |         CAST(p.c_pair * s.n_tokens AS DOUBLE) /
        |         CAST(u1.c_tok * u2.c_tok AS DOUBLE) AS lift
        |  FROM pair p
        |  JOIN uni u1 ON p.w1 = u1.tok
        |  JOIN uni u2 ON p.w2 = u2.tok, stats s
        |  WHERE p.c_pair >= 5
        |)
        |SELECT w1, w2, c_pair, c1, c2, n_tokens, lift, CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY lift DESC, w2) AS rnk
        |  FROM scored
        |) r WHERE rnk <= 3""".stripMargin,
    "q_ngram_novelty" ->
      s"""WITH ${DedupQueries.shinglesCte},
        |firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
        |SELECT sh.doc_id,
        |       CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE) AS novelty
        |FROM sh JOIN firsts f ON f.s = sh.s
        |GROUP BY sh.doc_id""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id, tok || ' ' || lead(tok) OVER w AS g
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), bg AS (SELECT doc_id, g FROM g0 WHERE g IS NOT NULL),
        |per_gram AS (
        |  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
        |), stats AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
        |         CAST(count(*) AS BIGINT) AS nd_bg,
        |         CAST(max(c) AS BIGINT) AS top_bg
        |  FROM per_gram GROUP BY doc_id
        |)
        |SELECT doc_id, n_bg,
        |       CAST(n_bg - nd_bg AS DOUBLE) / CAST(n_bg AS DOUBLE) AS dup_bigram_frac,
        |       CAST(top_bg AS DOUBLE) / CAST(n_bg AS DOUBLE) AS top_bigram_frac,
        |       (5 * (n_bg - nd_bg) > n_bg OR 5 * top_bg > n_bg) AS repetitive
        |FROM stats""".stripMargin,
    "q_lang_confusion" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents
        |), profile AS (
        |  SELECT lang AS p_lang, tok AS p_tok, count(*) AS cnt FROM toks GROUP BY 1, 2
        |), scores AS (
        |  SELECT t.doc_id, t.lang, p.p_lang, CAST(sum(p.cnt) AS BIGINT) AS score
        |  FROM toks t JOIN profile p ON t.tok = p.p_tok
        |  GROUP BY 1, 2, 3
        |), pred AS (
        |  SELECT doc_id, lang, p_lang AS pred_lang FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rn
        |    FROM scores
        |  ) r WHERE rn = 1
        |)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |       CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE) AS accuracy
        |FROM pred GROUP BY lang""".stripMargin,
    "q_diversity" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) t
        |  GROUP BY 1, 2
        |), s AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |         count(*) AS n_distinct,
        |         CAST(sum(tf * tf) AS BIGINT) AS s2
        |  FROM tf GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, n_distinct,
        |       CAST(n_tokens * n_tokens - s2 AS DOUBLE) /
        |       CAST(n_tokens * n_tokens AS DOUBLE) AS gini_diversity
        |FROM s""".stripMargin,
    "q_pii_scrub" ->
      """SELECT c_custkey,
        |       regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
        |       CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INT) AS n_digits_masked,
        |       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS extracted_id
        |FROM customer""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
        |), scored AS (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |         CAST(t.tf * (SELECT count(*) FROM documents) AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN df d ON t.tok = d.tok
        |)
        |SELECT doc_id, tok, tf, df, score, rnk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS INT) AS rnk
        |  FROM scored
        |) r WHERE rnk <= 5""".stripMargin,
    "q_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents
        |), profile AS (
        |  SELECT lang AS p_lang, tok AS p_tok, count(*) AS cnt FROM toks GROUP BY 1, 2
        |), scores AS (
        |  SELECT t.doc_id, t.lang, p.p_lang, CAST(sum(p.cnt) AS BIGINT) AS score
        |  FROM toks t JOIN profile p ON t.tok = p.p_tok
        |  GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, lang, p_lang AS pred_lang, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, p_lang) AS rn
        |  FROM scores
        |) r WHERE rn = 1""".stripMargin,
    "q_text_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents
        |), stats AS (
        |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct,
        |         CAST(sum(CASE WHEN tok IN ('the','a') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
        |  FROM toks GROUP BY doc_id
        |)
        |SELECT d.doc_id, s.n_tokens, s.n_distinct, s.n_stop,
        |       CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS distinct_ratio,
        |       CAST(s.n_stop AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS stop_ratio,
        |       CAST(d.n_chars - s.n_tokens + 1 AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) AS avg_tok_len,
        |       least(CAST(s.n_tokens AS DOUBLE) / 50.0, 1.0) *
        |         (0.5 + 0.5 * (CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE))) AS quality
        |FROM documents d JOIN stats s ON d.doc_id = s.doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id, n_chars, count(*) AS ws_tokens,
        |       CAST(sum((length(tok) + 3) // 4) AS BIGINT) AS subword_est,
        |       CAST(any_value(len(regexp_extract_all(text,
        |         ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))) AS BIGINT) AS bpe_tokens
        |FROM (SELECT doc_id, n_chars, text, unnest(string_split(text,' ')) AS tok
        |      FROM documents) t
        |GROUP BY doc_id, n_chars""".stripMargin,
    "q_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, pos,
        |         md5(tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w || ' ' || lead(tok,3) OVER w) AS h
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), hashed AS (SELECT doc_id, pos, h FROM grams WHERE h IS NOT NULL),
        |winmin AS (
        |  SELECT DISTINCT doc_id,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS minh
        |  FROM hashed
        |)
        |SELECT doc_id, count(*) AS n_fp,
        |       md5(string_agg(minh, '' ORDER BY minh)) AS digest
        |FROM winmin GROUP BY doc_id""".stripMargin
  )
}
