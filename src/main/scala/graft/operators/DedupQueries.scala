package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication operators over the `documents` / `embeddings` fixture
  * tables — the LLM-training-data-pipeline surface (BASELINE.json north
  * star; these go beyond the reference, which only has exact-set dedup
  * at `etl.py:52`).
  *
  * Cross-engine determinism rules used throughout:
  *  - Hashes are `md5` hex strings — identical in Spark and DuckDB, so
  *    MinHash/SimHash signatures agree bit-for-bit.
  *  - Jaccard thresholds compare integers (`9*inter >= 4*(na+nb)` is
  *    `jaccard >= 0.8` rearranged) — no float boundary hazard.
  *  - Vector math quantizes components to `round(x*1000)` int64 once,
  *    then every aggregate is an exact integer sum (order-insensitive);
  *    only the final cosine division/sqrt happens in double, one IEEE
  *    op per engine on identical inputs.
  *
  * Scale design: everything is shuffle-by-key dataflow — shingling is a
  * per-doc window (docs are bounded), LSH banding turns the quadratic
  * near-dup search into equi-joins on band keys, and the exact-verify
  * join only touches LSH candidates. No driver-side collection
  * anywhere; each stage is a plain shuffle that partitions by doc/band
  * key and would spread across executors unchanged at 100 TB.
  */
object DedupQueries extends graft.QueryModule {

  /** All ordered (a < b) pairs from a sorted `members` array, as an
    * exploded struct column — the duplicate-class INTRA pair expansion
    * shared by the collapse-first dedup paths.
    */
  private[graft] def memberPairs(fieldA: String, fieldB: String): Column =
    explode(expr(
      s"""flatten(transform(members, (x, i) ->
         |  transform(slice(members, i + 2, size(members)), y ->
         |    named_struct('$fieldA', x, '$fieldB', y))))""".stripMargin))

  /** Expand verified REPRESENTATIVE pairs to all member pairs: join
    * each side's class membership (`groups` must carry rep + members),
    * cross the members (classes are disjoint, so each unordered pair
    * appears exactly once), and restore the a < b convention; the
    * `carry` value columns ride along unchanged — shared by every
    * collapse-first dedup path.
    */
  private[graft] def expandPairs(repPairs: DataFrame, groups: DataFrame,
      keyA: String, keyB: String, carry: Seq[String]): DataFrame = {
    val carryCols = carry.map(col)
    repPairs
      .join(groups.select(col("rep").as(keyA), col("members").as("__ma")), Seq(keyA))
      .join(groups.select(col("rep").as(keyB), col("members").as("__mb")), Seq(keyB))
      .select(carryCols :+ explode(col("__ma")).as("__a") :+ col("__mb"): _*)
      .select(carryCols :+ col("__a") :+ explode(col("__mb")).as("__b"): _*)
      .select(least(col("__a"), col("__b")).as(keyA) +:
        greatest(col("__a"), col("__b")).as(keyB) +: carryCols: _*)
  }

  // ===== exact dedup: hash-groupBy on content =====
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Per-doc DISTINCT word-3-shingle ARRAY, built as a row-level array
    * expression (graft.functions.TextFunctions.wordShingles) — no
    * explode, no per-doc window sort, no shuffle; the whole shingling
    * stage stays inside whole-stage codegen. The DuckDB oracle spells
    * the same set out with a lead() window; values are identical.
    *
    * Materialized ONCE per (session, sf-dir) and shared by every
    * consumer (minhash LSH, clustering, edit-distance verify,
    * per-language sketches) — an explicit shared intermediate, the
    * same role a materialized staging table plays in a production
    * pipeline. Round 2 relied on incidental logical-plan cache hits
    * between queries; after a plan change those stopped matching and
    * each query silently rebuilt the chain. The memo makes the sharing
    * intentional: one cached build, identical plan fragment everywhere.
    * (Memoized via [[graft.SharedBuilds]]: keyed by (kind, session,
    * dir) so concurrent sessions and distinct corpora never
    * cross-share, unpersistable via SharedBuilds.invalidate.)
    */
  private[graft] def sharedShingles(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("dedup.shingles", spark, dir) { scope =>
      import graft.functions.TextFunctions
      scope.cached(Tables.documents(spark, dir).select(
        col("doc_id"), col("lang"),
        array_distinct(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3))
          .as("sh_arr")))
    }


  // ===== MinHash + LSH banding + exact verify =====
  // 9 MinHash orders — Kirsch-Mitzenmacher double hashes (h1 + i*h2)
  // mod 2^32 of ONE md5 per shingle, see TextFunctions.minhashOrder —
  // 3 bands x 3 rows -> candidate pairs sharing any band, then
  // exact-Jaccard verification of candidates only. Banding makes the
  // candidate join an equi-join, so cost tracks the number of true
  // near-dups, not n^2.

  /** Duplicate classes + verified representative near-dup pairs,
    * memoized per (session, sf-dir): the collapse-first backbone that
    * [[dedupMinhash]] expands into the full pair list and
    * [[dedupClusters]] runs connected components on (the expansion
    * can't change components, so clustering the 10^2-10^3x smaller
    * representative graph is exact). `has_sh` marks classes whose text
    * yields at least one 3-shingle — classes without one never pair in
    * the shingle-driven oracle.
    */
  private def minhashReps(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    graft.SharedBuilds.getOrBuild[(DataFrame, DataFrame)](
        "dedup.minhashReps", spark, dir) { scope =>
      val groups = scope.cached(duplicateClasses(spark, dir))
      (groups, scope.cached(minhashRepPairs(spark, dir, groups, scope)))
    }

  /** (doc_id, exact_rep): every document mapped to the minimum doc_id
    * of its byte-identical text class — the exact-duplicate floor
    * q_split groups by. One explode of the memoized duplicate-class
    * frame: no text-keyed shuffle of its own, and NULL-text documents
    * are covered (groupBy puts them in one class; a text-equality
    * join would silently drop them).
    */
  private[operators] def exactClassMap(spark: SparkSession, dir: String): DataFrame = {
    val (groups, _) = minhashReps(spark, dir)
    groups.select(explode(col("members")).as("doc_id"), col("rep").as("exact_rep"))
  }

  /** Duplicate classes (text-identical docs): rep + sorted members +
    * has_sh — ONE definition read by the memoized pipeline above and
    * by the `Dev buildprof` profiler, so the profiled stage is always
    * the production stage.
    */
  private[graft] def duplicateClasses(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"),
        min(col("doc_id")).as("rep"))
      .select(col("rep"), col("members"),
        (size(TextFunctions.tokens(col("text"))) >= 3).as("has_sh"))
  }

  /** The shared shingle arrays restricted to class representatives —
    * the frame the signature build and both verify-join sides read.
    */
  private[graft] def repShingles(spark: SparkSession, dir: String,
      groups: DataFrame): DataFrame =
    sharedShingles(spark, dir).select("doc_id", "sh_arr")
      .join(groups.select(col("rep").as("doc_id")), Seq("doc_id"))

  /** 9-order MinHash signature columns m0..m8 over a (id, sh_arr)
    * frame — shared by the all-pairs and incremental pipelines (one
    * definition, so a b/r banding retune can't silently diverge).
    * Two projections: the per-shingle digests materialize ONCE, then
    * the 9 KM double-hash order minima read them (Catalyst keeps the
    * digest alias un-inlined because it is non-cheap and referenced 9
    * times — the md5 transform runs once per row, not 9x;
    * MinHashDigestSpec pins that plan property).
    */
  private[graft] def minhashSig(sh: DataFrame, idCol: String): DataFrame = {
    import graft.functions.TextFunctions
    sh.select(col(idCol), TextFunctions.md5All(col("sh_arr")).as("__dig"))
      .select(
        col(idCol) +:
          (0 until 9).map(i => TextFunctions.minhashOrder(col("__dig"), i).as(s"m$i")): _*)
  }

  /** 3-band (band_id, band_key) rows from a m0..m8 signature frame.
    * The key joins the band's three numeric orders with a separator —
    * without one, variable-length decimal renderings could collide
    * ("1"+"23" = "12"+"3"), admitting spurious candidates the oracle
    * wouldn't propose. `concat` (NOT concat_ws) so a shingle-less
    * doc's NULL orders yield a NULL key that the candidate equi-join
    * drops — exactly what `m0 || '_' || m1 || '_' || m2` does in the
    * oracle; concat_ws would silently bucket every empty doc together.
    */
  private[graft] def bandKeys(sig: DataFrame, idCol: String): DataFrame = {
    def key(a: String, b: String, c: String) = concat(
      col(a).cast("string"), lit("_"), col(b).cast("string"), lit("_"), col(c).cast("string"))
    sig.select(
      col(idCol),
      explode(array(
        struct(lit(0).as("band_id"), key("m0", "m1", "m2").as("band_key")),
        struct(lit(1).as("band_id"), key("m3", "m4", "m5").as("band_key")),
        struct(lit(2).as("band_id"), key("m6", "m7", "m8").as("band_key"))
      )).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  /** Candidate pairs sharing any (band_id, band_key): the LSH propose
    * step, one equi-join + distinct — shared by the all-pairs pipeline
    * and `Dev buildprof`.
    */
  private[graft] def bandCandidates(bands: DataFrame, idCol: String): DataFrame =
    bands.alias("x").join(bands.alias("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .distinct()

  /** Exact-Jaccard disposal of (doc_a, doc_b) candidates at threshold
    * jNum/jDen, from the FULL shingle arrays of `shArr` (columns
    * doc_id, sh_arr). Per candidate ROW: both sets are already arrays,
    * so the intersection is a row-level array_intersect — no explode,
    * no intersection join, no groupBy. The threshold compares integers
    * ((jDen+jNum)*c >= jNum*(n_a+n_b) is jaccard >= jNum/jDen
    * rearranged), so the boundary decision is engine-exact; oracles
    * spell the same counts out with an exploded join.
    */
  private[graft] def jaccardVerify(cand: DataFrame, shArr: DataFrame,
      jNum: Int, jDen: Int): DataFrame = {
    // Intersect 64-bit shingle fingerprints, not the strings: the
    // projection runs per DOC before the join (hash cost O(corpus)),
    // the join ships 8-byte longs instead of ~20-byte strings, and the
    // per-pair intersect compares words. transform preserves length,
    // so n_a/n_b are exact; c is exact unless two distinct shingles of
    // one pair collide in 64 bits (p ≈ n²/2⁶⁴ — the oracle runs on raw
    // text, so a consequential collision surfaces as a hash mismatch).
    val fp = shArr.select(col("doc_id"),
      transform(col("sh_arr"), g => xxhash64(g)).as("__h"))
    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("__h").as("__sa")), Seq("doc_a"))
      .join(fp.select(col("doc_id").as("doc_b"), col("__h").as("__sb")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("__sa"), col("__sb"))).as("c"),
        size(col("__sa")).as("n_a"),
        size(col("__sb")).as("n_b"))
      .filter(lit(jDen + jNum) * col("c") >= lit(jNum) * (col("n_a") + col("n_b")))
      .select(
        col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
          .as("jaccard"))
  }

  /** The LSH banding + exact-verify pipeline over one representative
    * per duplicate class. Threshold 0.8 via integer comparison.
    */
  private def minhashRepPairs(spark: SparkSession, dir: String, groups: DataFrame,
      scope: graft.SharedBuilds.CacheScope): DataFrame = {
    // shared materialization: used by the signature build and both
    // sides of the verify join (3 uses here, plus the other dedup
    // queries — recomputing the chain measured ~2x slower than the
    // columnar cache despite array-of-string cache cost); restricted
    // to class representatives
    val shArr = repShingles(spark, dir, groups)

    // signatures as row-level array_min expressions — no groupBy
    // shuffle. Cached (registered with the memo's scope, so
    // SharedBuilds.invalidate unpersists it): BOTH sides of the band
    // self-join below read this frame, and the signature build is the
    // dominant cost of the whole pipeline — uncached it runs twice
    // (the same self-join-over-derived-index lesson as the ngram
    // prefix index). The 9 orders share ONE md5 per shingle — 9x less
    // hash CPU than seeded re-hashing — and since r6 are decorrelated
    // KM double hashes (TextFunctions.minhashOrder), restoring the
    // b x r banding independence assumption; recall on planted pairs
    // re-measured vs exact ground truth at both sfs after the change.
    val sig = scope.cached(minhashSig(shArr, "doc_id"))
    val cand = bandCandidates(bandKeys(sig, "doc_id"), "doc_id")
    jaccardVerify(cand, shArr, 4, 5) // jaccard >= 0.8
  }

  /** Full verified near-dup pair list: duplicate-class expansion of
    * the representative pairs (intra-class Jaccard is c/(n+n-c) = 1.0
    * exactly; gram sets are constant within a class so cross-class
    * expansion is exact).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val (groups, repPairs) = minhashReps(spark, dir)

    // intra-class pairs: docs with no shingles never pair in the
    // shingle-driven oracle, so shingle-less classes are excluded;
    // everyone else pairs at Jaccard c/(n+n-c) = 1.0 exactly
    val intra = groups
      .filter(col("has_sh") && size(col("members")) >= 2)
      .select(memberPairs("doc_a", "doc_b").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), lit(1.0).as("jaccard"))

    val cross = expandPairs(repPairs, groups, "doc_a", "doc_b", Seq("jaccard"))

    intra.unionByName(cross).select("doc_a", "doc_b", "jaccard")
  }

  // ===== LSH recall audit: propose-step recall vs exact ground truth =====
  /** Recall of the MinHash/LSH propose step ([[bandCandidates]])
    * against EXACT 3-shingle Jaccard ground truth at threshold 0.5,
    * bucketed by similarity decile — the number the hash gate cannot
    * see on its own: q_dedup_minhash's oracle mirrors the banding, so
    * a recall loss in the mid-similarity regime (the soft zone of the
    * b x r curve: 3 bands x 3 rows proposes ~1-(1-s^3)^3, i.e. ~33%
    * at s=0.5 rising to ~90% at s=0.8) would pass every other gate
    * silently. Ground truth is computed LOSSLESSLY, not sampled: the
    * same PPJoin prefix machinery as [[dedupNgram]] parameterized at
    * t=1/2 — prefix length n - ceil(n/2) + 1, size bound
    * 3*min(n_a,n_b) >= n_a+n_b, positional bound 3*(1 + min remaining)
    * >= n_a+n_b (the t=0.7 derivation with 17/7 replaced by 3/1).
    * Decile = (10*c) div (n_a+n_b-c): exact integer arithmetic, so a
    * bucket boundary cannot drift between engines; recall is one
    * division of exact longs. Collapse-first as everywhere: truth and
    * propose run on class representatives and expand exactly
    * (signatures and shingle sets are text functions, so the caught
    * flag is constant within a class; intra-class pairs are J=1.0 and
    * always caught — identical text gives identical bands). The
    * ORACLE is the plain all-pairs formulation over all documents —
    * the hash match certifies the t=0.5 filter's losslessness AND the
    * expansion, and the recall column itself becomes a driver-gated
    * number: if a future banding change (b/r retune, hash scheme)
    * drops mid-similarity recall, this query's values move and the
    * gate sees it even though both engines mirror the banding.
    */
  /** The t=1/2 PPJoin prefix index over a (doc_id, sh_arr) frame:
    * each doc's rarest n_g - ceil(n_g/2) + 1 grams in the global
    * (df asc, gram) order. Callers cache it (both sides of the
    * truth-candidate self-join read it). Shared by the text and media
    * recall audits — one truth machine for every gram-set modality.
    */
  private[graft] def halfJaccardPrefix(shArr: DataFrame): DataFrame = {
    val full = shArr.filter(size(col("sh_arr")) > 0)
      .select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_g"),
        explode(col("sh_arr")).as("g"))
    val dfreq = full.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    full.join(dfreq, Seq("g"))
      .withColumn("rn", row_number().over(wDoc))
      .filter(col("rn") <= col("n_g") - expr("(n_g + 1) div 2") + lit(1))
      .select("doc_id", "g", "rn", "n_g")
  }

  /** Exact Jaccard >= 0.5 ground-truth pairs with their similarity
    * decile ((10*c) div (n_a+n_b-c), integer-exact), from a cached
    * t=1/2 prefix and the full gram arrays: lossless candidate
    * generation (size bound 3*min >= n_a+n_b, positional bound
    * 3*(1+min remaining) >= n_a+n_b — the [[dedupNgram]] t=0.7
    * derivation at t=1/2), then exact verification.
    */
  private[graft] def halfJaccardTruth(prefix: DataFrame, shArr: DataFrame): DataFrame = {
    val truthCand = prefix.alias("a").join(prefix.alias("b"),
        col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(3) * least(col("a.n_g"), col("b.n_g")) >= col("a.n_g") + col("b.n_g") &&
          lit(3) * (lit(1) + least(col("a.n_g") - col("a.rn"), col("b.n_g") - col("b.rn")))
            >= col("a.n_g") + col("b.n_g"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // fingerprint verify — same rationale (and caveat) as jaccardVerify
    val fp = shArr.select(col("doc_id"),
      transform(col("sh_arr"), g => xxhash64(g)).as("__h"))
    truthCand
      .join(fp.select(col("doc_id").as("doc_a"), col("__h").as("__sa")), Seq("doc_a"))
      .join(fp.select(col("doc_id").as("doc_b"), col("__h").as("__sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("c"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"))
      .filter(lit(3) * col("c") >= col("n_a") + col("n_b")) // jaccard >= 0.5
      .select(col("doc_a"), col("doc_b"),
        expr("cast((10 * c) div (n_a + n_b - c) as int)").as("bucket"))
  }

  def dedupRecall(spark: SparkSession, dir: String): DataFrame = {
    val (groups, _) = minhashReps(spark, dir)
    val (truth, proposed) =
      graft.SharedBuilds.getOrBuild[(DataFrame, DataFrame)](
          "dedup.recallAudit", spark, dir) { scope =>
        // rep shingle arrays: read by the prefix build, the signature
        // build, and both verify-join sides
        val shArr = scope.cached(repShingles(spark, dir, groups))
        // t=1/2 prefix: cached because BOTH sides of the
        // truth-candidate self-join read it
        val prefix = scope.cached(halfJaccardPrefix(shArr))
        // same KM signature definition as the dedup pipeline; cached
        // because both sides of the band self-join read it
        val sig = scope.cached(minhashSig(shArr, "doc_id"))
        // The audit's TRUTH pair set and LSH candidate set are both
        // deterministic per corpus, so they are staged here too — the
        // same collapse-first staging [[minhashReps]] applies to its
        // verified rep pairs. Per-execution work is then the join/
        // expand/aggregate over two staged pair sets (~5 stages), not
        // the prefix and band self-joins (~15 stages) — which under a
        // multi-JVM master is the difference between paying per-stage
        // scheduling latency 15× or 5× per run (the r17 cluster
        // profile's one outlier, q_dedup_recall at 4.6× its local
        // mint, was exactly this).
        val truth = scope.cached(halfJaccardTruth(prefix, shArr))
        val proposed = scope.cached(
          bandCandidates(bandKeys(sig, "doc_id"), "doc_id")
            .withColumn("caught", lit(1L)))
        (truth, proposed)
      }

    val repAudit = truth.join(proposed, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("bucket"),
        coalesce(col("caught"), lit(0L)).as("caught"))

    val cross = expandPairs(repAudit, groups, "doc_a", "doc_b", Seq("bucket", "caught"))

    val intra = groups
      .filter(col("has_sh") && size(col("members")) >= 2)
      .select(memberPairs("doc_a", "doc_b").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        lit(10).as("bucket"), lit(1L).as("caught"))

    intra.unionByName(cross)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"), sum(col("caught")).as("n_caught"))
      .select(col("bucket"), col("n_true"), col("n_caught"),
        (col("n_caught").cast("double") / col("n_true").cast("double")).as("recall"))
  }

  // ===== SimHash: 32-bit signature from md5 nibbles =====
  /** Token-multiset SimHash: per token, the first 8 md5 hex chars give
    * 32 bits; bit j contributes +1/-1; signature bit = sum > 0. Both
    * engines derive bits from the same md5 nibbles via the same
    * strpos/shift arithmetic, so signatures match exactly.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    // Whole signature as a row-level expression chain (hash values
    // precomputed once per doc, 32 bit-votes aggregate over the array):
    // map-only stage, no explode/shuffle. The oracle derives the same
    // bits from the same md5 hex chars with strpos — note its `//`
    // (DuckDB casts double->int by ROUNDING, Spark by truncating, so
    // both sides must use explicit integer division).
    Tables.documents(spark, dir)
      .withColumn("hvs", expr(TextFunctions.tokenHashValuesExpr))
      .select(col("doc_id"), expr(TextFunctions.simhash32Expr).as("simhash"))
  }

  // ===== n-gram (word bigram) Jaccard near-dup, prefix-filtered join =====
  /** All-pairs bigram Jaccard >= 0.7 within a length block
    * (|n_chars delta| <= 30), with LOSSLESS prefix filtering
    * (All-Pairs / PPJoin): order every gram by the global total order
    * (document frequency asc, gram asc) and index only each doc's
    * first `n_g - ceil(0.7 * n_g) + 1` grams. Any pair with
    * Jaccard >= 0.7 shares >= ceil(0.7 * n_g) grams of either side, so
    * skipping both prefixes is impossible — the candidate set provably
    * loses no qualifying pair, while the inverted index shrinks to the
    * ~30% rarest grams of each doc (exactly the short posting lists; a
    * corpus-scale "of the" never enters the index). Exact Jaccard is
    * then verified from the FULL arrays over candidates only. The
    * ORACLE is the plain all-pairs formulation — a hash match also
    * certifies the losslessness of the filter. The prefix length is
    * integer arithmetic (`ceil(0.7 n) = (7n + 9) div 10`) so both
    * engines would compute identical prefixes.
    */
  /** The bigram dedup's shared index — (duplicate classes, per-rep
    * bigram arrays, df-ordered prefix index), memoized per (session,
    * dir). All three are read more than once per query (the prefix
    * index by BOTH sides of the candidate self-join — without the
    * cache the explode+join+window chain runs twice), and the memo
    * gives them the same managed lifecycle as every other shared
    * build (SharedBuilds.invalidate unpersists them).
    */
  private def ngramIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    graft.SharedBuilds.getOrBuild[(DataFrame, DataFrame, DataFrame)](
        "dedup.ngramIndex", spark, dir) { scope =>
      import graft.functions.TextFunctions
      val groups = scope.cached(Tables.documents(spark, dir)
        .groupBy(col("text"), col("n_chars"))
        .agg(sort_array(collect_list(col("doc_id"))).as("members"),
          min(col("doc_id")).as("rep"))
        .select("rep", "n_chars", "text", "members"))

      // g_arr: distinct bigram STRINGS (df/prefix computations need the
      // real grams); h_arr: their xxhash64 fingerprints, the arrays the
      // VERIFY stage intersects. At sf1 the verify join ships two
      // ~40-element arrays per candidate pair — as strings that is
      // ~1 KB/row (multi-GB shuffle at 5M candidates, the measured
      // super-linear term of the sf1 scaling run); as 8-byte longs it
      // is ~4× smaller and the intersect compares words instead of
      // hashing strings. Counts stay exact unless two DISTINCT grams
      // inside one candidate pair collide in 64 bits (p ≈ n²/2⁶⁴ <
      // 1e-15 per pair); the DuckDB oracle runs on the raw text, so a
      // consequential collision would surface as a hash mismatch.
      val gramArr = scope.cached(groups.select(
        col("rep").as("doc_id"), col("n_chars"),
        array_distinct(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 2))
          .as("g_arr"))
        .withColumn("h_arr", transform(col("g_arr"), g => xxhash64(g))))
      val grams = gramArr.select(
        col("doc_id"), col("n_chars"),
        size(col("g_arr")).cast("long").as("n_g"),
        explode(col("g_arr")).as("g"))

      val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      // rn/n_g ride along for the positional filter in dedupNgram.
      // Partitioning contract "g": the only consumer is dedupNgram's
      // PPJoin candidate SELF-join keyed (g, bkt) — hash(g) satisfies
      // that join's clustered distribution on BOTH sides, so with the
      // contract the join plans exchange-free in cache mode and the
      // parquet substrate restores the same partitioning on read-back
      // (r18's one >2x cluster residual: the round-robin scratch
      // spread lost it and the self-join re-added two exchanges).
      val prefix = scope.cached(grams.join(dfreq, Seq("g"))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <= col("n_g") - expr("(7 * n_g + 9) div 10") + lit(1))
        .select("doc_id", "n_chars", "g", "rn", "n_g"), Seq("g"))
      (groups, gramArr, prefix)
    }

  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    // Exact-duplicate collapse BEFORE the fuzzy search — the standard
    // pipeline composition (real corpora are 10-30% exact dups, and a
    // k-way duplicated doc would otherwise contribute k^2 candidate
    // rows to every posting list it touches; measured 165s -> 8s on a
    // 10x-stacked stress corpus). Docs with identical (text, n_chars)
    // form an equivalence class: intra-class pairs have Jaccard
    // exactly 1.0 by definition and are emitted directly; the
    // candidate join runs on ONE representative per class; verified
    // representative pairs expand to all member pairs afterwards
    // (gram sets and n_chars are constant within a class, so the
    // expansion is exact). The oracle stays the plain all-pairs
    // formulation — the hash match certifies the collapse is lossless.
    val (groups, gramArr, prefix) = ngramIndex(spark, dir)

    // Length-bucket blocking as an EQUI-join key: |delta n_chars| <= 30
    // implies bucket(n_chars div 30) differs by at most 1, so the left
    // side fans out to its 3 neighboring buckets and the join key
    // becomes (gram, bucket) — shrinking each hash bucket ~an order of
    // magnitude before the exact |delta| predicate runs. Each pair still
    // matches exactly once per shared gram (the right side keeps its
    // single bucket).
    val bucketed = prefix.withColumn("bkt", expr("cast(n_chars div 30 as int)"))
    val fanned = bucketed.withColumn("bkt",
      explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)))

    // Positional filter (PPJoin): given a shared gram at prefix ranks
    // (rn_a, rn_b), the overlap can't exceed 1 + min(remaining grams on
    // either side). A qualifying pair's FIRST shared gram (in the
    // global order) always satisfies the bound — its bound is an upper
    // estimate of the true overlap, which meets the threshold — so
    // OR-surviving any passing collision is lossless too.
    // Lossless size-ratio cut: c ≥ (7/17)(n_a+n_b) and c ≤ min(n_a,n_b)
    // force 10·min ≥ 7·max — a pair whose gram-set sizes differ by more
    // than 10/7 can never reach Jaccard 0.7, so it never leaves the join.
    val cand = fanned.alias("a").join(bucketed.alias("b"),
        col("a.g") === col("b.g") &&
          col("a.bkt") === col("b.bkt") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= 30 &&
          lit(10) * least(col("a.n_g"), col("b.n_g"))
            >= lit(7) * greatest(col("a.n_g"), col("b.n_g")) &&
          lit(17) * (lit(1) + least(col("a.n_g") - col("a.rn"), col("b.n_g") - col("b.rn")))
            >= lit(7) * (col("a.n_g") + col("b.n_g")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    if (sys.env.contains("GRAFT_NGRAM_DEBUG"))
      println(s"[ngram] candidate pairs after prefix+positional filter: ${cand.count()}")

    // exact verify over candidates only, from the full (unpruned)
    // fingerprint arrays — same row-level intersect shape as the
    // minhash verify stage, on 8-byte longs instead of gram strings
    // (see the h_arr note in ngramIndex). These are REPRESENTATIVE
    // pairs.
    val repPairs = cand
      .join(gramArr.select(col("doc_id").as("doc_a"), col("h_arr").as("ga")), Seq("doc_a"))
      .join(gramArr.select(col("doc_id").as("doc_b"), col("h_arr").as("gb")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("c"),
        size(col("ga")).cast("long").as("n_a"),
        size(col("gb")).cast("long").as("n_b"))
      .filter(lit(17) * col("c") >= lit(7) * (col("n_a") + col("n_b"))) // jaccard >= 0.7
      .select(
        col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c")).cast("double"))
          .as("jaccard"))

    // intra-class pairs: every ordered pair within a duplicate class
    // whose gram set is non-empty (docs with < 2 tokens share no gram,
    // so the all-pairs formulation never pairs them), Jaccard 1.0
    val intra = groups
      .join(gramArr.filter(size(col("g_arr")) > 0).select(col("doc_id").as("rep")), Seq("rep"))
      .filter(size(col("members")) >= 2)
      .select(memberPairs("doc_a", "doc_b").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), lit(1.0).as("jaccard"))

    // cross-class pairs: expand each verified representative pair to
    // the full member cross product (classes are disjoint, so each
    // unordered doc pair appears exactly once; least/greatest restores
    // the doc_a < doc_b convention)
    val cross = expandPairs(repPairs, groups, "doc_a", "doc_b", Seq("jaccard"))

    intra.unionByName(cross).select("doc_a", "doc_b", "jaccard")
  }

  /** Asymmetric containment near-dup: ordered pairs where >= 80% of
    * doc_a's distinct 3-shingles appear in doc_b — the subset/quote
    * duplicate class symmetric Jaccard MISSES (a small doc quoted
    * inside a large one has tiny Jaccard but containment ~1). Lossless
    * prefix filter, containment-adapted: if |A∩B| >= ceil(0.8|A|),
    * the intersection cannot avoid A's first |A| - ceil(0.8|A|) + 1
    * shingles in the global (df asc, shingle) order, so candidates =
    * A-prefix x B-FULL-index sharing a shingle, further cut by the
    * lossless size bound 4 n_a <= 5 n_b (|A∩B| <= |B|). Only the B
    * side needs full postings — the joined shingle always comes from
    * A's rarest ~20%. Exact collapse first as in [[dedupNgram]];
    * expansion keeps DIRECTION (no least/greatest): containment is
    * not symmetric. Oracle is the plain all-pairs formulation — the
    * hash match certifies the filter loses no qualifying ordered
    * pair. ceil(0.8n) = (4n+4) div 5, integer-exact in both engines.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    // Exact-collapse classes are shared with the bigram path; the
    // containment basis is the 3-SHINGLE set (not bigrams): with k=3
    // the shingle domain is cubically larger, so posting lists stay
    // short where the fixture's dense 30-word vocabulary makes every
    // bigram corpus-frequent (a bigram-basis candidate join measured
    // 60s at sf0.1 — df of "rare" bigrams grows linearly with this
    // corpus, the exact failure mode rare-prefix filtering assumes
    // away; 3-shingle df stays near-constant).
    val (groups, _, _) = ngramIndex(spark, dir)
    val shArr = graft.SharedBuilds.getOrBuild[DataFrame](
        "dedup.containShingles", spark, dir) { scope =>
      scope.cached(groups.select(
        col("rep").as("doc_id"),
        array_distinct(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), 3))
          .as("g_arr"))
        // verify-stage fingerprints — same rationale as ngramIndex.h_arr
        .withColumn("h_arr", transform(col("g_arr"), g => xxhash64(g))))
    }
    val full = shArr.filter(size(col("g_arr")) > 0)
      .select(col("doc_id"), size(col("g_arr")).cast("long").as("n_g"),
        explode(col("g_arr")).as("g"))
    // The rare-prefix postings are staged ON THE PARQUET SUBSTRATE
    // ONLY (r20, resolving r19 verdict item 4): there a staged frame
    // is one shared materialization every executor scans, and the
    // partitioning contract "g" applies (the candidate join keys on
    // g). In cache mode the postings are derived INLINE per run — the
    // r19 always-staged form measured net-negative locally
    // (1.17 -> 1.43 s steady) while adding a gram-level frame to the
    // resident set; the derivation is one vocabulary-bounded df
    // aggregate plus a per-doc window over the cached shingle build.
    // `full` stays derived inline in both modes — it is a map-only
    // explode over the cached shingle arrays, no shuffle.
    def pfxDerivation: DataFrame = {
      val dfreq = full.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
      full.join(dfreq, Seq("g"))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") <= col("n_g") - expr("(4 * n_g + 4) div 5") + lit(1))
        .select(col("doc_id"), col("g"), col("n_g"))
    }
    val pfx =
      if (!graft.SharedBuilds.parquetMode(spark)) pfxDerivation
      else graft.SharedBuilds.getOrBuild[DataFrame](
          "dedup.containPrefix", spark, dir) { scope =>
        scope.cached(pfxDerivation, Seq("g"))
      }
    // lossless size predicate: |A∩B| <= n_b, so containment >= 0.8
    // forces ceil(0.8 n_a) <= n_b, i.e. 4 n_a <= 5 n_b
    val cand = pfx.alias("a").join(full.alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id") &&
          lit(4) * col("a.n_g") <= lit(5) * col("b.n_g"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val repPairs = cand
      .join(shArr.select(col("doc_id").as("doc_a"), col("h_arr").as("ga")), Seq("doc_a"))
      .join(shArr.select(col("doc_id").as("doc_b"), col("h_arr").as("gb")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("overlap"),
        size(col("ga")).cast("long").as("n_a"),
        size(col("gb")).cast("long").as("n_b"))
      .filter(lit(5) * col("overlap") >= lit(4) * col("n_a"))

    // ordered expansion: rep-pair metrics hold for every (member of A,
    // member of B) pair because gram sets are constant within a class
    val cross = repPairs
      .join(groups.select(col("rep").as("doc_a"), col("members").as("__ma")), Seq("doc_a"))
      .join(groups.select(col("rep").as("doc_b"), col("members").as("__mb")), Seq("doc_b"))
      .select(col("overlap"), col("n_a"), col("n_b"),
        explode(col("__ma")).as("a"), col("__mb"))
      .select(col("overlap"), col("n_a"), col("n_b"), col("a"),
        explode(col("__mb")).as("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("n_a"), col("n_b"), col("overlap"))

    // intra-class ordered pairs: identical text => containment 1.0 in
    // BOTH directions (docs without a 3-shingle never pair in the oracle)
    val intra = groups
      .join(shArr.filter(size(col("g_arr")) > 0)
        .select(col("doc_id").as("rep"), size(col("g_arr")).cast("long").as("n_g")),
        Seq("rep"))
      .filter(size(col("members")) >= 2)
      .select(col("n_g"), explode(col("members")).as("a"), col("members"))
      .select(col("n_g"), col("a"), explode(col("members")).as("b"))
      .filter(col("a") =!= col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        col("n_g").as("n_a"), col("n_g").as("n_b"), col("n_g").as("overlap"))

    intra.unionByName(cross)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("overlap"),
        (col("overlap").cast("double") / col("n_a").cast("double")).as("containment"))
  }

  // ===== embedding near-dup: random-hyperplane LSH + exact verify =====
  /** Blocking constants: EMB_BANDS bands of EMB_BITS sign bits each.
    * The hyperplanes are Rademacher (+-1 component) vectors seeded
    * deterministically from md5 — the house cross-engine RNG — and
    * shared with the DuckDB oracle as literal constants, so both
    * engines compute identical bucket keys. At fixture thresholds
    * (cosine 0.40, i.e. ~66 deg) the per-bit collision rate is ~0.65,
    * so 6 bands x 3 bits gives ~85% recall per true pair; a corpus
    * with a higher dedup threshold would use more bits per band for
    * sharper buckets.
    */
  private val EMB_BANDS = 6
  private val EMB_BITS = 3
  private val EMB_DIM = 64 // fixture embedding dimension (TESTDATA.md)
  // constant audit budget for q_emb_recall (see embRecall doc)
  private val EMB_ANCHORS = 64

  /** Deterministic corpus-side sample tier shared by the `*_sampled`
    * recall audits (embedding and media): keep ids whose
    * md5("cor:" || id) falls in the lowest half of hex space
    * (prefix < '8'— half, not a thinner slice, so the sampled audit
    * stays non-degenerate at the sf0.01 correctness gate where the
    * media truth set is only a handful of pairs; at corpus scale any
    * rate works and the constant is one hex digit). A pure function
    * of the id — Spark and the DuckDB
    * oracle replay the identical draw, an id's membership never
    * changes across runs or corpus scales, and the draw is independent
    * of the "anc:"-keyed anchor draw by the usual hash-independence of
    * distinct salts.
    */
  private[graft] val CORPUS_SAMPLE_RATE = 0.5
  private[graft] val CORPUS_SAMPLE_THRESH = "8" // rate 1/2: first hex digit < 8
  /** Aggressive-rate tier: the operative regime at a 10^10-document
    * corpus is rates of 10^-2..10^-3, where per-class sampled
    * membership is SPARSE — most classes carry zero sampled members
    * and the zero-weight pruning / own-class-decrement arithmetic does
    * real work instead of being exercised vacuously at rate 0.5. The
    * hex-prefix threshold is already rate-shaped: rate =
    * value(thresh)/16^len(thresh), so "1" = 1/16, "01" = 1/256. The
    * `*_lowrate` audits run at 1/16 — sparse at every gate scale (a
    * 500-doc corpus keeps ~31 ids) while still non-degenerate — and
    * their per-bucket standard error widens by the same arithmetic as
    * the 0.5 tier: SE ≈ sqrt(recall·(1−recall)/n_true_sampled), i.e.
    * √8× fewer sampled true pairs than rate 0.5 → ~2.8× the SE at
    * equal corpus size. At the corpus scales the tier exists for,
    * n_true_sampled is restored by corpus volume, not the rate.
    */
  private[graft] val CORPUS_LOWRATE_THRESH = "1" // rate 1/16
  private[graft] val CORPUS_LOWRATE = 1.0 / 16
  private[graft] def corpusSampled(id: Column,
      thresh: String = CORPUS_SAMPLE_THRESH): Column =
    md5(concat(lit("cor:"), id.cast("string"))) < thresh
  private[graft] def corpusSampledSql(idExpr: String,
      thresh: String = CORPUS_SAMPLE_THRESH): String =
    s"md5('cor:' || CAST($idExpr AS VARCHAR)) < '$thresh'"
  /** Largest representative count served by the tier-0 (6 band × 3
    * bit) scheme — the tier the DuckDB oracle replays from literal
    * hyperplanes. 3-bit bands mean 8 buckets per band, so candidate
    * pairs grow as N²/8·L: fine to a few thousand vectors (the
    * correctness-gate scales), quadratic death beyond it — the sf1
    * scaling run measured 146 s at 20k vectors, ~100× the sf0.1 time.
    */
  private[graft] val EMB_TIER0_MAX = 4096L
  private def embPlaneRow(k: Int): Array[Long] =
    Array.tabulate(EMB_DIM) { p =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$k:$p".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1L else -1L
    }
  private lazy val embPlanes: Array[Array[Long]] =
    Array.tabulate(EMB_BANDS * EMB_BITS)(embPlaneRow)

  /** Corpus-size-adaptive banding: (bands, bitsPerBand) for a corpus
    * of `nReps` distinct vectors. Tier 0 below [[EMB_TIER0_MAX]] is
    * the oracle-pinned scheme; above it the bit depth grows with
    * log₂(N) so the expected bucket size — and with it the candidate
    * pair count per band, Σ_buckets (n_b choose 2) ≈ N²/2^bits —
    * stays BOUNDED (~32 vectors/bucket) instead of growing linearly
    * with N. That converts the propose stage from N² to ~N·32·L: the
    * only scheme under which a pairwise LSH join survives a 100×
    * scale-up. The cost is paid where sign-LSH theory says it must
    * be: per-band true-pair collision is p^bits (p = 1 − θ/π), so
    * deeper bands push the recall cliff toward higher cosine — 16
    * bands at 10 bits keep ≥98% recall at cosine 0.9 and ~80% at 0.8,
    * the regime near-duplicate detection actually targets, while the
    * 0.40 verify cut still reports any proposed lower-cosine pair.
    * q_emb_recall measures the realized per-decile recall of whatever
    * tier the corpus size selects, so the tradeoff is gated data, not
    * a design comment.
    */
  private[graft] def embTier(nReps: Long): (Int, Int) =
    if (nReps <= EMB_TIER0_MAX) (EMB_BANDS, EMB_BITS)
    else {
      val bits = math.min(16,
        math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nReps / 32) - 1)))
      (16, bits)
    }

  /** (vec_id, qv) -> (vec_id, band_id, band_key): the EMB_BANDS LSH
    * bucket keys per vector, each key EMB_BITS dot-product sign bits
    * against the fixed hyperplanes — map-only integer kernels. ONE
    * definition shared by the batch pipeline ([[dedupEmbedding]]) and
    * the streaming ingest path
    * ([[graft.streaming.StreamingOps.dedupEmbeddingStream]]), so a
    * bits/bands retune can't silently diverge between them.
    */
  private[graft] def embBandKeys(vecs: DataFrame,
      bands: Int = EMB_BANDS, bits: Int = EMB_BITS): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val key = (0 until bits).map { j =>
        val k = b * bits + j
        when(aggregate(
            zip_with(col("qv"), typedLit(embPlaneRow(k).toSeq), (x, h) => x * h),
            lit(0L), (acc, x) => acc + x) >= 0, lit(1 << j))
          .otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band_id"), key.as("band_key"))
    }
    vecs.select(col("vec_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("vec_id"), col("band.band_id"), col("band.band_key"))
  }

  /** Near-duplicate vectors by cosine >= 0.40. Round 2 blocked on the
    * fixture `label` column — all-pairs within a GIVEN block, which is
    * quadratic whenever labels are coarse and useless when absent. The
    * blocking key is now COMPUTED: each vector's bucket per band is
    * EMB_BITS dot-product sign bits against the fixed hyperplanes
    * (map-only integer kernels over the quantized components), and
    * candidate pairs come from an equi-join on (band_id, band_key) —
    * the sign-random-projection LSH family, same two-stage
    * propose/verify shape as the MinHash path. Components quantized to
    * int64 so every dot/norm is an exact integer sum; one IEEE
    * division per pair at the end (see class doc).
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingWith(spark, dir, forceTier = None)

  /** [[dedupEmbedding]] with the banding tier overridable — spec-only
    * entry (ScaleSpec forces the adaptive tier on a small planted
    * corpus to differentially pin its recall/verify contract without
    * needing a >4096-vector fixture). Forced-tier builds bypass the
    * shared-build memo: the memo key is (session, dir) and a forced
    * tier must never poison the production entry's cached index.
    */
  private[graft] def dedupEmbeddingWith(spark: SparkSession, dir: String,
      forceTier: Option[(Int, Int)]): DataFrame = {
    import graft.functions.VectorFunctions._
    // Exact-duplicate collapse first, as in dedupNgram: identical
    // embedding arrays form an equivalence class, the LSH + verify
    // runs on one representative each, and intra/cross pairs expand
    // afterwards (10x-duplicated stress corpus: 55s -> seconds).
    // Intra-class cosine is computed with the SAME n2/(sqrt*sqrt)
    // arithmetic as every other pair — NOT a literal 1.0, which the
    // IEEE sqrt round-trip does not exactly produce.
    //
    // All three index frames are memoized per (session, dir): groups
    // (class expansion), vecs (band build + both verify-join sides),
    // and keys (both sides of the candidate self-join — uncached the
    // hyperplane-dot band expressions run twice). The banding tier is
    // selected INSIDE the build from the representative count
    // ([[embTier]]) — one count() per (session, dir), amortized with
    // the index itself.
    def buildIndex(scope: graft.SharedBuilds.CacheScope): (DataFrame, DataFrame, DataFrame) = {
      val groups = scope.cached(Tables.embeddings(spark, dir)
        .groupBy(col("embedding"))
        .agg(sort_array(collect_list(col("vec_id"))).as("members"),
          min(col("vec_id")).as("rep")))
      val vecs = scope.cached(groups
        .select(col("rep").as("vec_id"), quantized(col("embedding")).as("qv"))
        .withColumn("n2", qnorm2(col("qv"))))
      val (bands, bits) = forceTier.getOrElse(embTier(groups.count()))
      val keys = scope.cached(embBandKeys(vecs, bands, bits))
      (groups, vecs, keys)
    }
    val (groups, vecs, keys) = forceTier match {
      case Some(_) => buildIndex(graft.SharedBuilds.unmanagedScope)
      case None => graft.SharedBuilds.getOrBuild[
          (DataFrame, DataFrame, DataFrame)]("dedup.embLsh", spark, dir)(buildIndex)
    }

    val cand = keys.alias("x").join(keys.alias("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()

    val repPairs = cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("n2").as("na")),
        Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("n2").as("nb")),
        Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= 0.40)

    val intra = groups
      .filter(size(col("members")) >= 2)
      .join(vecs.select(col("vec_id").as("rep"), col("n2")), Seq("rep"))
      .select(memberPairs("vec_a", "vec_b").as("p"),
        qcosine(col("n2"), col("n2"), col("n2")).as("cosine"))
      .select(col("p.vec_a"), col("p.vec_b"), col("cosine"))
      .filter(col("cosine") >= 0.40)

    val cross = expandPairs(repPairs, groups, "vec_a", "vec_b", Seq("cosine"))

    intra.unionByName(cross).select("vec_a", "vec_b", "cosine")
  }

  // ===== embedding LSH recall audit: anchors vs exact cosine truth =====
  /** [[dedupRecall]]'s counterpart for the SEMANTIC modality: recall
    * of the hyperplane sign-bit propose step ([[embBandKeys]]) against
    * EXACT cosine ground truth, per cosine decile. Ground truth is a
    * CONSTANT-BUDGET anchor sample — the ANCHORS lowest values of
    * md5("anc:" || vec_id), a deterministic draw whose size does NOT
    * grow with the corpus (TakeOrderedAndProject, the scale-safe
    * top-k) — scored against the full corpus with the exact
    * quantized-integer kernel, so audit cost stays |anchors| x corpus
    * = O(corpus) at ANY scale (a fixed modulus would make it
    * N^2/modulus — the same constant-that-breaks-at-100x class as the
    * r5 IVF list count). Unlike the text audit, sign-random-projection
    * truth has no lossless prefix-filter equivalent — exact cosine
    * needs the dot product, so a sampled audit is the honest scalable
    * form. Decile =
    * floor(cosine * 10): the cosine doubles are bit-identical across
    * engines (same integer dot/norm inputs, same operation order — the
    * property every embedding oracle already hash-certifies), so the
    * bucket boundary cannot drift. recall = caught/true per decile;
    * the 6x3-bit banding's theoretical curve (1-(1-(1-theta/pi)^3)^6)
    * falls off below cosine ~0.6, and this query makes that measured,
    * gated data instead of a design-comment estimate.
    */
  def embRecall(spark: SparkSession, dir: String): DataFrame =
    embRecallWith(spark, dir, sampleThresh = None)

  /** [[embRecall]] with the corpus side optionally restricted to the
    * deterministic sample tier ([[corpusSampled]]) — the 100 TB form:
    * the unsampled audit's truth sweep is O(anchors × corpus) exact
    * kernels, a real bill when "corpus" is 10^10 vectors, and recall
    * is a RATIO, so scoring the anchors against a fixed-rate corpus
    * sample estimates the same per-decile number at
    * [[CORPUS_SAMPLE_RATE]] × the sweep. Estimator error: each bucket's sampled n_true is
    * Binomial(N_true, rate), so the recall estimate carries standard
    * error ≈ sqrt(recall·(1−recall)/n_true_sampled) — at 1000 sampled
    * true pairs that is ±1.6% at recall 0.5, tighter near the 0.9+
    * region the audit actually gates. The SAMPLED counts are reported
    * as-is (no 1/rate scale-up): the oracle replays the identical
    * deterministic sample, so the compare is exact, and a reader
    * scaling to corpus totals multiplies by 1/[[CORPUS_SAMPLE_RATE]].
    */
  def embRecallSampled(spark: SparkSession, dir: String): DataFrame =
    embRecallWith(spark, dir, sampleThresh = Some(CORPUS_SAMPLE_THRESH))

  /** [[embRecallSampled]] at the aggressive 1/16 rate
    * ([[CORPUS_LOWRATE_THRESH]]) — the sparse-sample regime a
    * 100 TB-corpus audit actually runs at (see the threshold doc for
    * the widened-SE arithmetic). Same estimator, same oracle-replayed
    * deterministic draw; cost ≈ 1/16 of the full sweep's exact
    * kernels.
    */
  def embRecallLowRate(spark: SparkSession, dir: String): DataFrame =
    embRecallWith(spark, dir, sampleThresh = Some(CORPUS_LOWRATE_THRESH))

  private def embRecallWith(spark: SparkSession, dir: String,
      sampleThresh: Option[String]): DataFrame = {
    import graft.functions.VectorFunctions._
    val (vecs, keys) = graft.SharedBuilds.getOrBuild[(DataFrame, DataFrame)](
        "dedup.embRecallAudit", spark, dir) { scope =>
      // doc-level (no exact-collapse): the oracle is the plain
      // formulation and the anchor sample must hit duplicates too
      val vecs = scope.cached(Tables.embeddings(spark, dir)
        .select(col("vec_id"), quantized(col("embedding")).as("qv"))
        .withColumn("n2", qnorm2(col("qv"))))
      // audit the tier the corpus size actually selects ([[embTier]]):
      // at gate scales this is tier 0 (what the static oracle replays);
      // at certification scales it measures the adaptive scheme's
      // realized per-decile recall — the number the tier tradeoff is
      // accountable to
      val (bands, bits) = embTier(vecs.count())
      val keys = scope.cached(embBandKeys(vecs, bands, bits))
      (vecs, keys)
    }

    val anchorIds = vecs.select(col("vec_id"))
      .orderBy(md5(concat(lit("anc:"), col("vec_id").cast("string"))), col("vec_id"))
      .limit(EMB_ANCHORS)
    val anchors = vecs.join(anchorIds, Seq("vec_id"))
      .select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("n2").as("na"))

    // the sample prunes the corpus side BEFORE the exact kernel: the
    // dropped 1−rate of the corpus never pays qdot at all
    val corpus = sampleThresh.fold(vecs)(t =>
      vecs.filter(corpusSampled(col("vec_id"), t)))
    val truth = broadcast(anchors)
      .crossJoin(corpus.select(
        col("vec_id").as("vec_b"), col("qv").as("qb"), col("n2").as("nb")))
      .filter(col("vec_a") =!= col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        qcosine(qdot(col("qa"), col("qb")), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= 0.40)
      .select(col("vec_a"), col("vec_b"),
        floor(col("cosine") * 10).cast("int").as("bucket"))

    val proposed = keys
      .join(anchorIds, Seq("vec_id")).alias("x")
      .join(keys.alias("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
      .withColumn("caught", lit(1L))

    truth.join(proposed, Seq("vec_a", "vec_b"), "left")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
      .select(col("bucket"), col("n_true"), col("n_caught"),
        (col("n_caught").cast("double") / col("n_true").cast("double")).as("recall"))
  }

  // ===== edit-distance verification of LSH candidates =====
  /** Levenshtein verification over the MinHash-LSH candidate pairs:
    * the two-stage near-dedup pattern where a cheap sketch proposes
    * and an expensive exact measure (O(len^2) edit distance) disposes
    * — affordable precisely because LSH shrank the pair set from
    * O(n^2) to the true near-dups.
    */
  def dedupEditDistance(spark: SparkSession, dir: String): DataFrame = {
    // Like clustering, the O(len^2) levenshtein runs on REPRESENTATIVE
    // pairs only: texts are constant within a duplicate class, so the
    // distances expand exactly; intra-class pairs are distance 0 /
    // similarity 1.0 (the formula's 1.0 - 0.0/len is exactly 1.0).
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val (groups, repPairs) = minhashReps(spark, dir)
    val repEdit = repPairs.select("doc_a", "doc_b")
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).as("edit_dist"),
        (lit(1.0) - levenshtein(col("text_a"), col("text_b")).cast("double") /
          greatest(length(col("text_a")), length(col("text_b"))).cast("double"))
          .as("edit_sim"))

    val intra = groups
      .filter(col("has_sh") && size(col("members")) >= 2)
      .select(memberPairs("doc_a", "doc_b").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        lit(0).as("edit_dist"), lit(1.0).as("edit_sim"))

    val cross = expandPairs(repEdit, groups, "doc_a", "doc_b", Seq("edit_dist", "edit_sim"))

    intra.unionByName(cross).select("doc_a", "doc_b", "edit_dist", "edit_sim")
  }

  // ===== dedup clustering: connected components over near-dup pairs =====
  /** Groups near-duplicate documents into clusters: the minhash pairs
    * form an undirected graph; each doc's cluster id is the minimum
    * doc_id reachable from it. Implemented as min-label propagation —
    * the standard distributed connected-components loop (each round is
    * one shuffle; rounds ≤ component diameter, and near-dup components
    * are tiny). The driver loop only checks a convergence count, never
    * collects data. Oracle: DuckDB recursive CTE computing the same
    * transitive closure.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // Components are computed on the REPRESENTATIVE graph, not the
    // expanded pair list: members of a duplicate class connect only
    // through their class (intra pairs + the rep's cross pairs), so
    // every member lands in its rep's component, and the component
    // minimum equals the minimum rep (reps are class minima). A
    // k-way-duplicated corpus therefore clusters a graph smaller by
    // k^2 edges — the expansion only happens on the final labels.
    // Classes with >= 2 shingled members but no cross-pair still form
    // a component of their own: a self-edge keeps them as vertices.
    // The label frame is memoized per (session, dir) like every other
    // shared index: five consumers read it (q_dedup_clusters,
    // q_dedup_keep, q_cluster_stats, q_split, and q_curated_corpus —
    // which joins it twice), and without the memo each execution
    // re-runs the whole label-propagation loop.
    graft.SharedBuilds.getOrBuild[DataFrame]("dedup.clusterLabels", spark, dir) { scope =>
      val (groups, repPairs) = minhashReps(spark, dir)
      val selfEdges = groups
        .filter(col("has_sh") && size(col("members")) >= 2)
        .select(col("rep").as("doc_a"), col("rep").as("doc_b"))
      val ccInput = repPairs.select("doc_a", "doc_b").unionByName(selfEdges).cache()
      // (connectedComponents' own count() materializes ccInput)
      val repLabels = connectedComponents(spark, ccInput)
      ccInput.unpersist()
      scope.cached(repLabels
        .join(groups.select(col("rep").as("doc_id"), col("members")), Seq("doc_id"))
        .select(explode(col("members")).as("doc_id"), col("cluster_id"))
        .orderBy("doc_id"))
    }
  }

  /** Incremental near-dedup — the production shape: an ARRIVING batch
    * (doc_id % 10 = 0 stands in for it) is deduped against the
    * existing corpus without ever re-pairing the corpus with itself,
    * and — like every minhash consumer — on the collapse-first
    * backbone: text-identical docs share signatures and band keys, so
    * a (batch, corpus) pair proposes and verifies exactly as its class
    * representatives do, and the batch x corpus band join over all
    * members equals the symmetric member pair set of [[minhashReps]]
    * (same 0.8 threshold) filtered to pairs with exactly one side
    * arriving. The per-member formulation paid the full md5 + minhash
    * chain and the pairwise intersects once per COPY (measured 20.9 s
    * vs the batch twin's 3.1 s at the 30x duplicate-clique stress);
    * the oracle keeps the member-level formulation, so the
    * equivalence is hash-checked. At scale the class index is the
    * persisted table an ingest probes.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (groups, repPairs) = minhashReps(spark, dir)
    val intra = groups
      .filter(col("has_sh") && size(col("members")) >= 2)
      .select(memberPairs("doc_a", "doc_b").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), lit(1.0).as("jaccard"))
    val cross = expandPairs(repPairs, groups, "doc_a", "doc_b", Seq("jaccard"))
    intra.unionByName(cross)
      .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
      .select(
        when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b")).as("new_id"),
        when(col("doc_a") % 10 === 0, col("doc_b")).otherwise(col("doc_a")).as("corpus_id"),
        col("jaccard"))
  }

  /** The deduplicated corpus — the end product a pipeline consumer
    * actually reads: every document except non-representative members
    * of a near-dup cluster (the cluster minimum survives). One
    * left-anti join against the cluster labels.
    */
  def dedupKeep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
    val dupes = dedupClusters(spark, dir)
      .filter(col("cluster_id") =!= col("doc_id"))
      .select("doc_id")
    docs.join(dupes, Seq("doc_id"), "left_anti")
  }

  /** Quality-aware survivor selection: per near-dup cluster, keep the
    * BEST document instead of the smallest-id one — here "best" =
    * longest text (n_chars), the usual keep-the-canonical-copy policy
    * when near-dups are truncations/excerpts of a fuller original;
    * ties break to the smallest doc_id so the pick is deterministic.
    * Complements [[dedupKeep]] (min-id policy): a curation pipeline
    * chooses its survivor rule, the engine must support both.
    *
    * Scale: argmax-per-group as ONE hash aggregate — max over a
    * (n_chars, -doc_id) struct gives lexicographic best-then-smallest-
    * id with map-side combine, no per-cluster sort window and no
    * buffered member list.
    */
  def dedupBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    dedupClusters(spark, dir)
      .join(docs, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("best.neg_id")).as("kept_doc_id"),
        col("best.n_chars").as("kept_chars"))
  }

  /** Contrastive training triplets — the (anchor, positive, negative)
    * sampling an embedding-model trainer consumes: positives are the
    * verified near-dup pairs ([[dedupMinhash]], Jaccard >= 0.5 exact),
    * negatives are drawn per anchor from a DETERMINISTIC 64-doc pool
    * (smallest md5('neg:' || doc_id) — the house cross-engine RNG,
    * never rand()) excluding both pair members, picking the pool doc
    * with the smallest md5(anchor ':' candidate) so resampling is
    * stable across runs and engines.
    *
    * Scale: the pool is a 64-row TakeOrdered broadcast; the candidate
    * frame is |pairs| x 64 under a non-equi broadcast join (the same
    * bounded-broadcast shape as the ANN anchor queries), reduced by
    * one struct-min hash aggregate. Corpus rows are never self-joined.
    */
  def triplets(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhash(spark, dir)
    val pool = Tables.documents(spark, dir)
      .select(col("doc_id").as("cand"),
        md5(concat(lit("neg:"), col("doc_id").cast("string"))).as("ch"))
      .orderBy(col("ch"), col("cand")).limit(64)
    pairs.join(broadcast(pool),
        col("cand") =!= col("doc_a") && col("cand") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("jaccard"))
      .agg(min(struct(
        md5(concat_ws(":", col("doc_a"), col("cand"))).as("nh"),
        col("cand"))).as("neg"))
      .select(col("doc_a").as("anchor_doc"), col("doc_b").as("pos_doc"),
        col("jaccard"), col("neg.cand").as("neg_doc"))
  }

  /** Cluster-size profile: how big the near-dup groups are — the
    * audit view that tells a pipeline how much the corpus shrinks and
    * whether one mega-cluster (boilerplate) dominates.
    */
  def clusterStats(spark: SparkSession, dir: String): DataFrame =
    dedupClusters(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("cluster_id"), col("n_docs"),
        (col("n_docs") - 1).as("n_removed"))

  /** Connected components over an undirected pair list (columns
    * doc_a, doc_b): each vertex's cluster id is the minimum vertex id
    * reachable from it. The caller is responsible for the input's
    * materialization (both union branches below re-read it).
    * Property-tested against a union-find reference on random graphs
    * and a path graph (PropertySpec).
    *
    * Hybrid execution: when the edge list is below `localThreshold`
    * it is union-found on the driver — a bounded collect (the
    * threshold caps it at ~1.6 MB of longs), one pass, zero Spark
    * jobs — instead of paying O(log d) distributed rounds of shuffle
    * and checkpoint latency on a graph that fits in L2. Near-dup REP
    * graphs are almost always this small (true duplicate pairs, not
    * corpus rows). Past the threshold the distributed min-label loop
    * below takes over unchanged; the cutoff is explicit, so corpus-
    * scale edge sets can never land on the driver. PropertySpec pins
    * both paths to the same union-find reference and to each other.
    */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
      localThreshold: Long = 100000L, maxRounds: Int = 20,
      resumeDir: Option[String] = None, resumeTag: String = ""): DataFrame = {
    // A resume dir without an edge-set tag would stamp srcHash("") —
    // identical for every untagged loop — so two different graphs
    // sharing a dir would silently resume each other's labels, the
    // exact confusion LoopResume's stamp guard exists to refuse.
    require(resumeDir.isEmpty || resumeTag.nonEmpty,
      "connectedComponents with resumeDir requires a non-empty resumeTag " +
        "identifying the edge set (e.g. the pair-table path or a content " +
        "hash): an empty tag matches every other untagged loop in the dir.")
    val nPairs = pairs.count() // materialize the (cached) pair input once
    if (nPairs <= localThreshold) {
      import spark.implicits._
      val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (c != r) { val p = parent.getOrDefault(c, c); parent.put(c, r); c = p }
        parent.putIfAbsent(r, r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      // roots are component minima because unions always keep the
      // smaller id as parent
      val labels = parent.keySet().toArray(Array.empty[java.lang.Long])
        .map(v => (v.longValue(), find(v)))
      return labels.toSeq.toDF("doc_id", "cluster_id").orderBy("doc_id")
    }
    // Partition count DERIVED from the edge volume (round 2 hardcoded
    // coalesce(1) "because edges are small" — a single-task stage that
    // could never scale past one core). ~50k edges per task keeps each
    // round's tasks meaningfully sized: tiny edge sets pay one task's
    // overhead, corpus-scale edge sets fan out to the cluster.
    val parts = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      (2 * nPairs + 49999) / 50000)).toInt
    // Both loop inputs hash-partitioned on their join keys with the
    // same count, so every round's propagate join reuses the cached
    // partitioning instead of re-exchanging both sides.
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .repartition(parts, col("doc_b"))
      .cache()

    // Loop state is eagerly truncated each round via LoopState, not
    // cached: a cached DataFrame keeps its full logical plan, so round
    // N's plan nests rounds 1..N-1 and analysis/optimization time
    // GROWS per round (measured: 5s -> 11s by round 6 on a 50-node
    // path). Truncation caps planning cost; DURABILITY is the dial's
    // business — the default localCheckpoint leaves no recompute path
    // (executor loss kills the loop), GRAFT_LOOP_CHECKPOINT=reliable
    // writes each round to reliable checkpoint storage instead (see
    // LoopState's scaladoc for the measured cost).
    val loop = LoopState.loop() // bounds reliable-mode storage to the latest round
    // Driver-crash durability (opt-in), mirroring pagerankConverged:
    // each compress round commits its labels atomically under
    // resumeDir, and a restarted driver continues from the newest
    // committed round. Min-label propagation is monotone, so any
    // committed labels state is a valid restart point; resumeTag is
    // the caller's edge-set identity (LoopResume refuses a tag
    // mismatch instead of silently resuming another graph's labels).
    val resumed = resumeDir.flatMap(LoopResume.latest(spark, _, 0L, resumeTag))
    var labels = loop.truncate(resumed.map(_._3.repartition(parts, col("doc_id")))
      .getOrElse(
        edges.select(col("doc_a").as("doc_id")).distinct()
          .withColumn("cluster_id", col("doc_id"))
          .repartition(parts, col("doc_id"))))
    // AQE off for the iterative loop only (restored below): the loop's
    // state is cached and already partitioned by the |edges|-derived
    // count, so AQE's runtime re-planning can't improve the plan — it
    // only adds per-stage replan latency to each of the O(log d)
    // rounds. (Same practice as GraphX-style iterative jobs.)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    var converged = false
    var rounds = resumed.map(_._1).getOrElse(0)
    while (!converged && rounds < maxRounds) {
      val t0 = System.nanoTime()
      // (1) propagate: the min label among a vertex and its neighbors
      val neighborMin = edges
        .join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(edges("doc_a").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_min"))
      // old label rides along so the convergence check is a filter over
      // the materialized frame, not another join
      val propagated = loop.truncate(labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("old_label"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"))
        .repartition(parts, col("doc_id")))
      val changed = propagated.filter(col("cluster_id") =!= col("old_label")).count()
      if (changed == 0) {
        // propagation fixpoint: for every edge l(u)=l(v), so labels are
        // already constant per component (= the component min)
        converged = true
      } else {
        // (2) compress: pointer halving, label(v) := label(label(v)).
        // Labels are doc_ids of vertices in the edge set, so the lookup
        // join always matches; halving cuts chain lengths geometrically,
        // making rounds O(log diameter) instead of O(diameter) — the
        // difference between 20 and 10^6 shuffles on a path-shaped
        // component at corpus scale. Both join sides read propagated's
        // checkpointed partitions.
        labels = loop.truncate(propagated.alias("v")
          .join(propagated.select(col("doc_id").as("p_id"), col("cluster_id").as("p_label")).alias("p"),
            col("v.cluster_id") === col("p_id"), "left")
          .select(col("v.doc_id").as("doc_id"),
            coalesce(col("p_label"), col("v.cluster_id")).as("cluster_id"))
          .repartition(parts, col("doc_id")))
        resumeDir.foreach(d => LoopResume.commit(
          labels.select(col("doc_id"), col("cluster_id")),
          d, rounds + 1, changed, 0L, resumeTag))
      }
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] round $rounds changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2fs")
      rounds += 1
    }
    // never return partially propagated labels — a silent wrong answer
    require(converged,
      s"label propagation did not converge in $rounds rounds (cap $maxRounds; component diameter > 2^$rounds)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    edges.unpersist() // the pair input stays cached — it's the caller's
    labels.select("doc_id", "cluster_id").orderBy("doc_id")
  }

  // ===== group-level MinHash via a typed Aggregator (SURVEY §2.11) =====
  /** Language-level MinHash signatures: per-doc signatures merge by
    * element-wise min through [[graft.functions.MinHashAggregator]] —
    * the mergeable-sketch aggregation path (partial signatures combine
    * map-side; the shuffle carries sketches, not shingles). The oracle
    * exploits the same union property: min over every shingle in the
    * language.
    */
  def minhashByLang(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{MinHashAggregator, TextFunctions}
    val nSeeds = 9
    val docsSig = sharedShingles(spark, dir)
      // docs with no shingles contribute nothing (all-null signature
      // rows would otherwise surface languages the oracle's
      // shingle-driven GROUP BY never sees)
      .filter(size(col("sh_arr")) > 0)
      .select(col("lang"), TextFunctions.md5All(col("sh_arr")).as("__dig"))
      .select(col("lang"),
        array((0 until nSeeds).map(i => TextFunctions.minhashOrder(col("__dig"), i)): _*)
          .as("sig"))
    val mh = udaf(new MinHashAggregator(nSeeds))
    val grouped = docsSig.groupBy(col("lang")).agg(mh(col("sig")).as("lang_sig"))
    grouped.select(
      col("lang") +: (0 until nSeeds).map(i => col("lang_sig").getItem(i).as(s"m$i")): _*)
  }

  /** Cross-source redundancy matrix: near-duplicate PAIR counts per
    * (source, source) combination — the curation diagnostic that says
    * WHICH feeds overlap each other (a source whose content another
    * source already carries gets dropped or down-weighted before
    * training; the aggregate view of [[dedupMinhash]]'s per-pair
    * output). Unordered source pairs canonicalize via least/greatest
    * so A-B and B-A collapse; the diagonal counts within-source
    * redundancy.
    *
    * Scale: rides the near-dup pair set (output-bounded, never
    * corpus^2); the two doc_id joins shuffle pairs against the
    * corpus' 2-column (doc_id, source) projection; the final
    * aggregate's domain is at most n_sources^2 rows.
    */
  def overlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    dedupMinhash(spark, dir).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), Seq("doc_b"))
      .groupBy(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  // ===== exact-substring span dedup (ExactSubstr) =====

  /** Span width in tokens for [[dupSpans]]. Lee et al. use 50 BPE
    * tokens; the fixture docs are 25-70 whitespace tokens, so 5 keeps
    * the operator exercised end-to-end (multi-span docs, merged
    * regions, zero-coverage docs) at every SF. The dial changes cost
    * only linearly (spans per doc = n_tokens - W + 1 either way).
    */
  private val SpanW = 5

  /** Exact-substring span dedup — the ExactSubstr family of
    * "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al., arXiv:2107.06499) re-expressed relationally: any W-token
    * span whose text occurs at >= 2 positions CORPUS-WIDE (across docs
    * or repeated within one) is duplicated text; overlapping duplicated
    * spans merge into maximal per-doc regions; every doc reports its
    * region count, duplicated-token total, and coverage fraction — the
    * per-doc signal a pipeline uses to cut boilerplate-heavy documents
    * or excise the regions themselves.
    *
    * The paper's suffix array is a single-node construct; the
    * relational equivalent is (1) position-exploded span hashes, (2)
    * one groupBy on span hash to find texts with >= 2 occurrences —
    * partial aggregation combines the corpus-frequent boilerplate
    * spans map-side, so the hot keys that make this operator hard are
    * exactly the ones that collapse before the shuffle, (3) a
    * left-semi join marking duplicated positions (AQE handles the
    * residual skew of mega-duplicated spans), (4) a per-doc interval
    * merge — gaps-and-islands over a window PARTITIONed by doc, whose
    * width is bounded by tokens-per-doc, never corpus size. Every
    * stage shuffles on doc or content hash and partitions freely at
    * 100 TB.
    */
  /** (doc_id, pos, h): every W-token span position with its md5.
    * Shared with the streaming ingest path
    * ([[graft.streaming.StreamingOps.dupSpansStream]]) so the span
    * scheme cannot diverge between batch and stream.
    */
  private[graft] def spanPositions(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    docs
      .select(col("doc_id"),
        posexplode(TextFunctions.wordShingles(TextFunctions.tokens(col("text")), SpanW)))
      .select(col("doc_id"), col("pos"), md5(col("col")).as("h"))
  }

  /** Merge marked span positions (doc_id, pos) into maximal per-doc
    * regions and aggregate to (doc_id, n_dup_regions, dup_tokens) —
    * gaps-and-islands over a window bounded by tokens-per-doc.
    */
  private def mergedRegions(marked: DataFrame): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("st"))
    marked
      .select(col("doc_id"), col("pos").as("st"), (col("pos") + lit(SpanW)).as("en"))
      .withColumn("prev_max",
        max(col("en")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_max").isNull || col("st") > col("prev_max"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(byPos))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_regions"),
        sum((col("en") - col("st")).cast("long")).as("dup_tokens"))
  }

  /** Left-join per-doc region stats back onto the doc domain with
    * zero-fill and the coverage fraction.
    */
  private def spanReport(docs: DataFrame, perDoc: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_regions"), lit(0L)).as("n_dup_regions"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_fraction"))

  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val spans = spanPositions(docs)
    val dup = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ")).filter(col("n_occ") >= 2)
    val marked = spans.join(dup.select("h"), Seq("h"), "left_semi")
    spanReport(docs, mergedRegions(marked))
  }

  /** Merged duplicated regions per doc, as a sorted array of
    * (st, en) structs — the region list both the report and the
    * excision consume.
    */
  private def regionArrays(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val spans = spanPositions(docs)
    val dup = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ")).filter(col("n_occ") >= 2)
    val marked = spans.join(dup.select("h"), Seq("h"), "left_semi")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("st"))
    marked
      .select(col("doc_id"), col("pos").as("st"), (col("pos") + lit(SpanW)).as("en"))
      .withColumn("prev_max",
        max(col("en")).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_max").isNull || col("st") > col("prev_max"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(byPos))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("st")).as("st"), max(col("en")).as("en"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("st"), col("en")))).as("regs"))
  }

  /** The cleaned corpus — [[dupSpans]]' end product: every doc with
    * its duplicated regions EXCISED (the token positions inside any
    * merged region dropped, survivors rejoined in order), the form
    * the ExactSubstr pipeline actually feeds to training. Region
    * excision is a row-level higher-order filter over the token
    * array against the doc's (bounded) region list — map-only after
    * the one region join; the oracle reassembles via an exploded
    * position anti-join + ordered string_agg, and the hash compare
    * certifies byte-identical cleaned text.
    */
  def dupSpansClean(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.join(regionArrays(spark, dir, docs), Seq("doc_id"), "left")
      .withColumn("regs", coalesce(col("regs"),
        array().cast("array<struct<st:int,en:int>>")))
      .select(col("doc_id"),
        expr("""array_join(
                  filter(split(text, ' '), (t, i) ->
                    NOT exists(regs, r -> i >= r.st AND i < r.en)), ' ')""")
          .as("clean_text"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        expr("aggregate(regs, 0L, (acc, r) -> acc + (r.en - r.st))").as("n_removed"))
      .select(col("doc_id"), col("clean_text"), col("n_tokens"), col("n_removed"),
        (col("n_tokens") - col("n_removed")).as("n_kept"))
  }

  /** Incremental exact-substring span dedup — [[dupSpans]] in the
    * dedup-at-ingest shape the rest of the dedup matrix has: the
    * arriving batch (doc_id % 10 = 0, the house split) probes the
    * STANDING CORPUS' span-hash index plus its own intra-batch span
    * counts; the corpus is never self-joined and never re-reported. A
    * batch span position is duplicated text iff its span text already
    * exists anywhere in the corpus OR occurs at >= 2 positions within
    * the batch itself. The corpus index is one memoized distinct-hash
    * frame (at scale: the persisted index a production ingest
    * maintains); per-batch cost is batch-sized — spans hash-join the
    * index, the interval merge windows only batch docs.
    */
  def dupSpansIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpusIdx = graft.SharedBuilds.getOrBuild[DataFrame](
        "dedup.spanIndex", spark, dir) { scope =>
      scope.cached(
        spanPositions(docs.filter(col("doc_id") % 10 =!= 0)).select("h").distinct())
    }
    val batchDocs = docs.filter(col("doc_id") % 10 === 0)
    val batchSpans = spanPositions(batchDocs)
    val intraDup = batchSpans.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ")).filter(col("n_occ") >= 2).select("h")
    val dupH = corpusIdx.unionByName(intraDup).distinct()
    val marked = batchSpans.join(dupH, Seq("h"), "left_semi")
    spanReport(batchDocs, mergedRegions(marked))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dup_spans" -> dupSpans,
    "q_dup_spans_incremental" -> dupSpansIncremental,
    "q_dup_spans_clean" -> dupSpansClean,
    "q_dedup_edit" -> dedupEditDistance,
    "q_overlap_matrix" -> overlapMatrix,
    "q_dedup_clusters" -> dedupClusters,
    "q_dedup_keep" -> dedupKeep,
    "q_dedup_best" -> dedupBest,
    "q_triplets" -> triplets,
    "q_cluster_stats" -> clusterStats,
    "q_dedup_incremental" -> dedupIncremental,
    "q_minhash_by_lang" -> minhashByLang,
    "q_dedup_exact" -> dedupExact,
    "q_dedup_minhash" -> dedupMinhash,
    "q_dedup_recall" -> dedupRecall,
    "q_dedup_simhash" -> dedupSimhash,
    "q_dedup_ngram" -> dedupNgram,
    "q_dedup_containment" -> dedupContainment,
    "q_dedup_embedding" -> dedupEmbedding,
    "q_emb_recall" -> embRecall,
    "q_emb_recall_sampled" -> embRecallSampled,
    "q_emb_recall_lowrate" -> embRecallLowRate
  )

  /** Shared CTE: distinct word-3-shingles, lead-window construction —
    * textually identical semantics to [[shingleArrays]].
    */
  private[graft] val shinglesCte: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok,
      |         generate_subscripts(string_split(text,' '), 1) AS pos
      |  FROM documents
      |), sh0 AS (
      |  SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok,2) OVER w AS s
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |), sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL)""".stripMargin

  private lazy val minhashOracle: String = oraclesBase("q_dedup_minhash")

  /** The 9 KM double-hash order minima as oracle select items —
    * mirrors [[graft.functions.TextFunctions.minhashOrder]] exactly:
    * order i = (h1 + i*h2) mod 2^32, h1/h2 the disjoint md5 hex
    * windows [1,8] and [17,24]. ONE definition feeds every sig CTE so
    * the scheme can never diverge between oracles.
    */
  private[graft] lazy val sigSqlItems: String = (0 until 9).map(i =>
    s"min(CAST((('0x' || substr(md5(s), 1, 8))::UBIGINT + $i * " +
      s"('0x' || substr(md5(s), 17, 8))::UBIGINT) % 4294967296 AS BIGINT)) AS m$i")
    .mkString(",\n         ")

  /** q_dedup_incremental oracle body — factored so the incremental
    * curation composition can nest it. */
  private[operators] lazy val oracleDedupIncremental: String =
    s"""WITH $shinglesCte,
      |sig AS (
      |  SELECT doc_id,
      |         $sigSqlItems
      |  FROM sh GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, 0 AS band_id, m0 || '_' || m1 || '_' || m2 AS band_key FROM sig
      |  UNION ALL SELECT doc_id, 1, m3 || '_' || m4 || '_' || m5 FROM sig
      |  UNION ALL SELECT doc_id, 2, m6 || '_' || m7 || '_' || m8 FROM sig
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS corpus_id
      |  FROM bands x JOIN bands y
      |    ON x.band_id = y.band_id AND x.band_key = y.band_key
      |   AND x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0
      |), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT new_id, corpus_id, count(*) AS c
      |  FROM cand
      |  JOIN sh sa ON sa.doc_id = new_id
      |  JOIN sh sb ON sb.doc_id = corpus_id AND sa.s = sb.s
      |  GROUP BY new_id, corpus_id
      |)
      |SELECT new_id, corpus_id,
      |       CAST(c AS DOUBLE) / CAST(za.n_sh + zb.n_sh - c AS DOUBLE) AS jaccard
      |FROM inter
      |JOIN sizes za ON za.doc_id = new_id
      |JOIN sizes zb ON zb.doc_id = corpus_id
      |WHERE 9 * c >= 4 * (za.n_sh + zb.n_sh)""".stripMargin

  /** Shared recursive-CTE prelude computing the per-doc cluster labels
    * (same transitive closure as the q_dedup_clusters oracle).
    */
  private[operators] lazy val ccLabelsCte: String =
    s"""WITH RECURSIVE pairs AS (
      |  SELECT doc_a, doc_b FROM (
      |$minhashOracle
      |  ) m
      |), edges AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  UNION SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
      |), reach(src, dst) AS (
      |  SELECT doc_a, doc_a FROM edges
      |  UNION
      |  SELECT r.src, e.doc_b FROM reach r JOIN edges e ON r.dst = e.doc_a
      |), labels AS (
      |  SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
      |  FROM reach GROUP BY src
      |)""".stripMargin

  /** The +-1 hyperplane rows as DuckDB VALUES literals: (k, [s0..s63]). */
  private lazy val planesSqlValues: String =
    embPlanes.zipWithIndex
      .map { case (row, k) => s"($k, [${row.mkString(",")}])" }
      .mkString(",\n    ")

  /** Every hyperplane any tier can select (16 bands × 16 bits max) —
    * the adaptive oracle carries them all and filters to the active
    * prefix, so the tier choice lives in SQL, not in which literal
    * was baked.
    */
  private lazy val planesSqlValuesAll: String =
    Array.tabulate(16 * 16)(embPlaneRow).zipWithIndex
      .map { case (row, k) => s"($k, [${row.mkString(",")}])" }
      .mkString(",\n    ")

  /** Shared embedding-oracle prelude: quantized components, integer
    * norms, hyperplane sign bits, band keys — the FIXED tier-0 form,
    * used by the q_stream_emb oracle whose Spark side pins tier 0 by
    * design (dedup-at-ingest bands at a fixed scheme; see
    * [[graft.streaming.StreamingOps]]). The batch oracles use
    * [[embOracleCteAdaptive]].
    */
  private[graft] lazy val embOracleCte: String =
    s"""q AS (
      |  SELECT vec_id,
      |         generate_subscripts(embedding, 1) AS p,
      |         CAST(round(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS qc
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(sum(qc * qc) AS BIGINT) AS n2 FROM q GROUP BY vec_id
      |), planes AS (
      |  SELECT k, generate_subscripts(sv, 1) AS p, unnest(sv) AS s
      |  FROM (VALUES $planesSqlValues) t(k, sv)
      |), bits AS (
      |  SELECT q.vec_id, pl.k,
      |         CASE WHEN sum(q.qc * pl.s) >= 0 THEN 1 ELSE 0 END AS b
      |  FROM q JOIN planes pl ON q.p = pl.p
      |  GROUP BY q.vec_id, pl.k
      |), keys AS (
      |  SELECT vec_id, k // $EMB_BITS AS band_id,
      |         CAST(sum(b * (1 << (k % $EMB_BITS))) AS INT) AS band_key
      |  FROM bits GROUP BY vec_id, k // $EMB_BITS
      |)""".stripMargin

  /** Tier-AWARE embedding-oracle prelude: re-derives the (bands, bits)
    * selection of [[embTier]] in SQL — integer-exactly, as the least
    * k in [4,16] with 2^k >= max(1, n/32) (COALESCE clamps the
    * beyond-2M-vector case to 16), never a floating log2 whose
    * rounding at exact powers of two could drift — from the
    * caller-supplied corpus-count expression (`count(*)` for the
    * audit oracles, which run doc-level; `count(DISTINCT embedding)`
    * for q_dedup_embedding, whose Spark side selects the tier from
    * the exact-duplicate-collapsed representative count). The planes
    * VALUES literal carries all 256 possible hyperplanes; `pl.k <
    * bands*bits` activates the selected prefix, so below
    * EMB_TIER0_MAX this reduces to exactly the fixed CTE. CTEs are
    * MATERIALIZED: DuckDB 1.0 inlines per reference and `qv`/`keys`
    * are referenced several times downstream. Vectors stay LISTS and
    * dots are `list_dot_product` — the earlier unnest-to-rows
    * formulation joined 12.8M component rows against 208 active
    * planes (~2.7G intermediate rows at 200k vectors) and exhausted
    * >40 GB of DuckDB spill at sf10; per-pair list kernels keep the
    * oracle linear in pairs. Exactness holds: quantized components
    * are |q| <= ~2000, so every product/sum is an integer far below
    * 2^53 and the DOUBLE-returning kernel is bit-exact to the
    * engine's integer arithmetic.
    */
  private[graft] def embOracleCteAdaptive(countSql: String): String =
    s"""qv AS MATERIALIZED (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), norms AS MATERIALIZED (
      |  SELECT vec_id, CAST(list_dot_product(qv, qv) AS BIGINT) AS n2 FROM qv
      |), tier AS MATERIALIZED (
      |  SELECT CASE WHEN n <= $EMB_TIER0_MAX THEN $EMB_BANDS ELSE 16 END AS bands,
      |         CASE WHEN n <= $EMB_TIER0_MAX THEN $EMB_BITS
      |              ELSE COALESCE((SELECT min(k) FROM range(4, 17) t(k)
      |                             WHERE (CAST(1 AS BIGINT) << k) >= GREATEST(n // 32, 1)), 16)
      |         END AS bits
      |  FROM (SELECT ($countSql) AS n FROM embeddings) c
      |), planes AS MATERIALIZED (
      |  SELECT k, sv FROM (VALUES $planesSqlValuesAll) t(k, sv)
      |), keys AS MATERIALIZED (
      |  SELECT vec_id, k // (SELECT bits FROM tier) AS band_id,
      |         CAST(sum(b * (1 << (k % (SELECT bits FROM tier)))) AS INT) AS band_key
      |  FROM (
      |    SELECT q.vec_id, pl.k,
      |           CASE WHEN list_dot_product(q.qv, pl.sv) >= 0 THEN 1 ELSE 0 END AS b
      |    FROM qv q, planes pl
      |    WHERE pl.k < (SELECT bands * bits FROM tier)
      |  ) GROUP BY vec_id, k // (SELECT bits FROM tier)
      |)""".stripMargin

  /** One rendering of the anchors-vs-corpus recall-audit oracle:
    * exact integer-cosine truth beside the adaptive-tier band
    * candidate set, with the corpus (b) side optionally restricted by
    * a sample predicate. Shared by the full, 1/2-rate, and 1/16-rate
    * variants so the audit SQL can never diverge between tiers.
    */
  private def embRecallOracleSql(samplePred: Option[String]): String = {
    val pred = samplePred.fold("")(p => s"\n   AND $p")
    s"""WITH ${embOracleCteAdaptive("count(*)")}, anc AS (
      |  SELECT vec_id FROM embeddings
      |  ORDER BY md5('anc:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT $EMB_ANCHORS
      |), dots AS (
      |  SELECT qa.vec_id AS vec_a, qb.vec_id AS vec_b,
      |         CAST(list_dot_product(qa.qv, qb.qv) AS BIGINT) AS dot
      |  FROM qv qa
      |  JOIN anc ON anc.vec_id = qa.vec_id
      |  JOIN qv qb ON qa.vec_id <> qb.vec_id$pred
      |), truth AS (
      |  SELECT vec_a, vec_b,
      |         CAST(floor((CAST(dot AS DOUBLE) /
      |              (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))) * 10) AS INT) AS bucket
      |  FROM dots
      |  JOIN norms na ON na.vec_id = vec_a
      |  JOIN norms nb ON nb.vec_id = vec_b
      |  WHERE CAST(dot AS DOUBLE) /
      |        (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.40
      |), prop AS (
      |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
      |  FROM keys x
      |  JOIN anc ON anc.vec_id = x.vec_id
      |  JOIN keys y
      |    ON x.band_id = y.band_id AND x.band_key = y.band_key
      |   AND x.vec_id <> y.vec_id
      |)
      |SELECT bucket,
      |       CAST(count(*) AS BIGINT) AS n_true,
      |       CAST(count(p.vec_a) AS BIGINT) AS n_caught,
      |       CAST(count(p.vec_a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
      |FROM truth t
      |LEFT JOIN prop p ON p.vec_a = t.vec_a AND p.vec_b = t.vec_b
      |GROUP BY bucket""".stripMargin
  }

  def oracles: Map[String, String] = oraclesBase ++ Map(
    // one source of truth for the transitive closure: the clusters
    // oracle reads the same labels CTE q_dedup_keep/q_cluster_stats do
    "q_dedup_clusters" ->
      s"""$ccLabelsCte
        |SELECT doc_id, cluster_id FROM labels ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" -> oracleDedupIncremental,
    "q_dedup_keep" ->
      s"""$ccLabelsCte
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM labels l
        |  WHERE l.doc_id = d.doc_id AND l.cluster_id <> d.doc_id)""".stripMargin,
    "q_triplets" ->
      s"""WITH pairs AS (
        |$minhashOracle
        |), pool AS (
        |  SELECT doc_id AS cand, md5('neg:' || CAST(doc_id AS VARCHAR)) AS ch
        |  FROM documents ORDER BY ch, cand LIMIT 64
        |), nc AS (
        |  SELECT p.doc_a, p.doc_b, p.jaccard, l.cand,
        |         md5(CAST(p.doc_a AS VARCHAR) || ':' || CAST(l.cand AS VARCHAR)) AS nh
        |  FROM pairs p JOIN pool l ON l.cand <> p.doc_a AND l.cand <> p.doc_b
        |), r AS (
        |  SELECT doc_a, doc_b, jaccard, cand,
        |         row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY nh, cand) AS rn
        |  FROM nc
        |)
        |SELECT doc_a AS anchor_doc, doc_b AS pos_doc, jaccard, cand AS neg_doc
        |FROM r WHERE rn = 1""".stripMargin,
    "q_dedup_best" ->
      s"""$ccLabelsCte,
        |ranked AS (
        |  SELECT l.cluster_id, d.doc_id, d.n_chars,
        |         row_number() OVER (PARTITION BY l.cluster_id
        |                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn,
        |         count(*) OVER (PARTITION BY l.cluster_id) AS n_docs
        |  FROM labels l JOIN documents d ON d.doc_id = l.doc_id
        |)
        |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
        |       doc_id AS kept_doc_id, n_chars AS kept_chars
        |FROM ranked WHERE rn = 1""".stripMargin,
    "q_cluster_stats" ->
      s"""$ccLabelsCte
        |SELECT cluster_id, count(*) AS n_docs,
        |       CAST(count(*) - 1 AS BIGINT) AS n_removed
        |FROM labels GROUP BY cluster_id""".stripMargin,
    // the minhash oracle runs as a subquery producing the near-dup pairs
    "q_overlap_matrix" ->
      s"""SELECT least(da.source, db.source) AS source_a,
        |       greatest(da.source, db.source) AS source_b,
        |       CAST(count(*) AS BIGINT) AS n_pairs
        |FROM (
        |$minhashOracle
        |) p
        |JOIN documents da ON da.doc_id = p.doc_a
        |JOIN documents db ON db.doc_id = p.doc_b
        |GROUP BY 1, 2""".stripMargin,
    // plain all-pairs truth at t=0.5 beside the banding's candidate
    // set — certifies the t=0.5 prefix filter AND measures propose
    // recall per similarity decile
    "q_dedup_recall" ->
      s"""WITH $shinglesCte,
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS c
        |  FROM sh sa JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b,
        |         CAST((10 * c) // (za.n_sh + zb.n_sh - c) AS INT) AS bucket
        |  FROM inter
        |  JOIN sizes za ON za.doc_id = doc_a
        |  JOIN sizes zb ON zb.doc_id = doc_b
        |  WHERE 3 * c >= za.n_sh + zb.n_sh
        |), sig AS (
        |  SELECT doc_id,
        |         $sigSqlItems
        |  FROM sh GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, 0 AS band_id, m0 || '_' || m1 || '_' || m2 AS band_key FROM sig
        |  UNION ALL SELECT doc_id, 1, m3 || '_' || m4 || '_' || m5 FROM sig
        |  UNION ALL SELECT doc_id, 2, m6 || '_' || m7 || '_' || m8 FROM sig
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc_id < y.doc_id
        |)
        |SELECT bucket,
        |       CAST(count(*) AS BIGINT) AS n_true,
        |       CAST(count(cd.doc_a) AS BIGINT) AS n_caught,
        |       CAST(count(cd.doc_a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
        |FROM truth t
        |LEFT JOIN cand cd ON cd.doc_a = t.doc_a AND cd.doc_b = t.doc_b
        |GROUP BY bucket""".stripMargin,
    // the minhash oracle runs as a subquery producing the candidate pairs
    "q_dedup_edit" ->
      s"""SELECT p.doc_a, p.doc_b,
        |       CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist,
        |       1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
        |             CAST(greatest(length(da.text), length(db.text)) AS DOUBLE) AS edit_sim
        |FROM (
        |$minhashOracle
        |) p
        |JOIN documents da ON da.doc_id = p.doc_a
        |JOIN documents db ON db.doc_id = p.doc_b""".stripMargin
  )

  private lazy val oraclesBase: Map[String, String] = Map(
    "q_minhash_by_lang" ->
      s"""WITH $shinglesCte,
        |langsh AS (
        |  SELECT d.lang, s.s FROM sh s JOIN documents d ON d.doc_id = s.doc_id
        |)
        |SELECT lang,
        |       $sigSqlItems
        |FROM langsh GROUP BY lang""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $shinglesCte,
        |sig AS (
        |  SELECT doc_id,
        |         $sigSqlItems
        |  FROM sh GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, 0 AS band_id, m0 || '_' || m1 || '_' || m2 AS band_key FROM sig
        |  UNION ALL SELECT doc_id, 1, m3 || '_' || m4 || '_' || m5 FROM sig
        |  UNION ALL SELECT doc_id, 2, m6 || '_' || m7 || '_' || m8 FROM sig
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.band_key = y.band_key AND x.doc_id < y.doc_id
        |), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT doc_a, doc_b, count(*) AS c
        |  FROM cand
        |  JOIN sh sa ON sa.doc_id = doc_a
        |  JOIN sh sb ON sb.doc_id = doc_b AND sa.s = sb.s
        |  GROUP BY doc_a, doc_b
        |)
        |SELECT doc_a, doc_b,
        |       CAST(c AS DOUBLE) / CAST(za.n_sh + zb.n_sh - c AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes za ON za.doc_id = doc_a
        |JOIN sizes zb ON zb.doc_id = doc_b
        |WHERE 9 * c >= 4 * (za.n_sh + zb.n_sh)""".stripMargin,
    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, substring(md5(unnest(string_split(text,' '))), 1, 8) AS h
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id, h, unnest(range(0, 32)) AS bitpos FROM tok
        |), v AS (
        |  SELECT doc_id, bitpos,
        |         CASE WHEN (((strpos('0123456789abcdef', substring(h, CAST(bitpos // 4 AS INT) + 1, 1)) - 1)
        |                    >> (bitpos % 4)) & 1) = 1 THEN 1 ELSE -1 END AS v
        |  FROM bits
        |), sums AS (
        |  SELECT doc_id, bitpos, sum(v) AS sv FROM v GROUP BY doc_id, bitpos
        |)
        |SELECT doc_id,
        |       string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, '' ORDER BY bitpos) AS simhash
        |FROM sums GROUP BY doc_id""".stripMargin,
    "q_dedup_containment" ->
      s"""WITH $shinglesCte,
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_g FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT i.doc_a, i.doc_b, za.n_g AS n_a, zb.n_g AS n_b, i.c AS overlap,
        |       CAST(i.c AS DOUBLE) / CAST(za.n_g AS DOUBLE) AS containment
        |FROM inter i
        |JOIN sizes za ON za.doc_id = i.doc_a
        |JOIN sizes zb ON zb.doc_id = i.doc_b
        |WHERE 5 * i.c >= 4 * za.n_g""".stripMargin,
    "q_dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, n_chars, unnest(string_split(text,' ')) AS tok,
        |         generate_subscripts(string_split(text,' '), 1) AS pos
        |  FROM documents
        |), g0 AS (
        |  SELECT doc_id, n_chars, tok || ' ' || lead(tok) OVER w AS g
        |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), grams AS (SELECT DISTINCT doc_id, n_chars, g FROM g0 WHERE g IS NOT NULL),
        |sizes AS (SELECT doc_id, count(*) AS n_g FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM grams a JOIN grams b
        |    ON a.g = b.g AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 30
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       CAST(c AS DOUBLE) / CAST(za.n_g + zb.n_g - c AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes za ON za.doc_id = doc_a
        |JOIN sizes zb ON zb.doc_id = doc_b
        |WHERE 17 * c >= 7 * (za.n_g + zb.n_g)""".stripMargin,
    // the oracle recomputes the SAME hyperplane LSH from the same +-1
    // literals (embedded below), so the candidate set — not just the
    // verified pairs — is cross-checked
    "q_dedup_embedding" ->
      s"""WITH ${embOracleCteAdaptive("count(DISTINCT embedding)")}, cand AS (
        |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM keys a JOIN keys b
        |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.vec_id < b.vec_id
        |), dots AS (
        |  SELECT c.vec_a, c.vec_b,
        |         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
        |  FROM cand c
        |  JOIN qv a ON a.vec_id = c.vec_a
        |  JOIN qv b ON b.vec_id = c.vec_b
        |)
        |SELECT vec_a, vec_b,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        |FROM dots
        |JOIN norms na ON na.vec_id = vec_a
        |JOIN norms nb ON nb.vec_id = vec_b
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.40""".stripMargin,
    // anchors-vs-corpus exact cosine truth beside the hyperplane band
    // candidate set — the semantic modality's propose-recall audit.
    // Sampled tiers restrict the corpus (b) side to the deterministic
    // md5 draw the Spark side computes, so sampled counts compare
    // exactly: rate 1/2, and the aggressive 1/16 sparse-sample regime.
    "q_emb_recall" -> embRecallOracleSql(None),
    "q_emb_recall_sampled" ->
      embRecallOracleSql(Some(corpusSampledSql("qb.vec_id"))),
    "q_emb_recall_lowrate" ->
      embRecallOracleSql(Some(corpusSampledSql("qb.vec_id", CORPUS_LOWRATE_THRESH))),
    // same W, same md5-of-joined-span hashing, same gaps-and-islands
    // interval merge — spelled with unnest + window SQL
    "q_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS p
        |  FROM toks WHERE len(t) >= 5
        |), spans AS (
        |  SELECT doc_id, p, md5(array_to_string(t[p + 1 : p + 5], ' ')) AS h FROM pos
        |), dup AS (
        |  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
        |), marked AS (
        |  SELECT s.doc_id, s.p AS st, s.p + 5 AS en FROM spans s JOIN dup USING (h)
        |), isl AS (
        |  SELECT doc_id, st, en,
        |         max(en) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM marked
        |), flagged AS (
        |  SELECT doc_id, st, en,
        |         CASE WHEN prev_max IS NULL OR st > prev_max THEN 1 ELSE 0 END AS ni
        |  FROM isl
        |), numbered AS (
        |  SELECT doc_id, st, en,
        |         sum(ni) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged
        |), regions AS (
        |  SELECT doc_id, island, min(st) AS st, max(en) AS en FROM numbered GROUP BY 1, 2
        |), per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_regions,
        |         CAST(sum(en - st) AS BIGINT) AS dup_tokens
        |  FROM regions GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(p.n_dup_regions, 0) AS BIGINT) AS n_dup_regions,
        |       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |       CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) /
        |         CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS dup_fraction
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)""".stripMargin,
    // same region derivation, then reassembly via an exploded
    // position anti-join + ordered string_agg
    "q_dup_spans_clean" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS p
        |  FROM toks WHERE len(t) >= 5
        |), spans AS (
        |  SELECT doc_id, p, md5(array_to_string(t[p + 1 : p + 5], ' ')) AS h FROM pos
        |), dup AS (
        |  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
        |), marked AS (
        |  SELECT s.doc_id, s.p AS st, s.p + 5 AS en FROM spans s JOIN dup USING (h)
        |), isl AS (
        |  SELECT doc_id, st, en,
        |         max(en) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM marked
        |), flagged AS (
        |  SELECT doc_id, st, en,
        |         CASE WHEN prev_max IS NULL OR st > prev_max THEN 1 ELSE 0 END AS ni
        |  FROM isl
        |), numbered AS (
        |  SELECT doc_id, st, en,
        |         sum(ni) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged
        |), regions AS (
        |  SELECT doc_id, island, min(st) AS st, max(en) AS en FROM numbered GROUP BY 1, 2
        |), allpos AS (
        |  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS i FROM toks
        |), kept AS (
        |  SELECT a.doc_id, a.tok, a.i
        |  FROM allpos a
        |  LEFT JOIN regions r ON r.doc_id = a.doc_id AND a.i >= r.st AND a.i < r.en
        |  WHERE r.doc_id IS NULL
        |), clean AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
        |  FROM kept GROUP BY doc_id
        |), rem AS (
        |  SELECT doc_id, CAST(sum(en - st) AS BIGINT) AS n_removed
        |  FROM regions GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(m.n_removed, 0) AS BIGINT) AS n_removed,
        |       CAST(len(string_split(d.text, ' ')) - coalesce(m.n_removed, 0) AS BIGINT)
        |         AS n_kept
        |FROM documents d
        |LEFT JOIN clean c USING (doc_id)
        |LEFT JOIN rem m USING (doc_id)""".stripMargin,
    // batch spans vs the corpus index plus intra-batch counts; only
    // batch docs are reported
    "q_dup_spans_incremental" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, t, unnest(range(0, len(t) - 4)) AS p
        |  FROM toks WHERE len(t) >= 5
        |), spans AS (
        |  SELECT doc_id, p, md5(array_to_string(t[p + 1 : p + 5], ' ')) AS h FROM pos
        |), corpus_idx AS (
        |  SELECT DISTINCT h FROM spans WHERE doc_id % 10 <> 0
        |), batch AS (
        |  SELECT doc_id, p, h FROM spans WHERE doc_id % 10 = 0
        |), intra AS (
        |  SELECT h FROM batch GROUP BY h HAVING count(*) >= 2
        |), dup AS (
        |  SELECT h FROM corpus_idx UNION SELECT h FROM intra
        |), marked AS (
        |  SELECT b.doc_id, b.p AS st, b.p + 5 AS en FROM batch b JOIN dup USING (h)
        |), isl AS (
        |  SELECT doc_id, st, en,
        |         max(en) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM marked
        |), flagged AS (
        |  SELECT doc_id, st, en,
        |         CASE WHEN prev_max IS NULL OR st > prev_max THEN 1 ELSE 0 END AS ni
        |  FROM isl
        |), numbered AS (
        |  SELECT doc_id, st, en,
        |         sum(ni) OVER (PARTITION BY doc_id ORDER BY st
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged
        |), regions AS (
        |  SELECT doc_id, island, min(st) AS st, max(en) AS en FROM numbered GROUP BY 1, 2
        |), per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_regions,
        |         CAST(sum(en - st) AS BIGINT) AS dup_tokens
        |  FROM regions GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(p.n_dup_regions, 0) AS BIGINT) AS n_dup_regions,
        |       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |       CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) /
        |         CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS dup_fraction
        |FROM documents d LEFT JOIN per_doc p USING (doc_id)
        |WHERE d.doc_id % 10 = 0""".stripMargin
  )
}
