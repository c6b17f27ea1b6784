package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationQueries

/** Structural invariants for the corpus-curation operators (the DuckDB
  * hash-compare is the primary gate; these pin the semantics that a
  * hash can't explain when it breaks).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token exactly once per window position") {
    val chunks = CurationQueries.chunk(spark, sf0001).cache()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))

    // per doc: chunk_ids are 0..ceil(n/4)-1, and the total chunk
    // tokens equal the sum of least(8, n - 4i) over every window start
    val bad = chunks
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max(col("chunk_id")).as("max_id"),
        sum(col("n_tokens")).as("sum_tok"))
      .join(docs, Seq("doc_id"))
      .filter(col("max_id") =!= col("n_chunks") - 1 ||
        col("n_chunks") =!= expr("cast((n_toks + 3) div 4 as int)") ||
        col("sum_tok") =!= expr(
          "aggregate(sequence(0, n_toks - 1, 4), 0L, (acc, s) -> acc + least(8L, cast(n_toks - s as bigint)))"))
    assert(bad.count() == 0)

    // the first chunk of every doc is the doc's first 8 tokens
    val first = chunks.filter(col("chunk_id") === 0)
      .join(Tables.documents(spark, sf0001), Seq("doc_id"))
      .filter(col("chunk_text") =!= expr("array_join(slice(split(text, ' '), 1, 8), ' ')"))
    assert(first.count() == 0)
    chunks.unpersist()
  }

  test("hash sampling is deterministic and rate-nested (lower tier is a subset)") {
    val s1 = CurationQueries.sampleHash(spark, sf0001).collect().toSet
    val s2 = CurationQueries.sampleHash(spark, sf0001).collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    // every doc kept under a '4000' threshold is kept under '8000':
    // the en-rate keeps a superset of what the non-en rate would
    val docs = Tables.documents(spark, sf0001)
      .withColumn("bucket", substring(md5(concat(lit("smp:"), col("doc_id").cast("string"))), 1, 4))
    val low = docs.filter(col("bucket") < "4000").select("doc_id").as[Long].collect().toSet
    val high = docs.filter(col("bucket") < "8000").select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("decontamination: benchmark docs are excluded, hits are bounded by shingle count") {
    val out = CurationQueries.decontaminate(spark, sf0001).cache()
    assert(out.filter(col("doc_id") % 20 === 0).count() == 0)
    assert(out.filter(col("n_hits") > col("n_sh") || col("n_hits") < 0).count() == 0)
    assert(out.filter(col("contaminated") =!= (col("n_hits") > 0)).count() == 0)
    // the fixture vocabulary is tiny (31 words), so some 3-shingle
    // collisions with the benchmark slice must exist
    assert(out.filter(col("contaminated")).count() > 0)
    out.unpersist()
  }

  test("per-stratum quota sample: at most 10 per language, contiguous ranks") {
    val out = CurationQueries.sampleGroup(spark, sf0001).cache()
    val perLang = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max(col("rn")).as("hi"), min(col("rn")).as("lo"))
    assert(perLang.filter(col("n") > 10 || col("hi") =!= col("n") || col("lo") =!= 1).count() == 0)
    // deterministic across runs
    assert(out.collect().toSet == CurationQueries.sampleGroup(spark, sf0001).collect().toSet)
    out.unpersist()
  }

  test("gini diversity is in [0, 1) and consistent with token counts") {
    val out = operators.TextAnalysisQueries.diversity(spark, sf0001)
    val bad = out.filter(
      col("gini_diversity") < 0 || col("gini_diversity") >= 1 ||
        col("n_distinct") > col("n_tokens") ||
        // all-distinct docs hit the maximum 1 - 1/n exactly
        (col("n_distinct") === col("n_tokens") &&
          col("gini_diversity") =!= (col("n_tokens") - 1).cast("double") / col("n_tokens").cast("double")))
    assert(bad.count() == 0)
  }

  test("length outliers respect the Chebyshev bound and the reported mean") {
    val out = CurationQueries.outlier(spark, sf0001).cache()
    // P(|x - mean| > 2 sigma) <= 1/4 for ANY distribution
    val perLang = out.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_out"),
      max(col("lang_mean")).as("rep_mean"),
      avg(col("n_chars")).as("true_mean"))
    assert(perLang.filter(col("n_out") * 4 > col("n")).count() == 0)
    assert(perLang.filter(abs(col("rep_mean") - col("true_mean")) > 1e-9).count() == 0)
    out.unpersist()
  }

  test("sequence packing: offsets form a gapless token stream in doc order") {
    val out = CurationQueries.pack(spark, sf0001).orderBy("doc_id").collect()
    var expected = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("offset") == expected, s"doc ${r.getAs[Long]("doc_id")}")
      expected += r.getAs[Long]("n_tok")
      assert(r.getAs[Long]("bin_start") == r.getAs[Long]("offset") / 256)
      assert(r.getAs[Long]("bin_end") ==
        (r.getAs[Long]("offset") + r.getAs[Long]("n_tok") - 1) / 256)
    }
    assert(out.nonEmpty)
  }

  test("batch prefix-cap quota keeps a subset of the streaming first-fit keeps") {
    // first-fit's running total never exceeds the prefix sum, so any
    // doc whose prefix total fits must also fit under first-fit
    val prefixKept = CurationQueries.quota(spark, sf0001)
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .orderBy("source", "doc_id").collect()
    val firstFitKept = docs.groupBy(_.getString(1)).toSeq.flatMap { case (_, rows) =>
      var used = 0L
      rows.sortBy(_.getLong(0)).flatMap { r =>
        if (used + r.getLong(2) <= 2000L) { used += r.getLong(2); Some(r.getLong(0)) }
        else None
      }
    }.toSet
    assert(prefixKept.subsetOf(firstFitKept))
    assert(prefixKept.nonEmpty)
  }

  test("winsorized lengths stay inside the per-language [p5, p95] band") {
    val out = CurationQueries.winsorize(spark, sf0001).cache()
    assert(out.filter(col("clipped") < col("p5") || col("clipped") > col("p95")).count() == 0)
    // in-band rows pass through unchanged; out-of-band rows land on a bound
    val bad = out.filter(
      (col("n_chars") >= col("p5") && col("n_chars") <= col("p95") &&
        col("clipped") =!= col("n_chars").cast("double")) ||
      (col("n_chars") < col("p5") && col("clipped") =!= col("p5")) ||
      (col("n_chars") > col("p95") && col("clipped") =!= col("p95")))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("salted skew aggregate equals the direct single-phase aggregate") {
    val salted = CurationQueries.skewAgg(spark, sf0001).orderBy("l_returnflag").collect().toSeq
    val direct = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted == direct)
  }

  test("bm25 ranks are 1..5 per doc and ordered by descending score") {
    val out = CurationQueries.bm25(spark, sf0001).cache()
    val perDoc = out.groupBy("doc_id")
      .agg(min(col("rnk")).as("lo"), max(col("rnk")).as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("n") > 5)
    assert(perDoc.count() == 0)
    // score is monotone non-increasing in rank within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    val inversions = out
      .withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score"))
    assert(inversions.count() == 0)
    out.unpersist()
  }

  test("repetition kernel: max_multiplicity equals count-per-distinct max") {
    import graft.functions.MaxMultiplicity.max_multiplicity
    val df = Seq(
      "a b a b a b a b",      // repeated bigram "a b"
      "x y z w q",            // all distinct bigrams
      "t t t t t t"           // one bigram repeated
    ).toDF("text")
      .withColumn("bg", graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.tokens(col("text")), 2))
    val fused = df.withColumn("top", max_multiplicity(col("bg")))
    val naive = df.withColumn("top",
      array_max(transform(array_distinct(col("bg")),
        d => size(filter(col("bg"), x => x === d)))).cast("long"))
    assert(fused.select("top").as[Long].collect().toSeq ==
      naive.select("top").as[Long].collect().toSeq)
    assert(fused.select("top").as[Long].collect().toSeq == Seq(4L, 1L, 5L))
  }

  test("leakage-safe split: every doc split once, clusters never straddle splits") {
    val out = graft.operators.CurationQueries.leakSafeSplit(spark, sf0001).cache()
    // a partition of the corpus into the three named splits
    assert(out.count() == graft.Tables.documents(spark, sf0001).count())
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // THE invariant: near-dup cluster members share a split — the
    // contamination guard that distinguishes this from a row-hash split
    val mixed = out.groupBy("group_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.count() == 0)
    // all three splits are populated at fixture scale (hash sanity)
    assert(out.select("split").distinct().count() == 3)
    // the floor under the clusters: byte-identical texts (including
    // ones too short to shingle into the near-dup pipeline) always
    // share a split
    val byText = graft.Tables.documents(spark, sf0001).select("doc_id", "text")
      .join(out, Seq("doc_id"))
      .groupBy("text").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(byText.count() == 0)
    out.unpersist()
  }

  test("bloom aggregator bitset matches an independent membership model") {
    import graft.functions.BloomFilterAggregator
    val words = 4 // 256 bits
    val positions = Seq(0L, 1L, 63L, 64L, 65L, 255L, 128L, 64L)
    val bf = udaf(new BloomFilterAggregator(words))
    val bits = positions.toDF("p")
      .agg(bf(col("p")))
      .collect()(0).getSeq[Long](0)
    val want = positions.toSet
    for (b <- 0L until 256L) {
      val set = ((bits((b >> 6).toInt) >> (b & 63)) & 1L) == 1L
      assert(set == want.contains(b), s"bit $b")
    }
  }

  test("bloom prune is lossless vs exact decontamination (one-sided error)") {
    // a Bloom negative is a certain non-member, so bloomPrune's exact
    // hit counts must equal decontaminate's for every contaminated doc
    val exact = CurationQueries.decontaminate(spark, sf0001)
      .filter(col("contaminated"))
      .select(col("doc_id"), col("n_hits"))
    val bloom = CurationQueries.bloomPrune(spark, sf0001)
      .select(col("doc_id"), col("n_bloom"), col("n_exact"))
    val joined = exact.join(bloom, Seq("doc_id"), "left").cache()
    assert(joined.filter(col("n_exact").isNull).count() == 0,
      "a contaminated doc was missed by the bloom pre-filter")
    assert(joined.filter(col("n_exact") =!= col("n_hits")).count() == 0,
      "bloom-then-verify changed an exact hit count")
    assert(bloom.filter(col("n_bloom") < col("n_exact")).count() == 0,
      "bloom positives must be a superset of exact hits")
    joined.unpersist()
  }

  test("ks drift matches an independent brute-force KS model") {
    val got = CurationQueries.ksDrift(spark, sf0001)
      .select("source", "n_s", "n_rest", "ks_num")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val rows = Tables.documents(spark, sf0001)
      .select("source", "n_chars").as[(String, Long)].collect()
    val n = rows.length.toLong
    val values = rows.map(_._2).distinct.sorted
    for ((src, expectNs) <- rows.groupBy(_._1).view.mapValues(_.length.toLong)) {
      val nRest = n - expectNs
      // exact sup |F_s - F_rest| at every jump point, cross-multiplied
      val ksNum = values.map { v =>
        val cumS = rows.count(r => r._1 == src && r._2 <= v).toLong
        val cumR = rows.count(r => r._1 != src && r._2 <= v).toLong
        (BigInt(cumS) * nRest - BigInt(cumR) * expectNs).abs
      }.max
      val (ns, nr, kn) = got(src)
      assert(ns == expectNs && nr == nRest && BigInt(kn) == ksNum, s"source $src")
    }
  }

  test("classifier score equals the per-token exploded sum and respects the margin") {
    // the map-only aggregate() fold must equal the naive explode +
    // groupBy sum of the same per-token weight — the differential
    // that pins the fold (init value, bucket arithmetic, sign)
    val got = CurationQueries.qualityClassifier(spark, sf0001)
    val naive = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("w", expr(
        "((cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 64) * 37) % 21 - 10"))
      .groupBy("doc_id").agg(sum(col("w")).as("score2"))
    val bad = got.join(naive, Seq("doc_id"))
      .filter(col("score") =!= col("score2") ||
        col("keep") =!= (col("score2") >= 0) ||
        col("margin") =!= col("score2").cast("double") / col("n_tokens").cast("double"))
    assert(bad.count() == 0)
    assert(got.count() == Tables.documents(spark, sf0001).count())
  }

  test("target selection votes for target-vocabulary docs, against off-target docs") {
    val dir = java.nio.file.Files.createTempDirectory("target_sel").toString
    // ids 20/40 are the target slice (% 20 = 0); raw doc 1 reuses the
    // target vocabulary, raw doc 2 uses words the target never emits
    Seq(
      (20L, "t1 t2 t3 t4"), (40L, "t1 t2 t3 t4"),
      (1L, "t1 t2 t3 t4"),
      (2L, "x1 x2 x3 x4"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("xx"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.targetSelect(spark, dir)
      .select("doc_id", "vote", "selected")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(1L, 2L)) // target docs never reported
    assert(got(1L)._1 > 0 && got(1L)._2)
    assert(got(2L)._1 < 0 && !got(2L)._2)
  }

  test("max_multiplicity null semantics: null array -> null, null elements skipped") {
    import graft.functions.MaxMultiplicity.max_multiplicity
    val df = Seq(
      (1, Seq[String]("a", null, "a", "b")),
      (2, Seq[String]()),
      (3, null)
    ).toDF("id", "arr")
    val out = df.select(col("id"), max_multiplicity(col("arr")).as("m"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 2L)
    assert(out(1).getLong(1) == 0L)
    assert(out(2).isNullAt(1))
  }
}
