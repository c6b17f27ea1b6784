package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupQueries

/** The exact-duplicate collapse paths in the fuzzy dedup queries only
  * activate when the corpus HAS duplicate classes — which the driver
  * fixtures don't at oracle scale. This spec builds a corpus where
  * they do, with expected pair sets that are fully determined:
  * duplicate classes pair at similarity exactly 1.0, the cross-class
  * near-dups are shingle-set PERMUTATIONS (identical signatures, so
  * LSH banding catches them deterministically), and empty/one-token
  * docs must produce nothing.
  */
class DedupCollapseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("dedup_collapse").toString
    // class A x3 and class B x2 have IDENTICAL 3-shingle/bigram SETS
    // (B is a rotation of A), class C x2 is unrelated, class D x2 is
    // empty text, E is a single token (no shingles, no bigrams)
    val docs = Seq(
      (1L, "a b c a b"), (4L, "a b c a b"), (2L, "a b c a b"),
      (3L, "b c a b c"), (7L, "b c a b c"),
      (5L, "q r s t u"), (6L, "q r s t u"),
      (8L, ""), (9L, ""),
      (10L, "solo"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("xx"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    // v1 x3; v2 quantizes IDENTICALLY to v1 (perturbation < half a
    // quantization step) so banding and scoring see equal vectors;
    // v3 = -v1 x2 (cosine -1 vs v1: never a candidate, never a pair)
    val v1 = Array.tabulate(64)(i => (if (i % 2 == 0) 0.6f else -0.7f))
    val v2 = v1.map(x => x + (if (x > 0) 0.0003f else -0.0003f))
    val v3 = v1.map(-_)
    val embs = Seq(
      (1L, v1), (2L, v1), (5L, v1),
      (3L, v2),
      (4L, v3), (6L, v3))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    embs.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private val textPairs = Set(
    // intra A, intra B, A x B (identical sets, jaccard 1.0)
    (1L, 2L), (1L, 4L), (2L, 4L),
    (3L, 7L),
    (1L, 3L), (1L, 7L), (2L, 3L), (2L, 7L), (3L, 4L), (4L, 7L),
    // intra C
    (5L, 6L))

  test("dedupMinhash expands duplicate classes to the exact pair set at jaccard 1.0") {
    val got = DedupQueries.dedupMinhash(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == textPairs)
    assert(got.forall(p => p._1 < p._2 && p._3 == 1.0))
  }

  test("dedupNgram expands duplicate classes to the exact pair set at jaccard 1.0") {
    val got = DedupQueries.dedupNgram(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == textPairs)
    assert(got.forall(p => p._1 < p._2 && p._3 == 1.0))
  }

  test("dedupClusters groups the duplicate classes into one component plus C") {
    val got = DedupQueries.dedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    // A+B form one component with min id 1; C is its own with min 5
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 1L,
      5L -> 5L, 6L -> 5L))
  }

  test("dedupEditDistance expands duplicate classes: intra at 0, cross at the class distance") {
    val got = DedupQueries.dedupEditDistance(spark, dir)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == textPairs)
    val sameClass = Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 7L), (5L, 6L))
    // independent reference for the one distinct cross-class text pair
    val want = levenshteinRef("a b c a b", "b c a b c")
    got.foreach { case (a, b, dist, sim) =>
      if (sameClass((a, b))) assert(dist == 0 && sim == 1.0, s"($a,$b)")
      else assert(dist == want && sim == 1.0 - want.toDouble / 9.0, s"($a,$b)")
    }
  }

  private def levenshteinRef(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("dedupEmbedding expands duplicate vector classes with oracle-shaped cosine") {
    val got = DedupQueries.dedupEmbedding(spark, dir)
      .as[(Long, Long, Double)].collect()
    // v1 class {1,2,5} + v2 (quantizes equal): all 6 pairs; v3 {4,6}: 1
    val expectPairs = Set(
      (1L, 2L), (1L, 5L), (2L, 5L), (1L, 3L), (2L, 3L), (3L, 5L),
      (4L, 6L))
    assert(got.map(p => (p._1, p._2)).toSet == expectPairs)
    // cosine of equal quantized vectors is n2/(sqrt(n2)*sqrt(n2)) —
    // the same arithmetic the oracle uses, NOT a literal 1.0
    val q = Array.tabulate(64)(i => math.round((if (i % 2 == 0) 0.6f else -0.7f) * 1000.0).toLong)
    val n2 = q.map(x => x * x).sum
    val want = n2.toDouble / (math.sqrt(n2.toDouble) * math.sqrt(n2.toDouble))
    assert(got.forall(_._3 == want))
  }
}
