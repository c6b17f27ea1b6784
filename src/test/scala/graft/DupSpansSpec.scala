package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupQueries

/** Exact-substring span dedup on a corpus whose duplicated spans are
  * fully determined: a single shared W=5 span across two docs, a run
  * of overlapping shared spans that must merge into ONE region, an
  * intra-doc repeat (two disjoint regions in one doc), a doc too
  * short to have any span, and a doc with no duplicated text at all.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("dup_spans").toString
    val docs = Seq(
      // one shared span "a b c d e": doc 1 at pos 0, doc 2 at pos 2
      (1L, "a b c d e f g h i j"),
      (2L, "x x a b c d e y y z"),
      // 7-token shared prefix -> spans at pos 0,1,2 overlap; must
      // merge to ONE region [0,7) in each doc
      (3L, "p q r s t u v w k l"),
      (4L, "p q r s t u v m n o"),
      // intra-doc repeat -> TWO disjoint regions [0,5) and [6,11)
      (5L, "m1 m2 m3 m4 m5 z m1 m2 m3 m4 m5"),
      // too short for any span
      (6L, "a b c"),
      // unique text, no duplicated span
      (7L, "u1 u2 u3 u4 u5 u6"),
      // batch docs (doc_id % 10 = 0) for the incremental variant:
      // 10 hits the corpus span "a b c d e"; 20 repeats a span only
      // within itself (intra-batch); 30 is entirely novel
      (10L, "a b c d e k2 k3 k4 k5 k6"),
      (20L, "n1 n2 n3 n4 n5 w n1 n2 n3 n4 n5"),
      (30L, "z1 z2 z3 z4 z5 z6"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("xx"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("dupSpans finds, merges, and measures duplicated regions exactly") {
    val got = DedupQueries.dupSpans(spark, dir)
      .select("doc_id", "n_tokens", "n_dup_regions", "dup_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 10L, 1L, 5L),
      (2L, 10L, 1L, 5L),
      (3L, 10L, 1L, 7L),
      (4L, 10L, 1L, 7L),
      (5L, 11L, 2L, 10L),
      (6L, 3L, 0L, 0L),
      (7L, 6L, 0L, 0L),
      (10L, 10L, 1L, 5L),
      (20L, 11L, 2L, 10L),
      (30L, 6L, 0L, 0L)))
  }

  test("clean variant excises exactly the merged regions and rejoins in order") {
    val got = DedupQueries.dupSpansClean(spark, dir)
      .select("doc_id", "clean_text", "n_removed", "n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, r, k) => (id, (t, r, k)) }.toMap
    assert(got(1L) === (("f g h i j", 5L, 5L)))     // region [0,5) gone
    assert(got(2L) === (("x x y y z", 5L, 5L)))     // region [2,7) gone
    assert(got(3L) === (("w k l", 7L, 3L)))         // merged [0,7) gone
    assert(got(5L) === (("z", 10L, 1L)))            // two regions, middle survives
    assert(got(6L) === (("a b c", 0L, 3L)))         // untouched
    assert(got(7L) === (("u1 u2 u3 u4 u5 u6", 0L, 6L)))
  }

  test("incremental variant reports only batch docs, against corpus + intra-batch spans") {
    val got = DedupQueries.dupSpansIncremental(spark, dir)
      .select("doc_id", "n_tokens", "n_dup_regions", "dup_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 10L, 1L, 5L),   // corpus-index hit
      (20L, 11L, 2L, 10L),  // intra-batch repeat only
      (30L, 6L, 0L, 0L)))   // novel text
  }

  test("dup_fraction is dup_tokens over n_tokens") {
    val fr = DedupQueries.dupSpans(spark, dir)
      .select("doc_id", "dup_fraction").as[(Long, Double)].collect().toMap
    assert(fr(1L) === 0.5)
    assert(fr(5L) === 10.0 / 11.0)
    assert(fr(6L) === 0.0)
  }
}
