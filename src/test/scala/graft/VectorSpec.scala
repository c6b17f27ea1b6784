package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("float-path cosine matches hand-computed values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f), 24.0 / 25.0)
    ).toDF("a", "b", "want")
    val bad = df.select((abs(cosine(col("a"), col("b")) - col("want")) > 1e-9).as("bad"))
      .filter(col("bad")).count()
    assert(bad == 0)
  }

  test("quantized components round half away from zero to int64") {
    val df = Seq((Array(0.0015f, -0.0015f, 0.51f))).toDF("v")
    val q = df.select(quantized(col("v")).as("q")).head().getSeq[Long](0)
    assert(q == Seq(2L, -2L, 510L))
  }

  test("codegen cosine_sim matches the composable float path on real embeddings") {
    import graft.functions.CosineSimilarity
    val emb = graft.Tables.embeddings(spark, sf0001).limit(50)
    val pairs = emb.alias("a").crossJoin(emb.alias("b"))
      .select(
        CosineSimilarity.cosine_fast(col("a.embedding"), col("b.embedding")).as("fast"),
        cosine(col("a.embedding"), col("b.embedding")).as("slow"))
    assert(pairs.filter(abs(col("fast") - col("slow")) > 1e-9).count() == 0)
  }

  test("cosine_sim registers as a SQL function with type checking") {
    import graft.functions.CosineSimilarity
    CosineSimilarity.register(spark)
    graft.Tables.embeddings(spark, sf0001).limit(5).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) c FROM emb_v a JOIN emb_v b").count()
    assert(n == 25)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("fused qdot matches the composable integer fold on real embeddings") {
    val qv = graft.Tables.embeddings(spark, sf0001).limit(50)
      .select(quantized(col("embedding")).as("q"))
    val pairs = qv.alias("a").crossJoin(qv.alias("b"))
      .select(
        qdot(col("a.q"), col("b.q")).as("fast"),
        qdotComposable(col("a.q"), col("b.q")).as("slow"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("fused qdot edge cases: length mismatch and null element -> null") {
    val mismatch = Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
      .select(qdot(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val withNull = Seq((Array[java.lang.Long](1L, null), Array[java.lang.Long](2L, 3L)))
      .toDF("a", "b")
      .select(qdot(col("a").cast("array<bigint>"), col("b").cast("array<bigint>"))).head()
    assert(withNull.isNullAt(0))
  }

  test("as-of join: every purchase row kept; matched click is <= purchase time") {
    val out = graft.operators.AsOfQueries.asofClicks(spark, sf0001)
    val purchases = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
    assert(out.filter(col("asof_click_ts") > col("ts")).count() == 0)
  }

  test("cosine_fast edge cases: zero vector -> 0.0, length mismatch and null element -> null") {
    import graft.functions.CosineSimilarity.cosine_fast
    val zero = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(cosine_fast(col("a"), col("b"))).head()
    assert(zero.getDouble(0) == 0.0)
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(cosine_fast(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val withNull = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
      .select(cosine_fast(col("a").cast("array<float>"), col("b").cast("array<float>"))).head()
    assert(withNull.isNullAt(0))
  }

  test("hybrid RRF: both-arms doc wins, scores recompute from ranks, order holds") {
    val dir = java.nio.file.Files.createTempDirectory("hybrid").toString
    // doc 5 is the planted both-arms winner for anchor 0: a near-copy
    // of its text AND a near-copy of its vector; 6/7 are single-arm
    // similars; 8/9 unrelated filler
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "g h i j k l"), (2L, "m n o p q r"),
      (3L, "s t u v w x"), (4L, "y z aa bb cc dd"),
      (5L, "a b c d e f zz"),
      (6L, "a b c d ee ff"),
      (7L, "unrelated words entirely here now"),
      (8L, "other filler text goes here too"),
      (9L, "more filler content right here"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("lang", lit("xx"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def v(seed: Int): Array[Float] =
      Array.tabulate(8)(i => if (i == seed % 8) 1.0f else 0.05f * ((seed + i) % 3))
    val vecs = Seq(
      (0L, v(0)), (1L, v(1)), (2L, v(2)), (3L, v(3)), (4L, v(4)),
      (5L, v(0).map(_ * 0.99f)), // sem near-copy of anchor 0
      (6L, v(5)), (7L, v(0).map(x => (1.0f - x) * 0.5f)), (8L, v(6)), (9L, v(7)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = graft.operators.SimilarityQueries.hybridRank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val q0 = out.filter(_._1 == 0L).sortBy(_._6)
    // doc 5 carries rank 1 in BOTH arms -> rrf = 2/61, unbeatable
    assert(q0.head._2 == 5L && q0.head._3 == 1L && q0.head._4 == 1L)
    assert(q0.head._5 == 1.0 / 61 + 1.0 / 61)
    // every row's score recomputes exactly from its ranks; order holds
    out.foreach { case (_, _, rl, rs, rrf, _) =>
      val want = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60 + rs) else 0.0)
      assert(rrf == want)
    }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._5 >= p(1)._5))
    }
  }

  test("winnowMinima on empty input returns an empty array, not an error") {
    import graft.functions.TextFunctions
    val out = Seq(Tuple1(Array.empty[String])).toDF("hs")
      .select(TextFunctions.winnowMinima(col("hs"), 5).as("m")).head()
    assert(out.getSeq[String](0).isEmpty)
  }

  test("semDedup invariants: kept iff no dup_of, dup_of always a smaller id, both classes present") {
    val out = graft.operators.SimilarityQueries.semDedup(spark, sf0001).cache()
    assert(out.filter(col("kept") =!= col("dup_of").isNull).count() == 0)
    assert(out.filter(col("dup_of").isNotNull && col("dup_of") >= col("vec_id")).count() == 0)
    // the fixture has near-identical vectors, so the gate must
    // actually drop something — and never everything
    val dropped = out.filter(!col("kept")).count()
    assert(dropped > 0 && dropped < out.count())
    // every vector appears exactly once (partition of the corpus)
    assert(out.count() == graft.Tables.embeddings(spark, sf0001).count())
    out.unpersist()
  }

  test("semDedupIncremental invariants: batch ids only, dup_of is always a corpus id, kept iff no dup_of") {
    val out = graft.operators.SimilarityQueries.semDedupIncremental(spark, sf0001).cache()
    // output covers exactly the arriving batch
    val batchN = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 10 === 0).count()
    assert(out.count() == batchN)
    assert(out.filter(col("vec_id") % 10 =!= 0).count() == 0)
    assert(out.filter(col("kept") =!= col("dup_of").isNull).count() == 0)
    // a duplicate's survivor is always an EXISTING corpus vector,
    // never another batch member (batch x corpus, no batch self-pairs)
    assert(out.filter(col("dup_of").isNotNull && col("dup_of") % 10 === 0).count() == 0)
    out.unpersist()
  }

  test("brute-force KNN self-consistency: neighbors ranked by descending cosine") {
    val knn = graft.operators.SimilarityQueries.knnBrute(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rnk")
    val violations = knn
      .withColumn("prev", lag(col("cosine"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("cosine"))
    assert(violations.count() == 0)
  }

  test("int8 quantizer invariants: range, sign, max-component saturation") {
    import graft.functions.VectorFunctions._
    // the same code construction knnSq uses, over the fixture vectors
    val coded = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), quantized(col("embedding")).as("qv"))
      .withColumn("m", greatest(
        aggregate(col("qv"), lit(0L), (acc, x) => greatest(acc, abs(x))), lit(1L)))
      .withColumn("q8", transform(col("qv"), x =>
        when(x < 0, -floor((abs(x) * lit(254L) + col("m")) / (col("m") * 2)))
          .otherwise(floor((x * lit(254L) + col("m")) / (col("m") * 2)))
          .cast("bigint")))
    // every code in [-127, 127]
    assert(coded.filter(
      exists(col("q8"), c => abs(c) > 127)).count() == 0)
    // no component ever flips sign (small components may round to 0)
    assert(coded.filter(exists(
      arrays_zip(col("qv"), col("q8")),
      p => p.getField("qv") * p.getField("q8") < 0)).count() == 0)
    // the max-magnitude component saturates to exactly +-127 whenever
    // the vector is non-degenerate (m > 1)
    assert(coded.filter(col("m") > 1)
      .filter(!exists(col("q8"), c => abs(c) === 127)).count() == 0)
  }
}
