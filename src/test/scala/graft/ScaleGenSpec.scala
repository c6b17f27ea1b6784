package graft

import org.apache.spark.sql.functions._

/** Invariants of the [[ScaleGen]] scale-up generator, pinned at
  * sf0.001 × 3 (tiny, fast): these are the properties the sf1 scaling
  * certification depends on — if any breaks, the certified exponents
  * measure an artifact, not the engine.
  */
class ScaleGenSpec extends SparkSpec {

  private val factor = 3
  private lazy val t = ScaleGen.scaled(spark, sf0001, factor)
  private def src(name: String) = Tables.read(spark, sf0001, name)

  test("fact tables scale by the factor; dims stay fixed") {
    for (name <- Seq("customer", "supplier", "part", "orders", "lineitem",
                     "events", "documents", "embeddings"))
      assert(t(name).count() === src(name).count() * factor, name)
    for (name <- Seq("region", "nation"))
      assert(t(name).count() === src(name).count(), name)
  }

  test("PKs stay unique and FK integrity holds in every copy") {
    assert(t("orders").select("o_orderkey").distinct.count() === t("orders").count())
    assert(t("documents").select("doc_id").distinct.count() === t("documents").count())
    val orphans = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    assert(orphans === 0L)
    val custOrphans = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(custOrphans === 0L)
  }

  test("per-key cardinality profile is preserved (orders per customer)") {
    def profile(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_custkey").count()
        .groupBy("count").agg(count("*").as("n_cust"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = profile(src("orders"))
    val scaledProf = profile(t("orders"))
    assert(scaledProf === base.map { case (k, v) => k -> v * factor })
  }

  test("document dup structure is isomorphic per copy, not shared across copies") {
    // the substitution is a bijection on strings: the multiset of
    // exact-dup group sizes must replicate exactly `factor` times
    def groupSizes(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().groupBy("count").agg(count("*").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = groupSizes(src("documents"))
    val scaledG = groupSizes(t("documents"))
    assert(scaledG === base.map { case (k, v) => k -> v * factor })
    // lengths are preserved (n_chars column stays truthful)
    val badLen = t("documents").where(length(col("text")) =!= col("n_chars")).count()
    val badLenSrc = src("documents").where(length(col("text")) =!= col("n_chars")).count()
    assert(badLen === badLenSrc * factor)
  }

  test("cross-copy decorrelation survives factor > 26 (no alphabet wraparound)") {
    // The caesar rotation this generator previously used wraps at 26:
    // copies c and c+26 carried IDENTICAL text, merging exact-dup
    // groups across copies and superlinearly densifying the duplicate
    // structure the scaling certification measures (the r15 sf10 leg
    // read 320x pair growth at x10 data from exactly this). The keyed
    // substitution must keep the group-size multiset an exact xfactor
    // replica at a factor the rotation could not survive.
    val f = 30
    def groupSizes(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").count().groupBy("count").agg(count("*").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = groupSizes(src("documents"))
    val big = groupSizes(ScaleGen.scaled(spark, sf0001, f)("documents"))
    assert(big === base.map { case (k, v) => k -> v * f })
    // every copy's permutation is distinct, and distinct from identity
    val perms = (1 until f).map(ScaleGen.permFor)
    assert((perms :+ "abcdefghijklmnopqrstuvwxyz").distinct.size === f)
    // each is a true permutation of the alphabet
    assert(perms.forall(_.sorted == "abcdefghijklmnopqrstuvwxyz"))
  }

  test("embedding copies preserve intra-copy inner products exactly") {
    val n = src("embeddings").count()
    // dot(v_i, v_j) within copy 1 must equal copy 0 bit-for-bit:
    // the sign mask is an orthogonal ±1 transform and ±1·x is exact
    val e = t("embeddings").select(col("vec_id"), col("embedding"))
    def dots(offsetIds: Long) = e
      .where(col("vec_id").isin(offsetIds, offsetIds + 1, offsetIds + 2))
      .withColumn("k", col("vec_id") - lit(offsetIds))
      .alias("a")
      .join(e.where(col("vec_id").isin(offsetIds, offsetIds + 1, offsetIds + 2))
        .withColumn("k", col("vec_id") - lit(offsetIds)).alias("b"),
        col("a.k") < col("b.k"))
      .select(col("a.k"), col("b.k"),
        aggregate(zip_with(col("a.embedding"), col("b.embedding"), (x, y) => x * y),
          lit(0f), (acc, z) => acc + z).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getFloat(2)).toMap
    assert(dots(n) === dots(0L))
    // ...while the copy-1 vectors themselves differ from copy 0
    val same = e.where(col("vec_id") < 3).alias("a")
      .join(e.where(col("vec_id") >= n && col("vec_id") < n + 3).alias("b"),
        col("a.vec_id") + lit(n) === col("b.vec_id"))
      .where(col("a.embedding") === col("b.embedding")).count()
    assert(same === 0L)
  }

  test("sign mask is identity for copy 0 and mixes signs for others") {
    assert(ScaleGen.signMask(0, 64).forall(_ == 1f))
    val m = ScaleGen.signMask(1, 64)
    assert(m.exists(_ == -1f) && m.exists(_ == 1f))
    // distinct copies get distinct masks (no accidental cross-copy
    // correlation of the planted transform)
    assert(ScaleGen.signMask(1, 64).toSeq !== ScaleGen.signMask(2, 64).toSeq)
  }

  test("sign masks keyed by the full copy index: no wraparound at factor > 26") {
    // The Knuth-hash mask this replaces folded only c % 26: mask(26)
    // reproduced mask(0) (the identity — copy 26's embeddings came out
    // byte-identical to the ORIGINALS) and generally mask(c) == mask(c+26),
    // planting cross-copy exact-dup embedding cliques at factor > 26 —
    // the embeddings-table twin of the text wraparound control above.
    assert(ScaleGen.signMask(26, 64).exists(_ == -1f)) // not the identity
    for (c <- 1 to 8)
      assert(ScaleGen.signMask(c, 64).toSeq !== ScaleGen.signMask(c + 26, 64).toSeq, s"c=$c")
    // a factor-60 run's masks are pairwise distinct (incl. identity)
    val masks = (0 until 60).map(c => ScaleGen.signMask(c, 64).toSeq)
    assert(masks.distinct.size === 60)
  }
}
