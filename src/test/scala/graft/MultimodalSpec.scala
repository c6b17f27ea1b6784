package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata struct") {
    val media = Multimodal.mediaTable(spark, sf0001)
    assert(media.schema("payload").dataType.typeName == "binary")
    val metaFields = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.metaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == 500)
  }

  test("feature extraction decodes per partition, preserving row count") {
    val media = Multimodal.mediaTable(spark, sf0001).repartition(3)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 500)
    val r = feats.orderBy("media_id").head()
    val hist = r.getSeq[Long](1)
    assert(hist.length == Multimodal.N_BINS)
    // histogram mass equals payload length
    val len = media.orderBy("media_id").select(length(col("payload"))).head().getInt(0)
    assert(hist.sum == len)
  }

  test("decode consumes rows in fixed-size batches within each partition") {
    val media = Multimodal.mediaTable(spark, sf0001).repartition(2)
    val feats = Multimodal.extractFeaturesTagged(media, batchSize = 100)
    // 500 rows over 2 even partitions -> 250 rows each -> EXACTLY 3
    // batches per partition (a degenerate grouped(1) would give 250)
    assert(feats.select("batch_no").distinct().count() == 3)
    val maxBatchSize = feats.groupBy("batch_no").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBatchSize <= 2 * 100) // batch_no is per-partition; 2 partitions share ids
    // public schema stays logical: no physical batch artifact
    assert(!Multimodal.extractFeatures(media).columns.contains("batch_no"))
  }

  test("resize updates metadata and truncates payload") {
    val out = Multimodal.resize(Multimodal.mediaTable(spark, sf0001), 16, 16)
    val r = out.head()
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") == 16)
    assert(r.getAs[Array[Byte]]("payload").length <= 16)
  }

  test("byteGrams: byte-aligned hex windows, shift-invariant, empty under GRAM_BYTES") {
    import spark.implicits._
    val grams = Seq(("abcdefghij", 1), ("abcdefg", 2), ("Xabcdefghij", 3)).toDF("t", "id")
      .select(col("id"), Multimodal.byteGrams(col("t").cast("binary")).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    // 10 bytes -> 3 grams of GRAM_BYTES=8 bytes each, hex uppercase
    assert(grams(1) == Seq("6162636465666768", "6263646566676869", "636465666768696A"))
    assert(grams(2).isEmpty) // shorter than one gram
    // a 1-byte prefix insertion preserves every original gram
    // (shift-invariance: only grams straddling the edit change)
    assert(grams(1).toSet.subsetOf(grams(3).toSet))
  }

  test("dedupMedia finds the fixture's near-identical payloads, pairs verified at gram jaccard >= 0.7") {
    val out = graft.multimodal.MultimodalQueries.dedupMedia(spark, sf0001).cache()
    assert(out.filter(col("jaccard") < 0.7).count() == 0)
    assert(out.filter(col("media_a") >= col("media_b")).count() == 0)
    // the fixture plants near-dup documents; their payloads must pair
    assert(out.count() > 0)
    out.unpersist()
  }

  test("class-collapsed recall audit equals the member-level formulation") {
    plantedRecallCollapseCheck(sampleThresh = None)
  }

  test("lowrate (1/16) member-sampled collapse equals the member-level sampled formulation") {
    // the aggressive-rate tier's weight arithmetic — sampled member
    // counts, zero-weight class pruning, own-class decrement only when
    // the anchor itself is sampled — checked non-vacuously against the
    // member-level grid on the same planted classes (the testdata gate
    // scales leave the lowrate truth empty, so this is where the
    // sparse-sample path is actually exercised)
    plantedRecallCollapseCheck(sampleThresh =
      Some(graft.operators.DedupQueries.CORPUS_LOWRATE_THRESH))
  }

  /** Shared check: mediaRecall runs its pair arithmetic on
    * payload-identical classes with multiplicity weights (anchors x
    * distinct payloads instead of anchors x members). The reference
    * rebuilds the member-level grid from scratch — member grams,
    * anchors by the same md5 order, full anchors x members intersects
    * (the member side restricted to the deterministic sample when a
    * threshold is given), band-caught per member pair — and the
    * weighted result must match it row for row. Pins the weight
    * arithmetic (|B| minus the anchor's own class, zero-weight classes
    * dropped, same-class pairs caught by identity) against the
    * formulation the DuckDB oracle uses, independent of fixture scale.
    *
    * The corpus is the sf0001 fixture PLUS planted byte-identical
    * copies (two extra members for every media_id % 5 == 0): the raw
    * fixture's duplicate rate is too thin to guarantee the
    * multi-member weight arithmetic is exercised, and a hardcoded
    * anchor count would silently diverge from the implementation —
    * both the reference grid and the collapsed path below run on the
    * same planted frame with the shared MEDIA_ANCHORS budget.
    */
  private def plantedRecallCollapseCheck(sampleThresh: Option[String]): Unit = {
    import graft.operators.DedupQueries
    import graft.multimodal.MultimodalQueries
    val base = Multimodal.mediaTable(spark, sf0001)
    val planted = base.filter(col("media_id") % 5 === 0)
      .withColumn("k", explode(lit(Array(1, 2))))
      .withColumn("media_id", col("media_id") + col("k").cast("long") * lit(100000L))
      .drop("k")
    val media = base.unionByName(planted)
    val g = media
      .select(col("media_id").as("doc_id"),
        array_distinct(Multimodal.byteGrams(col("payload"))).as("sh_arr"))
      .filter(size(col("sh_arr")) > 0)
    val anchorIds = g.select(col("doc_id"))
      .orderBy(md5(concat(lit("anc:"), col("doc_id").cast("string"))), col("doc_id"))
      .limit(MultimodalQueries.MEDIA_ANCHORS)
    val anchors = g.join(anchorIds, Seq("doc_id"))
      .select(col("doc_id").as("doc_a"), col("sh_arr").as("__sa"))
    val corpusSide = sampleThresh.fold(g)(t =>
      g.filter(DedupQueries.corpusSampled(col("doc_id"), t)))
    val truth = broadcast(anchors)
      .crossJoin(corpusSide.select(col("doc_id").as("doc_b"), col("sh_arr").as("__sb")))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("c"))
      .filter(lit(3) * col("c") >= col("n_a") + col("n_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast((10 * c) div (n_a + n_b - c) as int)").as("bucket"))
    val bands = DedupQueries.bandKeys(DedupQueries.minhashSig(g, "doc_id"), "doc_id")
    val proposed = bands.join(anchorIds, Seq("doc_id")).alias("x")
      .join(bands.alias("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .withColumn("caught", lit(1L))
    val reference = truth.join(proposed, Seq("doc_a", "doc_b"), "left")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val (idx, repBands) = MultimodalQueries.classIndexOf(media, _.cache())
    // the planted corpus must actually exercise the collapse's weight
    // arithmetic: multi-member classes exist, and at least one ANCHOR
    // sits inside one (the |B|−1 own-class decrement path)
    assert(idx.filter(size(col("members")) >= 3).count() >= 50)
    val anchorsInMulti = idx.select(explode(col("members")).as("doc_id"), size(col("members")).as("sz"))
      .join(anchorIds, Seq("doc_id")).filter(col("sz") >= 2).count()
    assert(anchorsInMulti > 0)
    val collapsed = MultimodalQueries.mediaRecallOn(idx, repBands, sampleThresh)
      .select("bucket", "n_true", "n_caught")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    idx.unpersist(); repBands.unpersist()
    // non-vacuous even under the sparse tier: the planted classes must
    // put SOME sampled member into some anchor's truth set
    assert(reference.nonEmpty)
    assert(collapsed === reference)
  }

  test("frame sampling emits every Nth frame with sliced payload") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val frames = Multimodal.frameSample(media, everyN = 4)
    val perDoc = frames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("meta.n_frames")), "media_id")
      .withColumn("expected", ceil(col("n_frames") / 4.0))
      .filter(col("count") =!= col("expected"))
    assert(perDoc.count() == 0)
    assert(frames.filter(col("frame_no") % 4 =!= 0).count() == 0)
  }
}
