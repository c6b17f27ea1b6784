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
