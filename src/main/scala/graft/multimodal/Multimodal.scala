package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column support: media as opaque `binary` payloads with a
  * typed metadata struct, plus the decode / feature-extract / resize /
  * frame-sample plumbing an image/audio pipeline needs.
  *
  * The actual codec is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic "features" from the
  * raw bytes. Everything around the stub — schema, binary handling,
  * partition-preserving mapPartitions with an explicit output encoder,
  * batched iteration — is the real Spark shape a production decoder
  * drops into (in PySpark this is mapInPandas; the JVM-native
  * equivalent is mapPartitions over batched rows).
  *
  * Scale: decode is embarrassingly parallel per partition; metadata
  * lives in a struct column so pruning can skip payload bytes when a
  * query touches only metadata (columnar parquet stores them
  * separately).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_frames", IntegerType)))

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes
    * (deterministic stand-in for encoded media), metadata derived from
    * document stats.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        col("n_chars").cast(IntegerType).as("width"),
        lit(1).as("height"),
        lit("txt").as("format"),
        size(split(col("text"), " ")).as("n_frames")).as("meta"))

  val N_BINS = 16

  /** STUB decoder: byte histogram over `payload % 16`. A real decoder
    * (JPEG -> pixels, PCM -> spectrogram) replaces only this function;
    * the mapPartitions harness around it stays.
    */
  def decodeStub(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](N_BINS)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % N_BINS) += 1
      i += 1
    }
    hist
  }

  val DECODE_BATCH = 64

  /** Feature extraction over the media table: partition-parallel decode
    * with an explicit row encoder — the JVM analog of a mapInPandas
    * UDF including its BATCH shape: rows are consumed in fixed-size
    * groups so a real codec initializes once per batch (per arrow
    * batch in the Pandas case), not once per row.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = DECODE_BATCH): DataFrame =
    extractFeaturesTagged(media, batchSize).drop("batch_no")

  /** Test/diagnostic variant exposing the per-partition batch index —
    * batch_no is a physical artifact (changes with partitioning), so
    * the public [[extractFeatures]] schema stays logical.
    */
  private[graft] def extractFeaturesTagged(media: DataFrame, batchSize: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(LongType, containsNull = false)),
      StructField("batch_no", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.grouped(batchSize).zipWithIndex.flatMap { case (batch, batchNo) =>
        // a real decoder would set up its codec context HERE, once per batch
        batch.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1)).toSeq, batchNo)
        }
      }
    }(enc)
  }

  /** STUB resize: updates metadata and truncates the payload
    * proportionally (a real implementation re-encodes pixels).
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame =
    media
      .withColumn("payload", expr(s"substring(payload, 1, $width)"))
      .withColumn("meta", struct(
        lit(width).as("width"), lit(height).as("height"),
        col("meta.format").as("format"), col("meta.n_frames").as("n_frames")))

  /** Frame sampling: one output row per kept frame (every `everyN`-th),
    * payload sliced per frame — the explode shape a video pipeline uses.
    */
  def frameSample(media: DataFrame, everyN: Int): DataFrame =
    media
      .select(col("media_id"), col("payload"), col("meta"),
        explode(expr(s"sequence(0, meta.n_frames - 1, $everyN)")).as("frame_no"))
      .withColumn("frame_payload",
        expr("substring(payload, frame_no * greatest(1, length(payload) div meta.n_frames) + 1, " +
          "greatest(1, length(payload) div meta.n_frames))"))
      .select("media_id", "frame_no", "frame_payload", "meta")
}

/** Driver-checked query surface for the multimodal plumbing: the
  * feature histogram is SQL-expressible on the text stand-in, so the
  * mapPartitions decode path gets a DuckDB oracle.
  */
object MultimodalQueries extends graft.QueryModule {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
    val cols = (0 until Multimodal.N_BINS).map(i => col("features").getItem(i).as(s"f$i"))
    feats.select(col("media_id") +: cols: _*)
  }

  /** Frame-sampling geometry check: every 4th frame's (frame_no,
    * byte length). The oracle recomputes the slice arithmetic
    * (offset, width, end-truncation) from octet lengths — certifying
    * the explode+substring geometry; q_media_features separately
    * certifies byte-level handling.
    */
  def frameSampleQ(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.mediaTable(spark, dir), 4)
      .select(col("media_id"), col("frame_no").cast("int").as("frame_no"),
        length(col("frame_payload")).cast("long").as("frame_len"))

  /** Resize-then-decode: the truncated payload's byte histogram,
    * byte-exact against the oracle's first-32-bytes low-nibble
    * recount — certifies resize's payload truncation feeds the decode
    * path correctly.
    */
  def resizeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val resized = Multimodal.resize(Multimodal.mediaTable(spark, dir), RESIZE_W, 1)
    val feats = Multimodal.extractFeatures(resized)
    val cols = (0 until Multimodal.N_BINS).map(i => col("features").getItem(i).as(s"f$i"))
    feats.select(col("media_id") +: cols: _*)
  }

  private val RESIZE_W = 32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> mediaFeatures,
    "q_frame_sample" -> frameSampleQ,
    "q_resize_features" -> resizeFeatures
  )

  /** Shared low-nibble histogram oracle: recount payload bytes from
    * hex(encode(text)), optionally capped at the first `byteCap`
    * bytes (the resize case). ONE definition so the nibble-decoding
    * scheme can never diverge between the full and resized variants.
    */
  private def nibbleHistOracle(byteCap: Option[Int]): String = {
    require(Multimodal.N_BINS == 16,
      "low-nibble oracle encoding requires exactly 16 bins")
    val outer = (0 until Multimodal.N_BINS)
      .map(i => s"CAST(coalesce(t.f$i, 0) AS BIGINT) AS f$i")
      .mkString(",\n        ")
    val inner = (0 until Multimodal.N_BINS)
      .map(i => s"sum(CASE WHEN b = $i THEN 1 ELSE 0 END) AS f$i")
      .mkString(",\n          ")
    val bytes = byteCap.fold("octet_length(encode(text))")(
      cap => s"LEAST(octet_length(encode(text)), $cap)")
    s"""SELECT d.doc_id AS media_id,
      |        $outer
      |FROM documents d
      |LEFT JOIN (
      |  SELECT doc_id,
      |          $inner
      |  FROM (
      |    SELECT doc_id,
      |           strpos('0123456789ABCDEF', substring(hex(encode(text)), 2*i, 1)) - 1 AS b
      |    FROM documents,
      |         LATERAL (SELECT unnest(range(1, $bytes + 1)) AS i) g
      |  ) raw GROUP BY doc_id
      |) t ON d.doc_id = t.doc_id""".stripMargin
  }

  // BYTE-exact oracle: the Spark side histograms UTF-8 payload bytes,
  // so the oracle must too. `hex(encode(text))` yields two hex chars
  // per byte, and because N_BINS = 16, `byte % 16` IS the low nibble —
  // decoded via strpos into '0123456789ABCDEF'. The LEFT JOIN +
  // coalesce keeps empty-text docs as all-zero rows (the Spark side
  // emits a row per doc unconditionally). This stays correct for
  // non-ASCII and empty text, unlike a per-character ord() histogram.
  def oracles: Map[String, String] = Map(
    // slice geometry: flen = max(1, plen div n_frames); a frame's
    // byte length is flen truncated by what remains past its offset.
    // split('') yields [''] in BOTH engines, so n_frames >= 1 always
    // and the div is safe; empty payloads produce frame 0 with len 0.
    "q_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         octet_length(encode(text)) AS plen,
        |         len(string_split(text, ' ')) AS n_frames
        |  FROM documents
        |), f AS (
        |  SELECT media_id, plen, n_frames,
        |         unnest(range(0, n_frames, 4)) AS frame_no
        |  FROM m
        |)
        |SELECT media_id, CAST(frame_no AS INT) AS frame_no,
        |       CAST(LEAST(GREATEST(1, plen // n_frames),
        |                  GREATEST(plen - frame_no * GREATEST(1, plen // n_frames), 0))
        |            AS BIGINT) AS frame_len
        |FROM f""".stripMargin,
    "q_resize_features" -> nibbleHistOracle(Some(RESIZE_W)),
    "q_media_features" -> nibbleHistOracle(None)
  )
}
