package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entity model + JSON:API payload parsing — the reference's
  * `parse_data` surface (P1-P4, `/root/reference/db.py:79-158`) and the
  * `{"data": [...], "meta": {"page": ...}}` envelope flattening
  * (`wdn_api.py:120-127`, SURVEY §1.2).
  *
  * Types follow FIXTURES.md §B: integer ids cast from strings
  * (db.py:81,103-104), prices as DecimalType(18,2) via exact decimal
  * parse (db.py:106-108 uses Python Decimal — never double), string PK
  * for offers (db.py:90), ingest-time `updated_at` stamped from an
  * injectable clock column (db.py:84 uses wall-clock now(); tests
  * inject a fixed literal for determinism — SURVEY §7.4).
  */
object Parse {

  // ===== entity case classes (FIXTURES.md §B) =====
  case class Brand(id: Int, name: String, description: String, website: String,
      updated_at: java.sql.Timestamp)
  case class Product(id: Int, brand_id: Int, name: String, description: String,
      release_at: java.sql.Timestamp, brand_names: String, updated_at: java.sql.Timestamp)
  case class Offer(id: String, product_id: Int, retailer_id: Int,
      original_currency: String, price_usd: java.math.BigDecimal,
      price_gbp: java.math.BigDecimal, price_eur: java.math.BigDecimal,
      updated_at: java.sql.Timestamp)
  case class Retailer(id: Int, name: String, website: String,
      updated_at: java.sql.Timestamp)

  /** JSON:API envelope: data records are kept as raw JSON strings at
    * this level (attributes differ per entity); meta carries
    * pagination.
    */
  def envelopeSchema(attributes: StructType): StructType = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("attributes", attributes))))),
    StructField("meta", StructType(Seq(
      StructField("page", StructType(Seq(
        StructField("total_count", LongType),
        StructField("current_page", LongType)))))))))

  /** Flatten `{"data": [{"id", "attributes": {...}}]}` into one row per
    * record with id + attribute columns (the single un-nesting level
    * every parse_data performs, db.py:83).
    */
  def flattenEnvelope(raw: DataFrame, jsonCol: String, attributes: StructType): DataFrame =
    raw
      .withColumn("__env", from_json(col(jsonCol), envelopeSchema(attributes)))
      .select(explode(col("__env.data")).as("__rec"))
      .select(col("__rec.id").as("id"), col("__rec.attributes.*"))

  val brandAttrs: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("website", StringType)))

  val productAttrs: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("release_at", StringType),
    StructField("brand_names", StringType)))

  val offerAttrs: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("retailer_id", StringType),
    StructField("original_currency", StringType),
    StructField("price_usd", StringType),
    StructField("price_gbp", StringType),
    StructField("price_eur", StringType)))

  val retailerAttrs: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("website", StringType)))

  /** Retailer.parse_data (db.py:79-85): int id, flatten, stamp. */
  def parseRetailers(raw: DataFrame, jsonCol: String,
      clock: Column = current_timestamp()): DataFrame =
    flattenEnvelope(raw, jsonCol, retailerAttrs)
      .select(
        col("id").cast(IntegerType).as("id"),
        col("name"), col("website"),
        clock.as("updated_at"))

  /** Brand.parse_data (db.py:123-133). */
  def parseBrands(raw: DataFrame, jsonCol: String,
      clock: Column = current_timestamp()): DataFrame =
    flattenEnvelope(raw, jsonCol, brandAttrs)
      .select(
        col("id").cast(IntegerType).as("id"),
        col("name"), col("description"), col("website"),
        clock.as("updated_at"))

  /** Product.parse_data (db.py:146-158) + the constant-FK enrichment of
    * products_add_brand_id (wdn_api.py:32-36, P5): the API payload
    * lacks brand_id, the pipeline injects it.
    */
  def parseProducts(raw: DataFrame, jsonCol: String, brandId: Int,
      clock: Column = current_timestamp()): DataFrame =
    flattenEnvelope(raw, jsonCol, productAttrs)
      .select(
        col("id").cast(IntegerType).as("id"),
        lit(brandId).as("brand_id"),
        col("name"), col("description"),
        col("release_at").cast(TimestampType).as("release_at"),
        col("brand_names"),
        clock.as("updated_at"))

  /** Offer.parse_data (db.py:99-112): STRING id kept (db.py:90), int
    * FKs, exact DecimalType(18,2) prices (db.py:106-108).
    */
  def parseOffers(raw: DataFrame, jsonCol: String,
      clock: Column = current_timestamp()): DataFrame =
    flattenEnvelope(raw, jsonCol, offerAttrs)
      .select(
        col("id"),
        col("product_id").cast(IntegerType).as("product_id"),
        col("retailer_id").cast(IntegerType).as("retailer_id"),
        col("original_currency"),
        col("price_usd").cast(DecimalType(18, 2)).as("price_usd"),
        col("price_gbp").cast(DecimalType(18, 2)).as("price_gbp"),
        col("price_eur").cast(DecimalType(18, 2)).as("price_eur"),
        clock.as("updated_at"))
}
