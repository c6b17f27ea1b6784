package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import graft.Tables
import graft.pipeline.Upsert

/** Pipeline-layer capabilities of the reference exposed as named
  * queries: JSON payload parsing (the `parse_data` projections P1-P4 /
  * JSON:API flattening §1.2), list flattening (P6), and the idempotent
  * upsert sink (K1/T2) expressed through [[graft.pipeline.Upsert]].
  */
object PipelineQueries extends graft.QueryModule {

  // ===== P1-P4/E7/E12 shape: parse JSON payload column, cast, aggregate =====
  def jsonParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k_val")).as("sum_k"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))

  // ===== P6: flatten (nested list -> rows), token counting =====
  def flattenTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))

  // ===== K1/T2: idempotent upsert (db.py:51-67) as a query =====
  /** Derives an update batch from `orders` (every 100th key gets a new
    * status and a +10% price, computed in exact decimal), merges it
    * last-writer-wins on the PK via [[Upsert]], and projects the merged
    * state. Semantics mirrored: updated PKs overwrite wholesale, new
    * PKs insert (the derived batch has no new PKs — insert-new is
    * covered by the unit tests), untouched PKs pass through.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val updates = orders
      .filter(col("o_orderkey") % 100 === 0)
      .withColumn(
        "o_totalprice",
        (col("o_totalprice").cast(DecimalType(18, 2)) * lit(BigDecimal("1.1")))
          .cast("double"))
      .withColumn("o_orderstatus", lit("U"))
    Upsert(orders, updates, Seq("o_orderkey"))
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
  }

  // ===== K1 companion: SCD2 historization of a change log =====
  /** The orders table as a change log of each customer's ordering
    * state: every order versions the customer's "latest order"
    * dimension row. One window by customer; ties on the date broken
    * by o_orderkey (replay-deterministic).
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Scd2.fromChangeLog(
        Tables.orders(spark, dir)
          .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"),
        key = "o_custkey", ts = "o_orderdate", seq = "o_orderkey")
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "valid_from", "valid_to", "is_current")

  // ===== range join: no-equi-key containment via bucketization =====
  /** Shipments landing inside promotion windows: every 1000th order
    * opens a 7-day window from its order date; count the lineitems
    * whose ship date falls inside each window (windows with zero
    * shipments kept at 0). No equi key relates the two sides — the
    * bucketized [[RangeJoin]] turns the containment predicate into a
    * hash join; the DuckDB oracle runs the naive range predicate.
    */
  def rangeJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val promos = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 1000 === 0)
      .select(col("o_orderkey").as("promo_id"),
        col("o_orderdate").as("p_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("p_end"))
    val ships = Tables.lineitem(spark, dir).select(col("l_shipdate"))
    val matched = RangeJoin.pointInInterval(
        ships, "l_shipdate", promos, "p_start", "p_end", bucketSeconds = 7L * 86400)
      .groupBy(col("promo_id")).agg(count(lit(1)).as("n_shipped"))
    promos.select("promo_id")
      .join(matched, Seq("promo_id"), "left")
      .select(col("promo_id"), coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
  }

  // ===== CDC log collapse: N-version change log -> current state =====
  /** Collapse a keyed change log to its current state — the CDC-apply
    * step downstream of any log-based replication (Debezium-style
    * feeds): last writer wins per key under the total order
    * (ts, event_id), and a key whose LATEST entry is a tombstone
    * (`error` plays the delete op here) vanishes from the state.
    * Distinct from [[upsertMerge]] (two-frame merge) — this collapses
    * an N-version single-frame log with delete semantics.
    *
    * Scale: deliberately NOT a row_number window (whose per-key sort
    * materializes every version on one task before discarding all but
    * one) — the LWW pick is max(struct(ts, event_id, ...)), an
    * aggregate with map-side partial combine (struct buffers are not
    * hash-aggregable, so Spark plans partial+final SortAggregate; the
    * sort is per-partition and row-local): each partition reduces its
    * local versions to one candidate per key before the shuffle, so
    * the exchange carries keys, not log volume. The
    * tombstone filter runs post-aggregate (latest-wins must see
    * deletes). event_id is globally unique, so the struct order is
    * total and the survivor deterministic cross-engine.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame =
    cdcMergeOf(Tables.events(spark, dir))

  private[graft] def cdcMergeOf(log: DataFrame): DataFrame =
    log
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
        .as("m"))
      .filter(col("m.event_type") =!= "error")
      .select(col("user_id"),
        col("m.event_type").as("last_op"),
        col("m.value").as("last_value"),
        col("m.ts").as("last_ts"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_json_parse" -> jsonParse,
    "q_flatten" -> flattenTokens,
    "q_upsert" -> upsertMerge,
    "q_scd2" -> scd2History,
    "q_range_join" -> rangeJoinQ,
    "q_cdc_merge" -> cdcMerge
  )

  def oracles: Map[String, String] = Map(
    "q_cdc_merge" ->
      """SELECT user_id, event_type AS last_op, value AS last_value,
        |       CAST(ts AS TIMESTAMP) AS last_ts
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) t
        |WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_json_parse" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       min(CAST(ts AS TIMESTAMP)) AS min_ts,
        |       max(CAST(ts AS TIMESTAMP)) AS max_ts
        |FROM events GROUP BY event_type""".stripMargin,
    "q_flatten" ->
      """SELECT tok, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |GROUP BY tok""".stripMargin,
    "q_upsert" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY prio DESC) AS rn
        |  FROM (
        |    SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS prio FROM orders
        |    UNION ALL
        |    SELECT o_orderkey, 'U' AS o_orderstatus,
        |           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1 AS DOUBLE) AS o_totalprice,
        |           1 AS prio
        |    FROM orders WHERE o_orderkey % 100 = 0
        |  ) u
        |) m WHERE rn = 1""".stripMargin,
    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       o_orderdate AS valid_from,
        |       lead(o_orderdate) OVER w AS valid_to,
        |       lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_range_join" ->
      """SELECT o.o_orderkey AS promo_id,
        |       CAST(count(l.l_shipdate) AS BIGINT) AS n_shipped
        |FROM orders o
        |LEFT JOIN lineitem l
        |  ON l.l_shipdate >= o.o_orderdate
        | AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        |WHERE o.o_orderkey % 1000 = 0
        |GROUP BY 1""".stripMargin
  )
}
