package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Second breadth wave: multidimensional aggregates (cube/pivot),
  * NULL-handling semantics, calendar functions, exact percentiles, and
  * the SQL front-end path (spark.sql over registered views) — rounding
  * out the surface a user migrating off the reference's
  * Postgres-backed queries would reach for next.
  */
object ExtendedCatalog extends graft.QueryModule {

  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // ===== CUBE (SURVEY §2.6 gap list, beyond rollup) =====
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n"), exactSum(col("c_acctbal")).as("sum_bal"))

  // ===== PIVOT: status counts per order priority =====
  /** Spark `.pivot` with explicit values (never let it scan for
    * values — that is a hidden extra job and nondeterministic column
    * order). Cells with no rows are NULL, matching the oracle's
    * `sum(CASE WHEN ... THEN 1 END)`.
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))

  // ===== UNPIVOT: wide metric columns -> long (metric, value) =====
  /** The melt inverse of [[pivotAgg]]: each lineitem row's three
    * numeric measures become three (metric, value) rows via a
    * row-local `stack` — pure map work (a Generate/explode in the
    * plan, no shuffle), the long form feature pipelines and generic
    * metric sinks consume. Values unify to double; the oracle spells
    * the same reshape as a three-way UNION ALL.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("""stack(3,
          'quantity', CAST(l_quantity AS DOUBLE),
          'extendedprice', CAST(l_extendedprice AS DOUBLE),
          'discount', CAST(l_discount AS DOUBLE)) AS (metric, value)"""))

  // ===== NULL semantics: nullif / coalesce / null-safe equality =====
  def nullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("nullif(l_returnflag, 'N')").as("rf_or_null"),
        coalesce(expr("nullif(l_returnflag, 'N')"), lit("none")).as("rf_defaulted"),
        expr("nullif(l_returnflag, 'N')").eqNullSafe(lit(null).cast("string")).as("was_n"),
        isnull(expr("nullif(l_returnflag, 'N')")).as("is_null_flag"))

  // ===== calendar functions =====
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"), // 1 = Sunday
        datediff(col("o_orderdate"), lit(java.time.LocalDate.parse("1995-01-01")))
          .as("days_since_epoch95"),
        (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("plus_week"),
        date_trunc("month", col("o_orderdate")).as("month_start"))

  // ===== exact percentiles (interpolated), per group =====
  def medianAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_total"),
        expr("percentile(o_totalprice, 0.9)").as("p90_total"),
        count(lit(1)).as("n"))

  // ===== distribution window functions =====
  /** ntile / percent_rank / cume_dist over suppliers by account
    * balance — percent_rank's (rank-1)/(n-1) and cume_dist's
    * peers/n are single divisions of exact integers, identical across
    * engines.
    */
  def windowRanksExtra(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_nationkey")).orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(spark, dir).select(
      col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  // ===== string-function battery, second wave =====
  def stringFuncs2(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      trim(col("p_name")).as("trimmed"),
      lpad(col("p_brand"), 12, "*").as("lpadded"),
      rpad(col("p_type"), 12, ".").as("rpadded"),
      regexp_replace(col("p_name"), " ", "_").as("snake"),
      translate(col("p_brand"), "#", "-").as("dashed"),
      reverse(col("p_type")).as("reversed"),
      substring_index(col("p_brand"), "#", 1).as("brand_prefix"),
      repeat(col("p_brand"), 2).as("doubled"))

  // ===== UNION (distinct) vs UNION ALL =====
  def unionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey"))
    cn.union(sn).distinct()
  }

  // ===== GROUPING SETS via the SQL front-end =====
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM v_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))""".stripMargin)
  }

  // ===== SQL front-end: same engine through spark.sql =====
  /** Revenue per nation in ASIA for one order-year, expressed as SQL
    * over registered temp views — demonstrates the `spark.sql` entry
    * point produces identical results to the DataFrame API (it is the
    * same Catalyst pipeline underneath).
    */
  def sqlRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("v_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("v_nation")
    Tables.region(spark, dir).createOrReplaceTempView("v_region")
    spark.sql(
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM v_lineitem
        |JOIN v_orders ON l_orderkey = o_orderkey
        |JOIN v_customer ON o_custkey = c_custkey
        |JOIN v_nation ON c_nationkey = n_nationkey
        |JOIN v_region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin)
  }

  /** Z-order (Morton) key over (user_id, event_id) mod 2^16 — the
    * multi-dimensional clustering key [[graft.pipeline.Bucketing
    * .writeZOrdered]] lays tables out on (StorageSpec proves the
    * two-dimensional file pruning); exposed as a query so the oracle
    * certifies the bit interleave itself. Pure shift/mask expression
    * tree, map-only; the oracle spells the same 32 terms out as
    * disjoint-bit additions.
    */
  def zorderKeyQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        graft.pipeline.Bucketing.zorderKey(
          pmod(col("user_id"), lit(65536)).cast("long"),
          pmod(col("event_id"), lit(65536)).cast("long"), 16).as("zkey"))

  /** Table profiling — the ANALYZE/data-quality shape a pipeline runs
    * before trusting a new drop: per profiled column, row count, null
    * count, distinct count, and min/max.
    *
    * Shape: one branch per column, each a TWO-PHASE HASH aggregate —
    * groupBy(value) with counts (distinct values surface as groups,
    * null included as its own group), then one tiny aggregate over the
    * value domain (n_rows = sum of counts, n_nulls = the null group's
    * count, n_distinct = non-null group count, min/max over group
    * keys). The first cut used ONE aggregation with four
    * countDistincts: Spark's multi-distinct rewrite expanded every row
    * 5x and planned THREE SortAggregates over the 3M expanded rows —
    * 10.8 s at sf0.1. The per-column branches plan as pure
    * HashAggregates (no Expand, no Sort) and the union runs the four
    * single-column scans in parallel: 0.3 s for identical output.
    * min/max render as VARCHAR only on integer and string columns so
    * the text is engine-exact (double formatting differs by engine).
    */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus")
    cols.map { c =>
      li.select(col(c).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
          min(col("v")).cast("string").as("min_val"),
          max(col("v")).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** Fixed-width histogram of a numeric column — the distribution
    * companion of [[profile]]: bin = floor(price / 500), one hash
    * aggregate on the bin key. floor of an IEEE double division is
    * bit-identical across engines, so the bin assignment (and hence
    * the hash) is exact.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(floor(col("l_extendedprice") / lit(500.0)).as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", (col("bin") * lit(500.0)).cast("double"))
      .select("bin", "bin_lo", "n")

  /** Per-group mode (argmax): each language's most frequent source,
    * deterministic tie policy (greatest count, then smallest source) —
    * engines disagree on native mode()'s tie pick, so the rank
    * spelling IS the contract. Two hash aggregates + a rank window on
    * the (lang, source) count grid (bounded domain), never on rows.
    */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_docs").desc, col("source"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("lang"), col("source").as("top_source"), col("n_docs"))
  }

  /** Salted skew join, oracle-checked end-to-end: lineitem joined to
    * orders through `Salting.saltedJoin` (probe rows salt by a stable
    * hash of l_linenumber, the build side fans out to every salt) and
    * aggregated per priority. The oracle is the PLAIN join + the same
    * aggregate — the hash match certifies the salting rewrite is
    * lossless on real data, complementing SaltingSpec's plan pin and
    * `Dev saltbench`'s 30x timing evidence. Buckets = 8 keeps the
    * build fanout at 8x150k rows at sf0.1 — the fanout is the price of
    * spreading a hot key, paid on the SMALL side by design.
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.pipeline.Salting
      .saltedJoin(li, ord, "l_orderkey", buckets = 8, tiebreak = "l_linenumber")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("sum_qty"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profile,
    "q_histogram" -> histogram,
    "q_mode" -> modePerGroup,
    "q_skew_join" -> skewJoin,
    "q_zorder" -> zorderKeyQuery,
    "q_cube" -> cubeAgg,
    "q_pivot" -> pivotAgg,
    "q_unpivot" -> unpivotMetrics,
    "q_null_handling" -> nullHandling,
    "q_date_funcs" -> dateFuncs,
    "q_median" -> medianAgg,
    "q_window_ranks_extra" -> windowRanksExtra,
    "q_string_funcs2" -> stringFuncs2,
    "q_union_distinct" -> unionDistinct,
    "q_grouping_sets" -> groupingSets,
    "q_sql_revenue" -> sqlRevenue
  )

  private lazy val zorderOracleTerms: String =
    (0 until 16).flatMap(i => Seq(
      s"((((user_id % 65536) >> $i) & 1) << ${2 * i})",
      s"((((event_id % 65536) >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  def oracles: Map[String, String] = Map(
    "q_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 500.0) AS BIGINT) AS bin,
        |       CAST(floor(l_extendedprice / 500.0) AS BIGINT) * 500.0 AS bin_lo,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // plain join + same aggregate: the hash match certifies the
    // salted rewrite lossless
    "q_skew_join" ->
      """SELECT o.o_orderpriority, count(*) AS n,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin,
    "q_mode" ->
      """SELECT lang, source AS top_source, n_docs FROM (
        |  SELECT lang, source, count(*) AS n_docs,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY count(*) DESC, source) AS rn
        |  FROM documents GROUP BY lang, source
        |) t WHERE rn = 1""".stripMargin,
    "q_profile" ->
      """WITH w AS (
        |  SELECT count(*) AS n_rows,
        |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ok_nulls,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ok_distinct,
        |         CAST(min(l_orderkey) AS VARCHAR) AS ok_min, CAST(max(l_orderkey) AS VARCHAR) AS ok_max,
        |         CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS sk_nulls,
        |         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS sk_distinct,
        |         CAST(min(l_suppkey) AS VARCHAR) AS sk_min, CAST(max(l_suppkey) AS VARCHAR) AS sk_max,
        |         CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS rf_nulls,
        |         CAST(count(DISTINCT l_returnflag) AS BIGINT) AS rf_distinct,
        |         min(l_returnflag) AS rf_min, max(l_returnflag) AS rf_max,
        |         CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ls_nulls,
        |         CAST(count(DISTINCT l_linestatus) AS BIGINT) AS ls_distinct,
        |         min(l_linestatus) AS ls_min, max(l_linestatus) AS ls_max
        |  FROM lineitem
        |)
        |SELECT 'l_orderkey' AS col_name, n_rows, ok_nulls AS n_nulls,
        |       ok_distinct AS n_distinct, ok_min AS min_val, ok_max AS max_val FROM w
        |UNION ALL SELECT 'l_suppkey', n_rows, sk_nulls, sk_distinct, sk_min, sk_max FROM w
        |UNION ALL SELECT 'l_returnflag', n_rows, rf_nulls, rf_distinct, rf_min, rf_max FROM w
        |UNION ALL SELECT 'l_linestatus', n_rows, ls_nulls, ls_distinct, ls_min, ls_max FROM w""".stripMargin,
    "q_zorder" ->
      s"""SELECT event_id, user_id,
        |       CAST($zorderOracleTerms AS BIGINT) AS zkey
        |FROM events""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |       trim(p_name) AS trimmed,
        |       lpad(p_brand, 12, '*') AS lpadded,
        |       rpad(p_type, 12, '.') AS rpadded,
        |       regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |       translate(p_brand, '#', '-') AS dashed,
        |       reverse(p_type) AS reversed,
        |       split_part(p_brand, '#', 1) AS brand_prefix,
        |       repeat(p_brand, 2) AS doubled
        |FROM part""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))""".stripMargin,
    "q_window_ranks_extra" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |       CAST(NTILE(4) OVER w AS INT) AS quartile,
        |       PERCENT_RANK() OVER w AS pct_rank,
        |       CUME_DIST() OVER w AS cume
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)""".stripMargin,
    "q_cube" ->
      """SELECT c_mktsegment, n_name, count(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
        |       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'extendedprice',
        |       CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount',
        |       CAST(l_discount AS DOUBLE) FROM lineitem""".stripMargin,
    "q_null_handling" ->
      """SELECT l_orderkey, l_linenumber,
        |       nullif(l_returnflag, 'N') AS rf_or_null,
        |       coalesce(nullif(l_returnflag, 'N'), 'none') AS rf_defaulted,
        |       nullif(l_returnflag, 'N') IS NOT DISTINCT FROM NULL AS was_n,
        |       nullif(l_returnflag, 'N') IS NULL AS is_null_flag
        |FROM lineitem""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, o_orderdate,
        |       CAST(extract(year FROM o_orderdate) AS INT) AS y,
        |       CAST(extract(month FROM o_orderdate) AS INT) AS m,
        |       CAST(extract(day FROM o_orderdate) AS INT) AS d,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch95,
        |       o_orderdate + INTERVAL 7 DAY AS plus_week,
        |       date_trunc('month', o_orderdate) AS month_start
        |FROM orders""".stripMargin,
    "q_median" ->
      """SELECT o_orderstatus,
        |       quantile_cont(o_totalprice, 0.5) AS median_total,
        |       quantile_cont(o_totalprice, 0.9) AS p90_total,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_sql_revenue" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin
  )
}
