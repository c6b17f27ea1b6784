package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import graft.Tables
import graft.pipeline.IncrementalFilter

/** Breadth catalog: one named query per operator row of SURVEY.md §2,
  * recast onto the fixture star schema. Each query has a DuckDB oracle
  * with identical column names/types.
  *
  * Numeric-determinism conventions (SURVEY §7.4):
  *  - sums/averages of double columns go through DECIMAL(18,2) so the
  *    aggregate is exact and order-insensitive, then a single cast to
  *    double — bit-identical across engines;
  *  - min/max/lag/lead/passthrough of doubles are exact comparisons or
  *    moves, no determinism hazard;
  *  - derived prices multiply in decimal, never in double.
  */
object OperatorCatalog extends graft.QueryModule {

  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  private def exactAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** Driver-side recency cutoff, the shape of `etl.py:26-27` (cutoff is
    * computed once at run start, then used as a literal so the scan can
    * push the predicate into parquet). The max-lookup is a tiny
    * aggregate job, not a collect of data rows.
    */
  private def cutoffLit(df: DataFrame, tsCol: String, days: Int): Column = {
    // The fixture date columns are TimestampNTZ (parquet
    // isAdjustedToUTC=false), so the max arrives as LocalDateTime; naive
    // minusDays matches DuckDB's `ts - INTERVAL n DAY` exactly and is
    // independent of the JVM/session timezone.
    val maxTs = df.agg(max(col(tsCol))).head().getAs[java.time.LocalDateTime](0)
    // empty table -> max is null -> null cutoff; the comparison is then
    // NULL and filters everything, exactly like the oracle's scalar
    // subquery over an empty table (a raw .minusDays would NPE)
    if (maxTs == null) lit(null).cast("timestamp_ntz")
    else lit(maxTs.minusDays(days.toLong))
  }

  // ===== F1: timestamp-range filter (etl.py:15) =====
  def filterRange(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    orders
      .filter(col("o_orderdate") > cutoffLit(orders, "o_orderdate", 90))
      .select("o_orderkey", "o_orderdate", "o_totalprice")
  }

  // ===== F3/F7/S4/O3: case-insensitive exact lookup + first() =====
  def ciLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .filter(lower(col("s_name")) === "supplier#000000007")
      .select("s_suppkey", "s_name", "s_acctbal")
      .limit(1)

  // ===== F4/F6: membership predicate (etl.py:51) =====
  def isinFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey").isin(1, 3, 5, 7))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), exactSum(col("l_quantity")).as("sum_qty"))

  // ===== F8/E5: regex alternation filter (sql.py:20) =====
  def rlikeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(lower(col("p_type")).rlike("(economy|promo)"))
      .select("p_partkey", "p_brand", "p_type")

  // ===== F9/A1: post-aggregation filter on derived column =====
  /** Brands whose average retail price beats the global average — the
    * threshold is data-relative so the filter stays non-trivial at
    * every scale factor. Both engines derive the global average with
    * the same exact-decimal arithmetic, so the comparison literal is
    * bit-identical.
    */
  def havingFilter(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val globalAvg = part.agg(exactAvg(col("p_retailprice"))).head().getDouble(0)
    part
      .groupBy(col("p_brand"))
      .agg(exactAvg(col("p_retailprice")).as("avg_retail"))
      .filter(col("avg_retail") > globalAvg)
  }

  // ===== F2/J3/T1/E4/O5: incremental recency anti-join (etl.py:14-20) =====
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val recentNames = orders
      .filter(col("o_orderdate") > cutoffLit(orders, "o_orderdate", 365))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select("c_name")
    IncrementalFilter(
      customer.select("c_custkey", "c_name"), recentNames,
      candidateKey = "c_name", recentKey = "c_name", caseInsensitive = true)
  }

  // ===== J4: left-semi join (etl.py:45,51 read-back shape) =====
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)
    part
      .join(li, part("p_partkey") === li("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
  }

  // ===== full outer join: two-sided reconciliation =====
  /** FULL OUTER reconciliation of two per-user aggregates with
    * deliberately asymmetric membership (high-value clicks vs
    * high-value purchases): users on either side only surface with
    * NULL-coalesced counts — the missing join type in the family
    * (inner/semi/anti/asof/range are covered elsewhere). Plain
    * shuffled hash join on user_id; outer joins can't broadcast the
    * preserved side, so this is the partition-aligned shape at scale.
    */
  def fullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def side(t: String): DataFrame = ev
      .filter(col("event_type") === t && col("value") > 150.0)
      .groupBy(col("user_id")).agg(count(lit(1)).as(s"n_$t"),
        exactSum(col("value")).as(s"sum_$t"))
    side("click").as("c")
      .join(side("purchase").as("p"),
        col("c.user_id") === col("p.user_id"), "full_outer")
      .select(
        coalesce(col("c.user_id"), col("p.user_id")).as("user_id"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
        col("sum_click"), col("sum_purchase"))
  }

  // ===== J1/J2/S6: multi-table star join with exact revenue =====
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val revenue = sum(
      col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(4, 2))))
      .cast("double")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
  }

  // ===== A1/A2 + gap aggregates: multi-aggregate group-by =====
  def groupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactAvg(col("l_extendedprice")).as("avg_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  // ===== A3/O6: distinct =====
  def distinctKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select("l_suppkey").distinct()

  // ===== W1/O2: ranking windows (sql.py:8) =====
  def rankWindow(spark: SparkSession, dir: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
    val total = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        rank().over(byBal).as("rk"),
        dense_rank().over(byBal).as("drk"),
        row_number().over(total).as("rn"))
  }

  // ===== parity-plus analytics: lag/lead/running sum =====
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_total"),
        lead(col("o_totalprice"), 1).over(w).as("next_total"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
  }

  // ===== O1/O3: global top-k (TakeOrderedAndProject) =====
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ===== O5: set difference (etl.py:20) =====
  def exceptPairs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val before = li.filter(col("l_shipdate") < lit(java.time.LocalDateTime.parse("1998-01-01T00:00")))
      .select("l_suppkey", "l_partkey")
    val after = li.filter(col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1998-01-01T00:00")))
      .select("l_suppkey", "l_partkey")
    before.except(after)
  }

  // ===== parity-plus set op: intersect =====
  def intersectPairs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val before = li.filter(col("l_shipdate") < lit(java.time.LocalDateTime.parse("1998-01-01T00:00")))
      .select("l_suppkey", "l_partkey")
    val after = li.filter(col("l_shipdate") >= lit(java.time.LocalDateTime.parse("1998-01-01T00:00")))
      .select("l_suppkey", "l_partkey")
    before.intersect(after)
  }

  // ===== bag union (wdn_api.py:123 accumulation ≅ unionByName) =====
  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(lit("customer").as("src"), col("c_acctbal").as("acctbal"))
    val supp = Tables.supplier(spark, dir)
      .select(lit("supplier").as("src"), col("s_acctbal").as("acctbal"))
    cust.unionByName(supp)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), exactSum(col("acctbal")).as("sum_bal"))
  }

  // ===== E2: CASE bucketing (sql.py:14-16) =====
  def caseBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .withColumn(
        "size_bucket",
        when(col("p_size") < 10, "small")
          .when(col("p_size").between(10, 30), "medium")
          .otherwise("large"))
      .groupBy(col("size_bucket"))
      .agg(count(lit(1)).as("n"), exactAvg(col("p_retailprice")).as("avg_retail"))

  // ===== E1/E3/E7/E8/E11: scalar function battery =====
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      lower(col("p_name")).as("lname"),
      upper(col("p_brand")).as("ubrand"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 4).as("type_prefix"),
      concat(col("p_brand"), lit("/"), col("p_type")).as("full_type"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).cast(IntegerType).as("brand_num"),
      round(col("p_retailprice").cast(DecimalType(18, 2)), 1).cast("double").as("price_r1"))

  // ===== E10: interval arithmetic + date_trunc (etl.py:26-27) =====
  def intervalArith(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("ts"),
        (col("ts") - expr("INTERVAL 1 DAY")).as("ts_minus_1d"),
        date_trunc("hour", col("ts")).as("ts_hour"))

  // ===== gap item: ROLLUP (SURVEY §2.6 "not present" list) =====
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal")).as("sum_bal"))

  // ===== gap item: HLL approximate distinct (SURVEY §2.6) =====
  /** HyperLogLog sketches differ across engines by design, so the raw
    * estimate can't be hash-compared. Instead the output carries the
    * exact count plus `within_5pct` — whether the HLL estimate (rsd
    * 0.02) landed within 5% of exact — and the oracle asserts TRUE
    * with DuckDB's exact COUNT(DISTINCT). A hash match therefore
    * CERTIFIES the estimator's error bound, not just a row count; if
    * the estimate ever drifts past 5%, the driver flags the query.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_orders"), col("n"),
        (abs(col("approx_orders") - col("exact_orders")).cast("double")
          <= lit(0.05) * col("exact_orders").cast("double")).as("within_5pct"))

  // ===== companion: approximate quantile with a certified rank bound =====
  /** `approx_percentile` (GK/KLL-style sketch) also differs across
    * engines, so the same certification pattern as [[approxDistinct]]
    * applies: the sketch (accuracy 100 ⇒ rank error ≤ 1% of n)
    * returns an actual element of the group; the query then counts
    * how many values fall at or below it and asserts the element's
    * rank lands in [0.49n, 0.51n] — as integer inequalities, so the
    * boundary decision is engine-exact. The oracle asserts TRUE plus
    * the exact interpolated median; a hash match certifies the
    * sketch's rank-error contract on this data.
    *
    * Spark-version sensitivity: the oracle hard-codes
    * `TRUE AS within_rank_bound`, so this query is coupled to the
    * approx_percentile sketch honoring its 1% rank bound (accuracy
    * 100) on the fixture data. If a Spark upgrade changes the sketch
    * internals enough to break the bound here, the verify gate fails
    * WITHOUT a real engine bug — check this literal first when
    * diagnosing a post-upgrade q_approx_quantile mismatch (same
    * accepted pattern as q_approx_distinct's within_5pct).
    */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_returnflag", "l_extendedprice")
    val sk = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 100)").as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        count(lit(1)).as("n"))
    li.join(sk, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("exact_p50")).as("exact_p50"),
        max(col("n")).as("n"),
        sum(when(col("l_extendedprice") <= col("ap"), 1L).otherwise(0L)).as("cnt_le"),
        sum(when(col("l_extendedprice") < col("ap"), 1L).otherwise(0L)).as("cnt_lt"))
      .select(
        col("l_returnflag"), col("exact_p50"), col("n"),
        (col("cnt_le") * 100 >= col("n") * 49 && col("cnt_lt") * 100 <= col("n") * 51)
          .as("within_rank_bound"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_full_outer" -> fullOuter,
    "q_approx_quantile" -> approxQuantile,
    "q_approx_distinct" -> approxDistinct,
    "q_filter_range" -> filterRange,
    "q_ci_lookup" -> ciLookup,
    "q_isin" -> isinFilter,
    "q_rlike" -> rlikeFilter,
    "q_having" -> havingFilter,
    "q_incremental" -> incremental,
    "q_semi_join" -> semiJoin,
    "q_star_join" -> starJoin,
    "q_group_agg" -> groupAgg,
    "q_distinct" -> distinctKeys,
    "q_rank_window" -> rankWindow,
    "q_window_analytics" -> windowAnalytics,
    "q_topk" -> topK,
    "q_except" -> exceptPairs,
    "q_intersect" -> intersectPairs,
    "q_union_all" -> unionAll,
    "q_case_bucket" -> caseBucket,
    "q_scalar_funcs" -> scalarFuncs,
    "q_interval" -> intervalArith,
    "q_rollup" -> rollupAgg
  )

  def oracles: Map[String, String] = Map(
    "q_full_outer" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_click,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_click
        |  FROM events WHERE event_type = 'click' AND value > 150.0
        |  GROUP BY user_id
        |), p AS (
        |  SELECT user_id, count(*) AS n_purchase,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_purchase
        |  FROM events WHERE event_type = 'purchase' AND value > 150.0
        |  GROUP BY user_id
        |)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |       coalesce(c.n_click, 0) AS n_click,
        |       coalesce(p.n_purchase, 0) AS n_purchase,
        |       c.sum_click, p.sum_purchase
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id""".stripMargin,
    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_extendedprice, 0.5) AS exact_p50,
        |       count(*) AS n,
        |       TRUE AS within_rank_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       count(*) AS n,
        |       TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_filter_range" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)""".stripMargin,
    "q_ci_lookup" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE lower(s_name) = 'supplier#000000007' LIMIT 1""".stripMargin,
    "q_isin" ->
      """SELECT l_suppkey, count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_suppkey IN (1,3,5,7) GROUP BY l_suppkey""".stripMargin,
    "q_rlike" ->
      """SELECT p_partkey, p_brand, p_type FROM part
        |WHERE regexp_matches(lower(p_type), '(economy|promo)')""".stripMargin,
    "q_having" ->
      """SELECT p_brand,
        |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_retail
        |FROM part GROUP BY p_brand
        |HAVING CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) >
        |       (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) FROM part)""".stripMargin,
    "q_incremental" ->
      """SELECT DISTINCT c_custkey, c_name FROM customer
        |WHERE lower(c_name) NOT IN (
        |  SELECT lower(c2.c_name) FROM customer c2
        |  JOIN orders ON o_custkey = c2.c_custkey
        |  WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 365 DAY FROM orders))""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price,
        |       count(*) AS n,
        |       count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct" -> "SELECT DISTINCT l_suppkey FROM lineitem",
    "q_rank_window" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS rk,
        |       CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INT) AS drk,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        |FROM customer""".stripMargin,
    "q_window_analytics" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |       LAG(o_totalprice, 1) OVER w AS prev_total,
        |       LEAD(o_totalprice, 1) OVER w AS next_total,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_except" ->
      """SELECT l_suppkey, l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |EXCEPT
        |SELECT l_suppkey, l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_intersect" ->
      """SELECT l_suppkey, l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |INTERSECT
        |SELECT l_suppkey, l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    "q_union_all" ->
      """SELECT src, count(*) AS n, CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM (
        |  SELECT 'customer' AS src, c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS src, s_acctbal AS acctbal FROM supplier
        |) u GROUP BY src""".stripMargin,
    "q_case_bucket" ->
      """SELECT CASE WHEN p_size < 10 THEN 'small'
        |            WHEN p_size BETWEEN 10 AND 30 THEN 'medium'
        |            ELSE 'large' END AS size_bucket,
        |       count(*) AS n,
        |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_retail
        |FROM part GROUP BY 1""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT p_partkey,
        |       lower(p_name) AS lname,
        |       upper(p_brand) AS ubrand,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substring(p_type, 1, 4) AS type_prefix,
        |       p_brand || '/' || p_type AS full_type,
        |       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
        |       CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1
        |FROM part""".stripMargin,
    "q_interval" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY AS ts_minus_1d,
        |       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin
  )
}
