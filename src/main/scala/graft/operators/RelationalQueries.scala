package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** The reference's analytical-query surface, recast onto the fixture star
  * schema (FIXTURES.md §A): fact = `lineitem` (≅ offers), dims =
  * `supplier` (≅ retailers) and `part` (≅ products, `p_type` standing in
  * for `brand_names`).
  *
  * Flagship = the retailer price-segmentation query of
  * `/root/reference/sql.py:4-25`: 3-table star join, regex filter
  * (`sql.py:20`), group-by + AVG (`sql.py:13,21`), CASE bucketing
  * (`sql.py:14-16`), post-aggregation filter (`sql.py:23`), RANK window
  * (`sql.py:8`), ROUND projection (`sql.py:9`), multi-key sort
  * (`sql.py:24`).
  *
  * Scale design: `lineitem` is the only large input; `supplier`/`part`
  * are dimensions that Spark broadcast-joins (they stay below the
  * autoBroadcastJoinThreshold at any realistic dim/fact ratio, and AQE
  * re-plans if not). The aggregation is partial+final hash aggregate, so
  * the single shuffle carries only (suppkey → partial sum/count), not raw
  * rows. The window partitions by `segment` (low cardinality) but runs
  * over post-aggregation data (one row per supplier), which is tiny at
  * any scale; the final sort is equally post-aggregation.
  *
  * Float determinism vs the DuckDB oracle: AVG over double is
  * summation-order-dependent, so both sides compute
  * `CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)` — the
  * decimal sum is exact, the quotient is one IEEE-754 operation on
  * identical inputs, hence bit-identical across engines (SURVEY §7.4).
  */
object RelationalQueries extends graft.QueryModule {

  /** Exact, order-insensitive mean of a 2-decimal price column; see
    * class doc. Same expression shape as the oracle SQL.
    */
  private def exactAvg(price: Column): Column =
    sum(price.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** sql.py:4-25 recast. Segment thresholds 52000/54000 play the role of
    * the reference's 100/200 (`sql.py:14-16`); the regex alternation
    * `(economy|promo|standard)` plays `(nike|adidas|vans)` (`sql.py:20`).
    */
  def segmentation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)

    val joined = li
      .join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .filter(lower(col("p_type")).rlike("(economy|promo|standard)"))

    val agg = joined
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(exactAvg(col("l_extendedprice")).as("avg_product_price"))
      .withColumn(
        "segment",
        when(col("avg_product_price") < 52000, "Normal")
          .when(col("avg_product_price").between(52000, 54000), "High End")
          .otherwise("Very High End"))

    // Reference order: WHERE on the derived column runs before the
    // window (sql.py:8,23) — rank is computed over the filtered set.
    val w = Window.partitionBy(col("segment")).orderBy(col("avg_product_price").desc)
    agg
      .filter(col("segment") =!= "Very High End")
      .withColumn("supplier_rank", rank().over(w))
      .select(
        col("s_name").as("supplier_name"),
        col("segment"),
        col("supplier_rank"),
        round(col("avg_product_price"), 2).as("avg_product_price_usd"))
      .orderBy(col("segment"), col("supplier_rank"))
  }

  val segmentationOracle: String =
    """SELECT supplier_name, segment, supplier_rank, round(avg_product_price, 2) AS avg_product_price_usd
      |FROM (
      |  SELECT supplier_name, segment,
      |         CAST(RANK() OVER (PARTITION BY segment ORDER BY avg_product_price DESC) AS INT) AS supplier_rank,
      |         avg_product_price
      |  FROM (
      |    SELECT s.s_name AS supplier_name,
      |           CASE WHEN a.avg_product_price < 52000 THEN 'Normal'
      |                WHEN a.avg_product_price BETWEEN 52000 AND 54000 THEN 'High End'
      |                ELSE 'Very High End' END AS segment,
      |           a.avg_product_price
      |    FROM (
      |      SELECT l.l_suppkey,
      |             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_product_price
      |      FROM lineitem l
      |      JOIN part p ON p.p_partkey = l.l_partkey
      |      WHERE regexp_matches(lower(p.p_type), '(economy|promo|standard)')
      |      GROUP BY l.l_suppkey
      |    ) a
      |    JOIN supplier s ON s.s_suppkey = a.l_suppkey
      |  ) b
      |  WHERE segment <> 'Very High End'
      |) c
      |ORDER BY segment, supplier_rank""".stripMargin

  /** Market-basket co-purchase mining: part pairs appearing in the
    * same order, with supports and an integer-exact lift direction —
    * the classic association-rule building block (recommendations,
    * bundling, substitution analysis). The lift comparison
    * n_both * n_orders vs n_a * n_b is a long cross-multiplication,
    * so both engines agree exactly; reported support counts are plain
    * integers.
    *
    * Scale: pair generation is per-order and bounded by basket width
    * squared (TPC-H orders hold <= 7 parts) — never parts x parts.
    * One shuffle groups the fact table into per-order basket arrays;
    * pairs expand row-locally from each array, so no self-join and no
    * second fact shuffle exist in the plan. The support >= 2 filter
    * bounds the output; per-part supports join back on the pair frame
    * (AQE broadcasts the vocabulary-sized support table when small).
    */
  /** Baskets wider than this are excluded from pair mining — the
    * standard bot-cart guard: an unbounded basket pairs quadratically
    * inside one row, so a single 100k-item cart would expand to 5x10^9
    * pair structs from one task. The width filter runs on the basket
    * ARRAY before any pair expands, so the wide basket costs one
    * array, not w² rows. TPC-H orders hold <= 7 parts, so on the
    * fixture the cap is a no-op (the oracle applies the same clause);
    * in production it is the knob that keeps the operator's per-row
    * work bounded by policy, not by luck.
    */
  private val MaxBasket = 200L

  /** Per-order basket arrays — one shuffle (collect_set is the
    * per-order DISTINCT, sort_array fixes pair orientation); the
    * basket-width cap is a row-local size() filter, so a pathological
    * 100k-item cart costs one array, never w² join rows.
    *
    * Staged per (session, dir) since r20: the frame has TWO consumers
    * — the memoized [[coPairs]] build reads it once at fill, and
    * [[copurchase]] re-derived it (full lineitem scan + the collect_set
    * shuffle) on EVERY execution for its support/total statistics
    * (guide §1.6 recompute removal). Order-domain-sized like
    * dedup.shingles' doc-domain frame; the parquet substrate carries
    * it in multi-process mode.
    */
  private def baskets(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("relational.baskets", spark, dir) { scope =>
      scope.cached(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok"))
        .agg(sort_array(collect_set(col("pk"))).as("parts"))
        .filter(size(col("parts")) <= MaxBasket))
    }

  /** Co-purchased part pairs with support >= 2 — pair generation is a
    * row-local combinations expression over each sorted basket (for
    * element i, pair with every later element), keeping
    * part_a < part_b by construction: no self-join, no second shuffle
    * of the fact table. Shared by [[copurchase]] and the co-purchase
    * graph consumers (GraphQueries.triangles) — memoized per
    * (session, dir) via [[graft.SharedBuilds]] so one cached pair
    * build serves both families, the materialized-staging-table role.
    */
  private[operators] def coPairs(spark: SparkSession, dir: String): DataFrame =
    graft.SharedBuilds.getOrBuild[DataFrame]("relational.coPairs", spark, dir) { scope =>
      scope.cached(baskets(spark, dir)
        .select(explode(flatten(transform(col("parts"),
          (x, i) => transform(
            slice(col("parts"), i + lit(2), size(col("parts"))),
            y => struct(x.as("part_a"), y.as("part_b")))))).as("p"))
        .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 2))
    }

  def copurchase(spark: SparkSession, dir: String): DataFrame = {
    // sup and stats read the staged basket frame (r20) — the lineitem
    // scan + collect_set shuffle they previously re-ran per execution
    // is paid once inside the shared build; the pair frame likewise
    // reads the SharedBuilds-cached coPairs build (InMemoryTableScan).
    val bk = baskets(spark, dir)
    val pairs = coPairs(spark, dir)
    val sup = bk.select(explode(col("parts")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_orders_part"))
    val stats = bk.agg(count(lit(1)).as("n_orders"))
    pairs
      .join(sup.select(col("pk").as("part_a"), col("n_orders_part").as("n_a")), Seq("part_a"))
      .join(sup.select(col("pk").as("part_b"), col("n_orders_part").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(stats))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"), col("n_b"),
        col("n_orders"),
        (col("n_both") * col("n_orders") > col("n_a") * col("n_b")).as("lift_up"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_segmentation" -> segmentation,
    "q_copurchase" -> copurchase
  )

  def oracles: Map[String, String] = Map(
    "q_segmentation" -> segmentationOracle,
    "q_copurchase" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |li AS (
        |  SELECT ok, pk FROM li0
        |  WHERE ok IN (SELECT ok FROM li0 GROUP BY ok HAVING count(*) <= 200)
        |),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS n_both
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY pk),
        |stats AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li)
        |SELECT p.part_a, p.part_b, p.n_both, sa.n AS n_a, sb.n AS n_b, s.n_orders,
        |       p.n_both * s.n_orders > sa.n * sb.n AS lift_up
        |FROM pairs p
        |JOIN sup sa ON sa.pk = p.part_a
        |JOIN sup sb ON sb.pk = p.part_b
        |CROSS JOIN stats s""".stripMargin
  )
}
