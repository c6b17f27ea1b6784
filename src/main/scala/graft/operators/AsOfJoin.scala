package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of join — the canonical operator Spark lacks natively: for every
  * left row, attach the latest right row with `rightTime <= leftTime`
  * within the same key.
  *
  * Implementation (preference order (a): compose built-ins): tag both
  * sides, union, and run ONE window pass per key ordered by (time,
  * side) carrying the last-seen right payload forward
  * (`last(_, ignoreNulls = true)` over unbounded-preceding). Cost is a
  * single shuffle on the key + a per-key sort — the same lower bound a
  * native sort-merge as-of implementation pays — instead of the
  * O(n x m) range join a naive `t2 <= t1` theta-join would produce.
  * Right rows sort before left rows at equal timestamps, so an exact
  * tie matches (ASOF <= semantics, as in DuckDB's ASOF JOIN).
  *
  * Scale: partitions by join key; state per row is one carried struct.
  * Skewed keys shard via [[AsOfJoin.salted]]: salt the left side,
  * replicate the right side per shard, as-of within (key, shard) — the
  * per-task sort drops to 1/shards of a hot key's probe set at the
  * cost of scanning the right side `shards` times (AsOfJoinSpec pins
  * the salted/unsalted differential on a skewed key).
  */
object AsOfJoin {

  /** @param left       probe side (keeps all rows — left-join semantics)
    * @param right      quote side; its `payload` columns are carried
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to attach (prefixed `asof_`)
    * @param tiebreak   right-side column breaking ties among right rows
    *                   sharing (key, rightTime): backward keeps the
    *                   GREATEST tiebreak value ("latest wins"), forward
    *                   the SMALLEST ("first wins"). Without it the
    *                   carried row among such ties is whichever the
    *                   shuffle happened to order last — nondeterministic
    *                   across runs/partitionings. Pass the right side's
    *                   unique id whenever duplicates are possible.
    * @param forward    false (default): latest right row with
    *                   `rightTime <= leftTime` (ASOF backward, DuckDB's
    *                   default). true: EARLIEST right row with
    *                   `rightTime >= leftTime` (ASOF forward) — the
    *                   same one-shuffle window pass scanning time
    *                   descending instead of ascending.
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tiebreak: Option[String] = None, forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    val tieOf: DataFrame => Column = df =>
      tiebreak.map(df.col).getOrElse(lit(null).cast("long"))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(
        tiebreak.map(right.schema(_).dataType)
          .getOrElse(org.apache.spark.sql.types.LongType)))
      .withColumn("__payload", lit(null).cast(payloadType(right, payload)))
    val r = right
      .select((col(key) +: col(rightTime).as("__t") +:
        tieOf(right).as("__tie") +:
        struct(payload.map(col): _*).as("__payload") +: Nil): _*)
      .withColumn("__side", lit(0))

    val unioned = l.select(
      (col(key) +: col("__t") +: col("__side") +: col("__tie") +: col("__payload") +:
        leftCols.filterNot(_ == key).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)

    // Right rows (__side=0) sort before left rows at an equal timestamp
    // (ASOF tie matches in both directions); among right rows sharing
    // (key, __t), __tie is ordered so the WINNING row sorts last and
    // last(ignoreNulls) carries it — deterministic under any input
    // order. Left rows have a null __tie, irrelevant because their
    // relative order never affects last(__payload, ignoreNulls=true).
    // Forward flips only the TIME direction (descending scan: the
    // last-seen right row at a left row is the earliest rightTime >=
    // leftTime) and the tie rule (smallest tiebreak wins = "first"):
    // same shuffle, same single sort, no extra pass.
    val w = Window.partitionBy(col(key))
      .orderBy(
        if (forward) col("__t").desc else col("__t").asc,
        col("__side"),
        if (forward) col("__tie").desc_nulls_first else col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__last", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      payload.map(p => col("__last").getField(p).as(s"asof_$p"))
    matched.select(out: _*)
  }

  /** Skew-hardened as-of — the sharded variant the scaladoc promises:
    * the left (probe) side salts into `shards` deterministic shards,
    * the right (quote) side replicates to EVERY shard, and the same
    * one-window pass runs on the composite (key, shard). Each shard
    * sees every right row of its key, so per-row results are identical
    * to the unsalted pass (no merge step needed — as-of is a per-LEFT-
    * row lookup, not an aggregate); what changes is that a hot key's
    * probe rows spread over `shards` tasks instead of one.
    *
    * Cost model: right side scanned/shuffled `shards` times — worth it
    * exactly when probe skew dominates (bot/power keys), the same
    * replicate-the-build-side tradeoff as
    * [[graft.pipeline.Salting.saltedJoin]]. The shard id hashes ALL of
    * the left row's columns (`hash(left.columns: _*)`) — deterministic
    * across runs and partitionings, and it spreads even probes that
    * share a timestamp (a time-only hash would leave same-instant
    * bursts, the common bot shape, on one shard).
    */
  def salted(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      tiebreak: Option[String] = None, forward: Boolean = false,
      shards: Int = 8): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val l = left.withColumn("__shard",
      pmod(hash(left.columns.map(col): _*), lit(shards)))
    val r = right.withColumn("__shard",
      explode(sequence(lit(0), lit(shards - 1))))
    val withKey = (df: DataFrame) =>
      df.withColumn("__saltkey", struct(col(key), col("__shard")))
    AsOfJoin(withKey(l), withKey(r), "__saltkey", leftTime, rightTime,
      payload, tiebreak, forward)
      .drop("__saltkey", "__shard")
  }

  private def payloadType(right: DataFrame, payload: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
}

/** Driver-checked as-of query: each purchase event matched to the
  * user's latest click at-or-before it. Oracle = DuckDB's native
  * ASOF JOIN.
  */
object AsOfQueries extends graft.QueryModule {

  def asofClicks(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    AsOfJoin(purchases, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"),
      tiebreak = Some("click_id"))
  }

  /** Forward as-of: each purchase matched to the user's FIRST click
    * at-or-after it (the "next action after conversion" analytics
    * shape). Same one-shuffle window plan as backward, time-reversed.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    AsOfJoin(purchases, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"),
      tiebreak = Some("click_id"), forward = true)
  }

  /** Nearest as-of: each purchase matched to the user's click CLOSEST
    * in time, either side. Composed from one backward + one forward
    * pass (two window scans over the same shuffle key — no extra
    * join), picked per row by absolute distance with the deterministic
    * tie policy the oracle spells out: an exact-timestamp click always
    * wins (smallest id among exact ties), otherwise the EARLIER click
    * wins equidistant ties (matches ORDER BY abs, ts, id).
    *
    * Backward-leg tiebreak: the oracle's final `ORDER BY abs, ts, id
    * ASC` picks the SMALLEST id among clicks tied at the nearest
    * timestamp — including when that timestamp is strictly BEFORE the
    * purchase. The plain backward as-of keeps the greatest id ("latest
    * wins", q_asof_join's contract), so this leg negates the id as the
    * tiebreak: greatest(-id) = smallest id, aligning both legs with
    * the one (abs, ts, id ASC) policy (r8; AsOfJoinSpec pins it with
    * duplicate same-timestamp clicks strictly before the probe).
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    nearestOf(purchases, clicks)
  }

  /** The nearest composition over any (event_id, user_id, ts, value)
    * probe frame and (user_id, ts, click_id, click_ts) click frame —
    * factored so AsOfJoinSpec can pin the duplicate-timestamp tiebreak
    * on synthetic frames the fixture doesn't contain.
    */
  private[graft] def nearestOf(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val back = AsOfJoin(purchases,
      clicks.withColumn("neg_id", -col("click_id")), key = "user_id",
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"),
      tiebreak = Some("neg_id"))
      .withColumnRenamed("asof_click_id", "b_id").withColumnRenamed("asof_click_ts", "b_ts")
    val fwd = AsOfJoin(purchases, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"),
      tiebreak = Some("click_id"), forward = true)
      .select(col("event_id"), col("asof_click_id").as("f_id"), col("asof_click_ts").as("f_ts"))
    val dBack = unix_micros(col("ts")) - unix_micros(col("b_ts"))
    val dFwd = unix_micros(col("f_ts")) - unix_micros(col("ts"))
    // exact match (dFwd = 0): forward carries the smallest click_id
    // among clicks AT the purchase time — the oracle's (abs, ts, id)
    // order picks exactly that row. Otherwise strictly smaller
    // distance wins; equidistant -> backward (earlier ts sorts first).
    val pickFwd = col("b_ts").isNull ||
      (col("f_ts").isNotNull && (dFwd === 0 || dFwd < dBack))
    back.join(fwd, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(pickFwd, col("f_id")).otherwise(col("b_id")).as("asof_click_id"),
        when(pickFwd, col("f_ts")).otherwise(col("b_ts")).as("asof_click_ts"))
  }

  /** Tolerance-bounded backward as-of: the latest click at-or-before
    * each purchase, but only if it happened within the last 6 hours —
    * the "stale quotes must not match" semantics every time-series
    * store's ASOF takes as a `tolerance` parameter. Same single
    * window pass as [[asofClicks]]; the bound is a row-local null-out
    * afterward (the carried match IS the latest one, so if it's too
    * old, no in-tolerance match exists — no second pass needed).
    */
  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val tolMicros = 6L * 3600L * 1000000L
    asofClicks(spark, dir)
      .withColumn("in_tol",
        col("asof_click_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("asof_click_ts")) <= tolMicros)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(col("in_tol"), col("asof_click_id")).as("asof_click_id"),
        when(col("in_tol"), col("asof_click_ts")).as("asof_click_ts"))
  }

  /** The salted (skew-sharded) variant of [[asofClicks]] — results are
    * identical to the unsalted pass by construction (each shard sees
    * every click of its key), so it shares q_asof_join's oracle; its
    * presence in the harness pins that equivalence at fixture scale on
    * every round, not just in AsOfJoinSpec's synthetic hot key.
    */
  def asofSalted(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    AsOfJoin.salted(purchases, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts", payload = Seq("click_id", "click_ts"),
      tiebreak = Some("click_id"), shards = 4)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> asofClicks,
    "q_asof_forward" -> asofForward,
    "q_asof_nearest" -> asofNearest,
    "q_asof_tolerance" -> asofTolerance,
    "q_asof_salted" -> asofSalted
  )

  // Deterministic oracle: a LATERAL top-1 with an explicit
  // (ts DESC, event_id DESC) order — the same "latest click, greatest
  // id among exact-timestamp ties" rule the Spark side's window
  // tiebreak applies. DuckDB's native ASOF JOIN picks arbitrarily among
  // duplicate (key, ts) right rows, which could flake the hash compare.
  private val asofClicksOracle =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
      |       c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |      FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN LATERAL (
      |  SELECT event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
      |  FROM events c
      |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
      |    AND CAST(c.ts AS TIMESTAMP) <= p.ts
      |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true""".stripMargin

  def oracles: Map[String, String] = Map(
    // q_asof_salted shares q_asof_join's oracle: the salted plan is
    // row-for-row identical by construction (see AsOfJoin.salted).
    "q_asof_salted" -> asofClicksOracle,
    "q_asof_join" -> asofClicksOracle,
    "q_asof_forward" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
        |       c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND CAST(c.ts AS TIMESTAMP) >= p.ts
        |  ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) c ON true""".stripMargin,
    "q_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
        |       c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND CAST(c.ts AS TIMESTAMP) <= p.ts
        |    AND CAST(c.ts AS TIMESTAMP) >= p.ts - INTERVAL 6 HOUR
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true""".stripMargin,
    "q_asof_nearest" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
        |       c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |  ORDER BY abs(epoch_us(CAST(c.ts AS TIMESTAMP)) - epoch_us(p.ts)) ASC,
        |           c.ts ASC, c.event_id ASC LIMIT 1) c ON true""".stripMargin
  )
}
