package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.util.control.NonFatal

/** The reference's ingestion surface re-expressed for Spark: paginated
  * scans (S1, `wdn_api.py:108-138`), chunked parallel keyed point
  * lookups (S2, `wdn_api.py:94-106`), and bounded retry with
  * exponential backoff (S3/T6, `wdn_api.py:63-64`).
  *
  * The transport is a plain function (`page -> payload` /
  * `id -> payload`), so the layer is offline-testable and the harness
  * never touches a network; a production deployment plugs an HTTP
  * client into the same signatures.
  *
  * Distribution model, mirroring SURVEY §3.1's boundary analysis:
  *  - Pagination is inherently sequential on the driver (page N's
  *    response tells you whether N+1 exists — `wdn_api.py:126-135`),
  *    so [[fetchPages]] loops on the driver and fires the per-page
  *    callback (K4 eager commit, `wdn_api.py:121-122`) as each page
  *    lands; the payloads become a DataFrame for the parse layer.
  *  - Keyed lookups are embarrassingly parallel: [[fetchByIds]] ships
  *    the id list through `repartition(n).mapPartitions(fetch)` — the
  *    executor-side analog of the reference's 5-process pool with
  *    50-id progress chunks (O7, `wdn_api.py:89-92`). At scale the id
  *    list is itself a DataFrame and parallelism = partitions.
  */
object PaginatedSource {

  /** Bounded retry with exponential backoff — the `@retry(delay=1,
    * backoff=2, max_delay=60, tries=10)` policy of `wdn_api.py:64`,
    * parameterized. Sleeps are capped; the last failure propagates.
    */
  def withRetry[T](tries: Int = 10, delayMs: Long = 1000, backoff: Double = 2.0,
      maxDelayMs: Long = 60000, sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 0
    var delay = delayMs
    while (true) {
      try return body
      catch {
        case NonFatal(e) =>
          attempt += 1
          if (attempt >= tries) throw e
          sleep(delay)
          delay = math.min((delay * backoff).toLong, maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Paginated scan: fetch page 1..N until `totalCount` is covered or a
    * page comes back empty (`wdn_api.py:124-135`). `onPage` fires per
    * page before the next fetch (T3 eager commit). Returns all page
    * payloads as a single-column DataFrame ready for
    * [[graft.pipeline.Parse]].
    *
    * @param fetch     page number (1-based) -> (records as raw JSON
    *                  strings, total record count reported by the API)
    */
  def fetchPages(spark: SparkSession, fetch: Int => (Seq[String], Long),
      pageSize: Int, onPage: Seq[String] => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    val acc = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done) {
      val (records, totalCount) = withRetry()(fetch(page))
      if (records.isEmpty) done = true
      else {
        onPage(records)
        acc ++= records
        if (page.toLong * pageSize >= totalCount) done = true else page += 1
      }
    }
    acc.result().toDF("payload")
  }

  /** Keyed point-lookup fan-out: distribute the id list and fetch per
    * id inside executors. Empty payloads are dropped — deliberately
    * NOT persisted so absent entities are re-fetched next run (T4,
    * `wdn_api.py:86-87`, README.md:44). Per-record failures after
    * retries downgrade to a skip (the reference logs FK violations
    * rather than failing the run, `db.py:63-67`).
    *
    * @param fetch must be serializable; executed executor-side.
    */
  def fetchByIds(spark: SparkSession, ids: Seq[Long], fetch: Long => Option[String],
      parallelism: Int = 5): DataFrame = {
    import spark.implicits._
    val idDs: Dataset[Long] = ids.toDS()
    idDs
      .repartition(parallelism)
      .mapPartitions { part =>
        part.flatMap { id =>
          try withRetry(tries = 3, delayMs = 10, sleep = _ => ())(fetch(id))
          catch { case NonFatal(_) => None }
        }
      }
      .toDF("payload")
  }

  /** Search + case-insensitive exact-match guard (S4/F10,
    * `wdn_api.py:20-30`): scan candidates, CI-match `name`, raise when
    * nothing matches.
    */
  def searchExact(results: DataFrame, nameCol: String, query: String): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.functions._
    // Locale.ROOT: Spark's lower() is locale-independent; a default-
    // locale toLowerCase would diverge under e.g. tr-TR ("NIKE" -> dotless i)
    val hits = results
      .filter(lower(col(nameCol)) === query.toLowerCase(java.util.Locale.ROOT))
      .head(1)
    if (hits.isEmpty)
      throw new NoSuchElementException(s"no exact match for '$query' in $nameCol")
    hits.head
  }
}
