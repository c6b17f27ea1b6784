package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side page fetcher a [[PaginatedDataSource]] scan plugs in.
  * Implementations need a no-arg constructor (instantiated by class
  * name on each executor — the standard connector pattern for
  * credentials-free test transports; a production HTTP transport reads
  * its endpoint/auth from the options map passed via [[init]]).
  */
trait PageTransport extends Serializable {
  /** Called once per reader with the scan options before any fetch. */
  def init(options: Map[String, String]): Unit = ()
  /** Fetch a 1-based page: (records as raw JSON strings, total record
    * count reported by the API — the reference's meta.page.total_count,
    * wdn_api.py:126).
    */
  def fetch(page: Int): (Seq[String], Long)
}

/** DataSourceV2 form of the paginated scan (S1): the production-grade
  * counterpart of [[PaginatedSource.fetchPages]]'s driver-side loop.
  *
  * The reference's API (`wdn_api.py:108-138`) uses offset pagination —
  * any page is addressable directly — so only the page COUNT discovery
  * is sequential: `planInputPartitions` probes page 1 on the driver
  * (with the S3 retry policy) to learn `total_count`, then splits the
  * page range into input partitions. Every partition's pages are
  * fetched INSIDE executors by a [[PartitionReader]] — fetch
  * parallelism scales with the cluster instead of saturating one
  * driver thread, and a failed page fails one task (and retries under
  * Spark's task retry on a fresh reader), not the whole scan. The
  * probe's page-1 payload rides along in the first partition so no
  * page is fetched twice.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-pages")
  *     .option("transportClass", classOf[MyTransport].getName)
  *     .option("pageSize", "100")        // API page size
  *     .option("maxPartitions", "8")     // fetch parallelism cap
  *     .load()                           // => (page INT, payload STRING)
  * }}}
  */
class PaginatedDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PaginatedDataSource.SCHEMA
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedTable
}

object PaginatedDataSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  private[sources] def makeTransport(opts: Map[String, String]): PageTransport = {
    val cls = opts.getOrElse("transportclass",
      throw new IllegalArgumentException("graft-pages requires option transportClass"))
    val t = Class.forName(cls).getDeclaredConstructor().newInstance()
      .asInstanceOf[PageTransport]
    t.init(opts)
    t
  }
}

private class PagedTable extends Table with SupportsRead {
  override def name(): String = "graft_paginated"
  override def schema(): StructType = PaginatedDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScan(options)
}

private class PagedScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownLimit with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  import scala.jdk.CollectionConverters._
  private val opts: Map[String, String] =
    options.asCaseSensitiveMap().asScala.toMap.map { case (k, v) => (k.toLowerCase, v) }
  private val pageSize = opts.getOrElse("pagesize", "100").toInt
  private val maxPartitions = opts.getOrElse("maxpartitions", "8").toInt
  private val retry = RetryOpts(opts)

  // Pushdown state, set by Catalyst before build()/planning. A page is
  // the scan's natural pruning unit (pageSize records each), so a LIMIT
  // needs only ceil(limit/pageSize) pages and a predicate on the `page`
  // column needs only the matching page range — every other query shape
  // still fetches all pages, but a `.limit(5)` probe or a
  // page-targeted re-read stops paying for the whole source.
  private var limitPages: Option[Int] = None
  private var pageLo = 1
  private var pageHi = Int.MaxValue
  // In-with-gaps prunes to [min,max] but keeps non-matching pages in
  // range; the LIMIT page cap is only sound when every kept page
  // survives the residual filter, so gaps disable it.
  private var rangeExact = true
  private var pushed: Array[Filter] = Array.empty

  override def pushLimit(limit: Int): Boolean = {
    limitPages = Some(math.max(1, (limit + pageSize - 1) / pageSize))
    true
  }
  // a page may out-produce the limit (and gaps may under-select): Spark
  // must keep its own Limit on top — pruning is an optimization only
  override def isPartiallyPushed: Boolean = true

  // COUNT(*) pushdown: the API's probe response carries the exact
  // total record count (the reference's meta.page.total_count,
  // wdn_api.py:126), so a plain `count(*)` over the source needs the
  // ONE driver probe and ZERO page fetches — without this, counting a
  // 10^6-page source fetched and discarded every payload. Pushed only
  // for the ungrouped single-CountStar shape with no page pruning in
  // play: a pushed page range or LIMIT changes which rows survive, and
  // total_count can't answer for a subset (Spark also only offers the
  // aggregate when no residual filters remain above the scan).
  private var countStarPushed = false
  private var sawFilters = false

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions().isEmpty &&
      aggregation.aggregateExpressions().length == 1 &&
      aggregation.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      !sawFilters && limitPages.isEmpty && pageLo == 1 && pageHi == Int.MaxValue

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (!supportCompletePushDown(aggregation)) false
    else { countStarPushed = true; true }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    def asInt(v: Any): Option[Int] = v match {
      case i: Int => Some(i)
      case l: Long if l >= Int.MinValue && l <= Int.MaxValue => Some(l.toInt)
      case s: Short => Some(s.toInt)
      case _ => None
    }
    pushed = filters.filter {
      case EqualTo("page", v) => asInt(v).exists { i =>
        pageLo = math.max(pageLo, i); pageHi = math.min(pageHi, i); true
      }
      // strict bounds clamp through Long: i+1 at Int.MaxValue (or i-1 at
      // MinValue) would wrap and silently disable pruning
      case GreaterThan("page", v) => asInt(v).exists { i =>
        pageLo = math.max(pageLo, math.min(Int.MaxValue.toLong, i.toLong + 1).toInt); true
      }
      case GreaterThanOrEqual("page", v) => asInt(v).exists { i =>
        pageLo = math.max(pageLo, i); true
      }
      case LessThan("page", v) => asInt(v).exists { i =>
        pageHi = math.min(pageHi, math.max(Int.MinValue.toLong, i.toLong - 1).toInt); true
      }
      case LessThanOrEqual("page", v) => asInt(v).exists { i =>
        pageHi = math.min(pageHi, i); true
      }
      case In("page", vs) if vs.nonEmpty && vs.forall(asInt(_).isDefined) =>
        val ints = vs.map(asInt(_).get)
        pageLo = math.max(pageLo, ints.min); pageHi = math.min(pageHi, ints.max)
        rangeExact = false
        true
      case _ => false
    }
    // everything stays a residual: the page column is emitted, so Spark
    // re-applies each predicate post-scan — pruning can only skip
    // fetches, never change results
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  // Column pruning: a projection that drops `payload` (e.g. a count or
  // a page-range probe) must not materialize every record string into
  // rows — the reader emits only the requested fields, in the
  // requested order. Pages are still FETCHED (the transport is the row
  // source, records are the row count), but the per-row payload
  // allocation and the bytes carried through the rest of the plan are
  // gone. Spark hands us a subset of SCHEMA; empty (count(*)) is legal.
  private var requiredSchema: StructType = PaginatedDataSource.SCHEMA
  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = this
  override def readSchema(): StructType =
    if (countStarPushed)
      StructType(Seq(StructField("count(*)", LongType, nullable = false)))
    else requiredSchema
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = limitPages.fold("")(lp => s", limitPages=$lp")
    val rng = if (pageLo > 1 || pageHi < Int.MaxValue) s", pages=[$pageLo,$pageHi]" else ""
    val agg = if (countStarPushed) ", PushedAggregates=[COUNT(*)]" else ""
    val cols = requiredSchema.fieldNames.mkString(",")
    s"graft-pages(pageSize=$pageSize$lim$rng$agg, cols=[$cols])"
  }

  // memoized: Spark may call planInputPartitions several times on one
  // scan (planning + execution); the probe must not re-fire each time
  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  // a provably-empty pushed range (pageHi < pageLo, or the whole range
  // below page 1) needs no count discovery at all — skip the driver
  // probe, not just the executor fetches
  private lazy val plannedPartitions: Array[InputPartition] =
    if (countStarPushed) {
      // one probe for total_count; its record payload is discarded —
      // no page partition ever reaches an executor
      val (_, totalCount) =
        retry(PaginatedDataSource.makeTransport(opts).fetch(1))
      Array(CountPartition(totalCount))
    } else if (pageHi < math.max(1, pageLo)) Array.empty else plannedNonEmpty

  private lazy val plannedNonEmpty: Array[InputPartition] = {
    // count discovery: ONE driver-side probe per scan (the inherently
    // sequential part of offset pagination); its payload is not wasted
    // — it seeds the first partition when page 1 survives pruning
    val (firstRecords, totalCount) =
      retry(PaginatedDataSource.makeTransport(opts).fetch(1))
    if (firstRecords.isEmpty) Array.empty
    else {
      val numPages = math.max(1L, (totalCount + pageSize - 1) / pageSize).toInt
      val lo = math.max(1, pageLo)
      val hi0 = math.min(numPages, pageHi)
      val hi = limitPages match {
        case Some(lp) if rangeExact => math.min(hi0, lo.toLong + lp - 1).toInt
        case _ => hi0
      }
      if (lo > hi) Array.empty
      else {
        val planned = hi - lo + 1
        val targetParts = math.min(planned, math.max(1, maxPartitions))
        // contiguous page ranges, remainder spread over the first ranges
        val base = planned / targetParts
        val extra = planned % targetParts
        var start = lo
        (0 until targetParts).map { i =>
          val len = base + (if (i < extra) 1 else 0)
          val p = PagePartition(start, start + len - 1,
            if (start == 1) firstRecords else Seq.empty)
          start += len
          p
        }.toArray
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(opts, requiredSchema.fieldNames)
}

/** A contiguous range of 1-based pages; `seeded` carries the driver
  * probe's page-1 records for the partition that owns page 1.
  */
private case class PagePartition(startPage: Int, endPage: Int, seeded: Seq[String])
    extends InputPartition

/** The single partition of a completely-pushed COUNT(*): emits one row
  * carrying the probe's total_count, fetching nothing.
  */
private case class CountPartition(totalCount: Long) extends InputPartition

/** The S3 retry policy parameterized through scan options
  * (retryTries / retryDelayMs), applied identically to the driver
  * probe and the executor readers.
  */
private case class RetryOpts(tries: Int, delayMs: Long) {
  def apply[T](body: => T): T =
    PaginatedSource.withRetry(tries = tries, delayMs = delayMs)(body)
}
private object RetryOpts {
  def apply(opts: Map[String, String]): RetryOpts = RetryOpts(
    opts.getOrElse("retrytries", "10").toInt,
    opts.getOrElse("retrydelayms", "1000").toLong)
}

private class PagedReaderFactory(opts: Map[String, String], cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case c: CountPartition => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = if (emitted) false else { emitted = true; true }
        override def get(): InternalRow = new GenericInternalRow(Array[Any](c.totalCount))
        override def close(): Unit = ()
      }
      case p: PagePartition => new PagedReader(p, opts, cols)
    }
}

private class PagedReader(part: PagePartition, opts: Map[String, String],
    cols: Array[String])
    extends PartitionReader[InternalRow] {
  private lazy val transport = PaginatedDataSource.makeTransport(opts)
  private val retry = RetryOpts(opts)
  private var page = part.startPage
  private var buffer: Iterator[String] = Iterator.empty
  private var exhausted = false

  // Per-column emit plan, resolved ONCE at reader construction: the
  // pruned projection is fixed for the reader's life, so matching
  // column-name strings per row per column is avoidable dispatch on
  // payload-heavy scans (and an unknown column now fails at reader
  // construction, before any fetch). 0 = page, 1 = payload.
  private val colPlan: Array[Int] = cols.map {
    case "page" => 0
    case "payload" => 1
    case other => throw new IllegalStateException(s"unknown column $other")
  }

  override def next(): Boolean = {
    while (!buffer.hasNext && !exhausted) {
      if (page > part.endPage) exhausted = true
      else {
        val records =
          if (page == part.startPage && part.seeded.nonEmpty) part.seeded
          else retry(transport.fetch(page))._1
        // An empty page inside the PLANNED range means the source
        // shrank between planning and execution. Parallel readers
        // can't reproduce the sequential loop's stop-at-first-empty
        // (a later partition would still emit its pages, leaving a
        // silent page-range GAP), so the only consistent behaviors
        // are fail-loud or silent holes — fail loud.
        if (records.isEmpty)
          throw new IllegalStateException(
            s"page $page was planned from total_count but came back empty " +
              "(source shrank mid-scan); re-run the read")
        buffer = records.iterator
        page += 1
      }
    }
    buffer.hasNext
  }

  override def get(): InternalRow = {
    // emit exactly the pruned projection, in its order; the record is
    // always consumed (it IS the row), its string only converted when
    // `payload` survived pruning
    val rec = buffer.next()
    val values = new Array[Any](colPlan.length)
    var i = 0
    while (i < colPlan.length) {
      values(i) =
        if (colPlan(i) == 0) page - 1
        else UTF8String.fromString(rec)
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = ()
}
