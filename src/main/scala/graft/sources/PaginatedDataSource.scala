package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
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
    extends ScanBuilder with Scan with Batch {
  import scala.jdk.CollectionConverters._
  private val opts: Map[String, String] =
    options.asCaseSensitiveMap().asScala.toMap.map { case (k, v) => (k.toLowerCase, v) }
  private val pageSize = opts.getOrElse("pagesize", "100").toInt
  private val maxPartitions = opts.getOrElse("maxpartitions", "8").toInt
  private val retry = RetryOpts(opts)

  override def build(): Scan = this
  override def readSchema(): StructType = PaginatedDataSource.SCHEMA
  override def toBatch: Batch = this
  override def description(): String = s"graft-pages(pageSize=$pageSize)"

  // memoized: Spark may call planInputPartitions several times on one
  // scan (planning + execution); the probe must not re-fire each time
  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  private lazy val plannedPartitions: Array[InputPartition] = {
    // count discovery: ONE driver-side probe per scan (the inherently
    // sequential part of offset pagination); its payload is not wasted
    // — it seeds the first partition
    val (firstRecords, totalCount) =
      retry(PaginatedDataSource.makeTransport(opts).fetch(1))
    if (firstRecords.isEmpty) Array.empty
    else {
      val numPages = math.max(1L, (totalCount + pageSize - 1) / pageSize).toInt
      val targetParts = math.min(numPages, math.max(1, maxPartitions))
      // contiguous page ranges, remainder spread over the first ranges
      val base = numPages / targetParts
      val extra = numPages % targetParts
      var start = 1
      (0 until targetParts).map { i =>
        val len = base + (if (i < extra) 1 else 0)
        val p = PagePartition(start, start + len - 1,
          if (start == 1) firstRecords else Seq.empty)
        start += len
        p
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(opts)
}

/** A contiguous range of 1-based pages; `seeded` carries the driver
  * probe's page-1 records for the partition that owns page 1.
  */
private case class PagePartition(startPage: Int, endPage: Int, seeded: Seq[String])
    extends InputPartition

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

private class PagedReaderFactory(opts: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedReader(partition.asInstanceOf[PagePartition], opts)
}

private class PagedReader(part: PagePartition, opts: Map[String, String])
    extends PartitionReader[InternalRow] {
  private lazy val transport = PaginatedDataSource.makeTransport(opts)
  private val retry = RetryOpts(opts)
  private var page = part.startPage
  private var buffer: Iterator[String] = Iterator.empty
  private var exhausted = false

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

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](page - 1, UTF8String.fromString(buffer.next())))

  override def close(): Unit = ()
}
