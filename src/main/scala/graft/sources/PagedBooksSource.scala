package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 batch source reproducing the reference's paginated-REST
  * ingest contract (S1, /root/reference/scripts/extract.py:31-72): a feed
  * consumed page by page at a fixed page size, each page independent of
  * the others.
  *
  * Spark mapping: ONE InputPartition PER PAGE — the pagination loop the
  * reference runs serially on one process becomes N independent partition
  * reads scheduled across executors (the re-architecture called out in
  * SURVEY.md §4.3: per-partition source reads instead of driver-side
  * accumulation). Retry-with-backoff (extract.py:36-39) belongs inside the
  * page reader against a real endpoint; the harness generator is
  * deterministic so the DuckDB oracle can recompute the feed from the same
  * formula.
  *
  * Usage:
  * `spark.read.format("graft.sources.PagedBooksSource")
  *   .option("rows", 1000).option("pageSize", 100).load()`
  *
  * Page fetching is a pluggable [[BooksTransport.Transport]]: the default
  * deterministic formula keeps the source oracle-checkable with no
  * network; `.option("transport", "http").option("baseUrl", …)`
  * (+ optional `apiKey`/`timeoutMs`) swaps in the JDK-HttpClient
  * implementation against a live endpoint — same partitioning, pushdown
  * and retry behavior either way.
  */
class PagedBooksSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedBooksTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedBooksTable
}

object PagedBooksTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("rating", DoubleType, nullable = false)))

  /** Observability hook for tests: rows planned by the latest scan (after
    * limit pushdown). */
  @volatile var lastPlannedRows: Long = -1L

  /** Observability hook for tests: transient-failure retries performed by
    * page readers since JVM start. */
  val retriesObserved = new java.util.concurrent.atomic.AtomicLong(0L)
}

class PagedBooksTable extends Table with SupportsRead {
  override def name(): String = "graft_paged_books"
  override def schema(): StructType = PagedBooksTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  /** The scan builder honors Catalyst pushdowns the way a real REST source
    * must to be efficient: column pruning (request only needed fields) and
    * limit pushdown — the DSv2 form of the reference's quota-cap early
    * stop (/root/reference/scripts/extract.py:61-64): a pushed LIMIT means
    * later pages are never fetched at all. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val totalRows = options.getLong("rows", 1000L)
    val pageSize = options.getLong("pageSize", 100L)
    // loud option validation (review r10): a negative pageSize would make
    // the page range empty and the scan silently return ZERO rows — an
    // empty-feed lie, not an error; pageSize=0 only dies later with an
    // opaque "step cannot be 0"
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    require(totalRows >= 0, s"rows must be non-negative, got $totalRows")
    // Fault-injection knobs for the E4 retry path (0 = healthy endpoint):
    // every flakyEvery-th page fails its first fetch attempt.
    val flakyEvery = options.getLong("flakyEvery", 0L)
    val backoffMs = options.getLong("backoffMs", 2000L)
    // Transport seam (VERDICT r5 #6): deterministic formula by default,
    // real HTTP via .option("transport","http").option("baseUrl",...).
    val spec = BooksTransport.TransportSpec(
      kind = Option(options.get("transport")).getOrElse("deterministic"),
      baseUrl = Option(options.get("baseUrl")).getOrElse(""),
      apiKey = Option(options.get("apiKey")).getOrElse(""),
      timeoutMs = options.getLong("timeoutMs", 10000L),
      trustStore = Option(options.get("trustStore")).getOrElse(""),
      trustStorePass = Option(options.get("trustStorePass")).getOrElse(""))
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit
        with Scan with Batch {
      private var prunedSchema: StructType = PagedBooksTable.Schema
      private var rowCap: Long = totalRows
      override def pruneColumns(required: StructType): Unit = prunedSchema = required
      override def pushLimit(n: Int): Boolean = { rowCap = math.min(rowCap, n.toLong); true }
      override def build(): Scan = this
      override def readSchema(): StructType = prunedSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        PagedBooksTable.lastPlannedRows = rowCap
        (0L until rowCap by pageSize)
          .map(off => PagePartition(off, math.min(pageSize, rowCap - off),
            prunedSchema.fieldNames,
            flakyFirstAttempt = flakyEvery > 0 && (off / pageSize) % flakyEvery == 0,
            backoffMs = backoffMs, spec = spec): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new PageReaderFactory
    }
  }
}

case class PagePartition(offset: Long, count: Long, fields: Array[String],
    flakyFirstAttempt: Boolean = false, backoffMs: Long = 2000L,
    spec: BooksTransport.TransportSpec = BooksTransport.TransportSpec())
    extends InputPartition

class PageReaderFactory extends PartitionReaderFactory {

  /** E4 (extract.py:36-39): transient source errors are retried with
    * exponential backoff INSIDE the partition reader — each page recovers
    * independently, no task failure, no stage retry. Deliberate divergence
    * from the reference's retry-FOREVER: a permanently dark endpoint
    * should fail the task (and surface through Spark's own task-retry
    * budget), not hang the job — so attempts are capped. Non-transient
    * errors abort immediately, matching extract.py's abort-on-other-errors
    * branch. */
  private val MaxAttempts = 4

  private def fetchWithRetry[A](p: PagePartition)(fetch: Int => A): A = {
    var attempt = 1
    var delay = p.backoffMs
    while (true) {
      try return fetch(attempt)
      catch {
        case _: java.io.IOException if attempt < MaxAttempts =>
          PagedBooksTable.retriesObserved.incrementAndGet()
          Thread.sleep(delay)
          delay *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      // Transport is built EXECUTOR-SIDE from the serializable spec; the
      // fault-injection wrapper sits above it so the retry path is
      // exercised identically for every transport kind.
      private val transport = p.spec.build()
      // Truncate to the REQUESTED count (review r10): pushLimit reports
      // full pushdown, so Catalyst drops the Limit operator — a server
      // that ignores/clamps the limit param and over-returns would
      // otherwise silently break LIMIT semantics. Short pages are fine
      // (fewer rows); long pages must be clamped client-side.
      private val page: IndexedSeq[BooksTransport.BookRecord] = fetchWithRetry(p) { attempt =>
        if (p.flakyFirstAttempt && attempt == 1)
          throw new java.io.IOException(s"transient failure at offset ${p.offset}")
        transport.fetchPage(p.offset, p.count)
      }.take(math.min(p.count, Int.MaxValue.toLong).toInt)
      private var i = -1
      override def next(): Boolean = { i += 1; i < page.length }
      override def get(): InternalRow = InternalRow.fromSeq(
        p.fields.toIndexedSeq.map { f =>
          val r = page(i)
          f match {
            case "id"     => r.id
            case "title"  => UTF8String.fromString(r.title)
            case "rating" => r.rating
          }
        })
      override def close(): Unit = ()
    }
  }
}
