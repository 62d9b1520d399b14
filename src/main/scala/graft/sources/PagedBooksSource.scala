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

  /** Deterministic feed row `i` (the stand-in for one REST record). */
  def rowAt(i: Long): (Long, String, Double) =
    (i, s"book-$i", (i % 100) / 100.0)
}

class PagedBooksTable extends Table with SupportsRead {
  override def name(): String = "graft_paged_books"
  override def schema(): StructType = PagedBooksTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rows = options.getLong("rows", 1000L)
    val pageSize = options.getLong("pageSize", 100L)
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedBooksTable.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        (0L until rows by pageSize)
          .map(off => PagePartition(off, math.min(pageSize, rows - off)): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new PageReaderFactory
    }
  }
}

case class PagePartition(offset: Long, count: Long) extends InputPartition

class PageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var i = -1L
      override def next(): Boolean = { i += 1; i < p.count }
      override def get(): InternalRow = {
        val (id, title, rating) = PagedBooksTable.rowAt(p.offset + i)
        InternalRow(id, UTF8String.fromString(title), rating)
      }
      override def close(): Unit = ()
    }
  }
}
