package graft

import graft.sources.PagedBooksTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSourceV2 paginated source: content determinism, column pruning,
  * and limit pushdown (the quota-cap early stop — later pages are never
  * planned, let alone fetched). */
class SourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def feed = spark.read.format("graft.sources.PagedBooksSource")
    .option("rows", 1000).option("pageSize", 100).load()

  test("deterministic feed content and page partitioning") {
    val rows = feed.orderBy("id").limit(3).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(rows(1).getString(1) == "book-1")
    assert(feed.count() == 1000)
  }

  test("column pruning reaches the source (pruned ReadSchema)") {
    val plan = feed.select("rating").queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("graft_paged_books[rating#"),
      s"expected scan pruned to rating only, got: $scanLine")
    assert(!scanLine.contains("id#") && !scanLine.contains("title#"),
      s"scan still reads pruned-away columns: $scanLine")
  }

  test("limit pushdown stops page planning early (quota-cap semantics)") {
    PagedBooksTable.lastPlannedRows = -1L
    assert(feed.limit(42).collect().length == 42)
    assert(PagedBooksTable.lastPlannedRows == 42L,
      s"limit not pushed: planned ${PagedBooksTable.lastPlannedRows} rows")
  }
}
