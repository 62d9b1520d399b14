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

  test("E4: transient page failures recover via in-reader retry with backoff") {
    PagedBooksTable.retriesObserved.set(0L)
    val df = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", 500).option("pageSize", 100)
      .option("flakyEvery", 2).option("backoffMs", 1)
      .load()
    // every row arrives exactly once despite the injected failures
    assert(df.count() == 500)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (0L until 500L).sum)
    // pages 0, 2, 4 were flaky -> at least 3 retries observed
    assert(PagedBooksTable.retriesObserved.get() >= 3L)
  }
}
