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

  test("transport seam: explicit deterministic == default; bad specs fail loudly") {
    val explicit = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", 200).option("pageSize", 50)
      .option("transport", "deterministic").load()
    assert(explicit.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L until 200L))
    // http without baseUrl / unknown kind must abort the read, not hang:
    // the spec is validated executor-side at transport build time
    val noUrl = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", 10).option("transport", "http").load()
    assertThrows[org.apache.spark.SparkException](noUrl.count())
    val unknown = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", 10).option("transport", "carrier-pigeon").load()
    assertThrows[org.apache.spark.SparkException](unknown.count())
  }

  test("negative pageSize aborts loudly instead of silently returning an empty feed") {
    // (0 until rows by -100) is EMPTY — pre-guard, the scan planned zero
    // partitions and a bad option read as an empty feed (review r10)
    val bad = spark.read.format("graft.sources.PagedBooksSource")
      .option("rows", 1000).option("pageSize", -100).load()
    val e = intercept[Exception](bad.count())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("pageSize must be positive"), msgs)
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

  test("S5: hub catalog source — top-k by downloads matches a local model") {
    import graft.sources.HubModelsSource
    val top = HubModelsSource.topByDownloads(spark, 50).collect()
    assert(top.length == 50)
    // matches the client computed directly (driver-side ground truth)
    val want = HubModelsSource.DeterministicHub.listModels(Int.MaxValue)
      .sortBy(m => (-m.downloads, m.model_id)).take(50)
    assert(top.map(_.getAs[String]("model_id")).toSeq == want.map(_.model_id))
    // downloads strictly descending (formula is collision-free on 0..199)
    val d = top.map(_.getAs[Long]("downloads")).toSeq
    assert(d == d.sorted(Ordering[Long].reverse) && d.distinct.size == d.size)
    // schema carries the reference DDL's fields incl. typed tags + timestamp
    assert(top.head.schema.fieldNames.toSet ==
      Set("model_id", "author", "pipeline_tag", "tags", "downloads", "last_modified"))
  }

  test("S5→K6: hub catalog feeds the keep-latest upsert (reference DAG chain)") {
    import graft.sources.HubModelsSource
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // two catalog snapshots (day-0 fetch and a re-fetch with bumped
    // last_modified) unioned then deduped keep-latest on the PK — the
    // ON CONFLICT DO UPDATE semantics of huggingface_extract.pyc
    val s1 = HubModelsSource.read(spark)
    val s2 = s1.withColumn("last_modified",
      col("last_modified") + expr("INTERVAL 1 HOUR"))
    val merged = s1.union(s2)
      .withColumn("rn", row_number().over(
        Window.partitionBy("model_id")
          .orderBy(col("last_modified").desc, col("downloads").desc)))
      .filter(col("rn") === 1).drop("rn")
    assert(merged.count() == s1.count()) // one row per PK
    // every surviving row is the re-fetched (later) version
    val older = merged.as("m").join(s1.as("o"), "model_id")
      .filter(col("m.last_modified") <= col("o.last_modified")).count()
    assert(older == 0)
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
