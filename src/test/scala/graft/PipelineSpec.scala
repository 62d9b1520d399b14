package graft

import graft.pipeline.BooksPipeline
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end ETL of the reference DAG pair, on the golden fixture:
  * counts at every hop, 7-column warehouse schema, and idempotent re-run
  * (K6 posture — the reference's append-duplicates bug must NOT be
  * reproduced). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val out = "/tmp/graft_books_warehouse_test"

  test("extract -> transform -> load -> validate, then idempotent re-run") {
    val raw = getClass.getResource("/books/raw_books.jsonl").getPath
    val r1 = BooksPipeline.run(spark, raw, out)
    assert(r1 == BooksPipeline.EtlReport(9, 9, 9))
    val back = spark.read.parquet(out)
    assert(back.columns.sorted.toSeq ==
      Seq("author_id", "author_name", "genres", "id", "image", "rating", "title"))
    val r2 = BooksPipeline.run(spark, raw, out)
    assert(r2.loadedReadBack == r1.loadedReadBack, "re-run must not duplicate rows")
  }
}
