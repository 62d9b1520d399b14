package graft.jobs

import graft.pipeline.BooksPipeline

/** spark-submit entry point for the TRANSFORM+LOAD+VALIDATE stage
  * (VERDICT r5 #5) — the runnable form of the reference's
  * `transform_task >> load_task` chain
  * (/root/reference/dags/bigbookapi.py:195): one Spark job over
  * [[graft.pipeline.BooksPipeline]] — raw JSONL → reference flatten →
  * idempotent parquet OVERWRITE → read-back validation. A failed
  * validation throws, the JVM exits non-zero, and the orchestrator's
  * retry fires — which is safe, because the load is an overwrite.
  *
  * Usage:
  * {{{
  * spark-submit --class graft.jobs.RunBooksPipeline graft-engine.jar \
  *   /data/books/raw/2026-01-01 /data/books/warehouse
  * }}}
  */
object RunBooksPipeline {

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: RunBooksPipeline <rawJsonlDir> <warehouseDir>")
    val spark = JobSession.get("graft-books-pipeline")
    try {
      val report = BooksPipeline.run(spark, args(0), args(1))
      println(s"[books-pipeline] raw=${report.rawRecords} " +
        s"transformed=${report.transformed} loaded=${report.loadedReadBack}")
    } finally JobSession.release(spark)
  }
}
