package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event row for the streaming surface (schema = the `events` table
  * after [[graft.Tables.events]] µs normalization). */
final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double, props: String)

/** Typed document row for the streaming-dedup surface (the `documents`
  * table's (id, text) core). */
final case class DocRow(doc_id: Long, text: String)

/** Document row with the length column the curation quality rules read. */
final case class CurDocRow(doc_id: Long, text: String, n_chars: Long)

/** Structured Streaming surface (SURVEY.md §2.13): the incremental form of
  * the reference's append-only ingest + idempotent upsert
  * (/root/reference/dags/bigbookapi.py:51 daily batch;
  * /root/reference/dags/__pycache__/huggingface_extract.cpython-312.pyc
  * ON CONFLICT upsert).
  *
  * Every transform here takes a DataFrame/Dataset that may be EITHER a
  * `readStream` source or a static frame — the logical plan is identical,
  * which is what lets StreamingSpec assert stream-vs-batch equality
  * against the oracle-checked batch forms in [[graft.ops.EventOps]].
  *
  * Scale notes: state size is the whole game at 100 TB/day.
  *  - Watermarks bound every stateful operator (2 h here) so state is
  *    evicted, not accumulated;
  *  - tumbling windows keep one row per (window × type) — trivially small;
  *  - session windows and keep-latest keep one row per active user — the
  *    state store is hash-partitioned on the group key, the same shuffle
  *    the batch window form pays;
  *  - dedup-within-watermark holds only ids seen inside the watermark
  *    horizon, the streaming analogue of the band-bucket dedup.
  */
object StreamingOps {

  /** File landing-zone ingest — the STREAMING form of the reference's
    * raw-JSONL drop directory (`scripts/extract.py:76-78` writes the
    * feed as JSON files; the batch twin re-reads the whole dir each run):
    * Spark's file source discovers new files via the CHECKPOINT's seen-
    * files log, so each dropped file is processed exactly once across
    * restarts — the incremental-ingest contract a landing zone needs.
    * Schema is DECLARED (no inference on the hot path — inference would
    * re-list and sample the dir), and `maxFilesPerTrigger` bounds how
    * fast a backlog drains so a week of piled-up files can't produce one
    * giant micro-batch. At 100 TB the same source shape ingests from an
    * object-store prefix; file listing cost is the knob to watch
    * (partitioned drop dirs + `latestFirst` for catch-up). */
  def rawFeedStream(s: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType,
                    maxFilesPerTrigger: Int = 4): DataFrame =
    s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Tumbling 1-hour counts/sums per event type — streaming twin of
    * [[graft.ops.EventOps.eventsTumblingAgg]]. */
  def tumblingAgg(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Chained stateful aggregation (Spark 4: multiple stateful operators in
    * one append-mode plan): per-type MINUTELY counts, then an HOURLY
    * rollup of those minutely rows (minutes observed, peak minutely count,
    * total). Batch twin [[graft.ops.EventOps.eventsTwoLevelAgg]] is the
    * oracle-checked form. In streaming, the hourly agg windows over
    * `window_time(mw)` — NOT `mw.start`: projecting the raw start field
    * drops the event-time attribute, the hourly agg then has no watermark,
    * and append mode throws STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION.
    * `window_time` (= mw.end − 1 µs) keeps the attribute, so both levels'
    * state is watermark-bounded and closed hourly windows emit in append
    * mode; the containing hour is identical to windowing the minute start.
    * The second level's input is minute-cardinality, so its state is
    * trivially small at any event rate. */
  def twoLevelAgg(ev: DataFrame): DataFrame = {
    val minutely = ev.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 minute").as("mw"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    minutely
      .groupBy(window(window_time(col("mw")), "1 hour").as("hw"), col("event_type"))
      .agg(count(lit(1)).as("n_minutes"), max(col("n")).as("peak_minute_n"),
        sum(col("n")).as("total_n"))
      .select(col("hw.start").as("hour"), col("event_type"),
        col("n_minutes"), col("peak_minute_n"), col("total_n"))
  }

  /** 30-min-gap session windows per user — streaming twin of
    * [[graft.ops.EventOps.eventsSessionWindow]]. */
  def sessionAgg(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))

  /** Exactly-once-ish ingest dedup: drop event_id duplicates arriving
    * within the watermark horizon. */
  def dedupWithinWatermark(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-stream INTERVAL join: purchases landing within 30 minutes
    * after a view by the same user. Works on static frames too (same
    * logical plan — that is what the batch twin `events_interval_join`
    * oracle-checks). In streaming, BOTH sides carry watermarks and the
    * join condition bounds event-time distance, which is exactly what
    * lets the state store evict: a buffered view can only ever match
    * purchases ≤ 30 min after it, so once the purchase-side watermark
    * passes v_ts + 30 min the row is dropped. Unbounded stream-stream
    * joins (no time bound) accumulate state forever — at 100 TB/day the
    * interval bound IS the operator. */
  def viewPurchaseJoin(ev: DataFrame): DataFrame =
    viewPurchaseJoinOfType(ev, "inner")

  /** LEFT OUTER form: views with no purchase within the interval emit a
    * null-padded row — in streaming, only once the purchase-side
    * watermark passes v_ts + 30 min (the state-closure point at which
    * "no match" becomes definitive). StreamingSpec asserts exactly that:
    * matched rows match the batch twin immediately, null rows appear
    * precisely for watermark-closed views. */
  def viewPurchaseJoinLeft(ev: DataFrame): DataFrame =
    viewPurchaseJoinOfType(ev, "leftOuter")

  private def viewPurchaseJoinOfType(ev: DataFrame, joinType: String): DataFrame = {
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"),
        col("v_ts"), col("p_ts"))
  }

  /** Stream-STATIC enrichment join: each micro-batch of events joins a
    * static dimension (user tier derived from user_id here; in production
    * a slowly-changing dim table). No state, no watermark needed — the
    * static side is planned once per batch and broadcast when small,
    * which is the 100 TB shape too: the stream never shuffles, the dim
    * ships to it. */
  def enrichWithTier(ev: DataFrame, tiers: DataFrame): DataFrame =
    ev.join(org.apache.spark.sql.functions.broadcast(tiers), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("tier"), col("value"))

  /** Idempotent `foreachBatch` parquet sink: every micro-batch overwrites
    * ITS OWN batch_id partition (dynamic partition overwrite), so a
    * replayed batch — Structured Streaming re-runs a batch after any
    * failure between sink write and checkpoint commit — replaces its
    * previous output instead of appending duplicates. This is the
    * batch-level exactly-once recipe for non-transactional sinks, and at
    * 100 TB/day it is also the layout you want anyway: one partition per
    * batch makes retention drops and backfills partition-granular.
    * StreamingSpec replays a batch explicitly and asserts no dupes. */
  def idempotentBatchWriter(path: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)

  /** Streaming incremental dedup against the STORED MinHash postings —
    * the streaming face of `dedup_incremental` (and the consumer of
    * `build_minhash_index`'s artifact), shipped as a `foreachBatch` body:
    * `stream.writeStream.foreachBatch(dedupBatchAgainstIndex(ix, out,
    * "id", "text") _)`. Each micro-batch of (id, text) documents
    * shingles + signs ONLY itself, left-semi probes the persisted band
    * table, and lands (id, is_dup) through the idempotent
    * partition-per-batch sink. Per-batch cost is O(batch) against an
    * on-disk index the corpus wrote once; combined with the checkpoint
    * this is the full streaming-ingest dedup recipe — at-least-once
    * source replay × [[idempotentBatchWriter]] = exactly-once flags.
    * The index frame is bound per batch (read inside foreachBatch, so a
    * compacted/refreshed index is picked up at the next batch boundary,
    * not mid-query). Banding parameters must match the ones the index
    * was built with — [[graft.api.GraftAPI.minhashBands]] defaults on
    * both sides. */
  def dedupBatchAgainstIndex(indexBandsPath: String, outPath: String,
                             id: String, text: String,
                             numHashes: Int = 128, bands: Int = 16)
                            (batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    // geometry guard: a probe banded differently from the stored index
    // would return silently wrong flags; the manifest makes it loud
    Option(new java.io.File(indexBandsPath).getParent).foreach(root =>
      graft.ops.Artifacts.requireGeometry(root,
        "numHashes" -> numHashes.toString, "bands" -> bands.toString))
    val hits = fineUnionHits(indexBandsPath, batch, id, text,
      numHashes, bands).withColumn("is_dup", lit(true))
    val flags = batch.select(id).distinct()
      .join(hits, Seq(id), "left")
      .select(col(id), coalesce(col("is_dup"), lit(false)).as("is_dup"))
    idempotentBatchWriter(outPath)(flags, batchId)
  }

  /** Streaming incremental-curation verdict against the STORED base
    * artifacts — the `foreachBatch` twin of the registry's
    * `curation_incremental` (L18d), for the steady-state ingest where
    * documents arrive as a stream: each micro-batch gets quality /
    * exact-dup / near-dup / decontamination signals and the
    * first-failing-stage verdict, probing
    *
    *   - `baseFpsPath`: the base corpus's distinct text fingerprints
    *     (one `fp` column; tiny, broadcast),
    *   - `indexBandsPath`: the persisted base MinHash postings (same
    *     table [[dedupBatchAgainstIndex]] probes; geometry-guarded),
    *   - `evalShinglesPath`: the eval slice's shingle set (one `x`
    *     column; broadcast).
    *
    * Only the micro-batch tokenizes/shingles/signs; the stored side is
    * fixed-width scalar tables — per-batch cost O(batch), the corpus
    * never re-read. Results land through the idempotent
    * partition-per-batch sink (at-least-once replay ×
    * [[idempotentBatchWriter]] = exactly-once verdicts). StreamingSpec
    * pins stream == the one-shot registry op on the same batch. */
  /** Distinct batch ids whose band keys hit the stored postings under
    * the FINE-UNION probe (r12, the streaming mirror of the batch
    * `dedup_incremental`): cold buckets (< the index's recorded
    * `hotSize`) hit on (band, band_key); hot buckets hit only on a
    * full-signature sub_key match against the stored `bands_fine`
    * side-table, so a template-family bucket can't flag every doc that
    * grazes it. An index built before the fine table existed (no
    * `hotSize` in its meta) degrades to the coarse raw probe for every
    * bucket — old indexes keep their old semantics until rebuilt. */
  /** Resolved facade postings KEYS (band, band_key) — the streaming face
    * of [[graft.ops.MinhashIndex.resolvedPostings]] (r13, VERDICT r12
    * #1): committed `bands_compact` sibling when present, else `bands` ∪
    * every COMMITTED `bands_delta/batch=<k>` generation
    * ([[graft.api.GraftAPI.minhashIndexAppend]]'s layout — each append is
    * its own subdirectory whose Spark `_SUCCESS` commits last, so a
    * crashed append is invisible rather than half-read). A facade index
    * with no lifecycle siblings resolves to `bands` alone, byte-identical
    * to the pre-r13 probe. Artifacts bind per micro-batch (read inside
    * foreachBatch), so an append/compact is picked up at the next batch
    * boundary, not mid-query. */
  private def resolvedFacadeKeys(s: org.apache.spark.sql.SparkSession,
                                 indexBandsPath: String,
                                 baseDf: DataFrame): DataFrame = {
    val root = graft.ops.IndexFs.parent(indexBandsPath)
    val compact = graft.ops.IndexFs.child(root, "bands_compact")
    if (graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(compact, "_SUCCESS")))
      s.read.parquet(compact).select("band", "band_key")
    else {
      // `baseDf` arrives from the caller, which already opened the base
      // table — one footer-listing pass per micro-batch, not three
      // (review r13; object-store roots pay a LIST + footer fetch each).
      val base = baseDf.select("band", "band_key")
      val deltas = graft.ops.IndexFs
        .listDirs(graft.ops.IndexFs.child(root, "bands_delta"))
        .filter(d => graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(d, "_SUCCESS")))
      if (deltas.isEmpty) base
      // Declared schema (the bandsSchema rule, review r13): an appended
      // EMPTY batch commits a data-file-less generation, and inference
      // over a set of generations that are ALL data-file-less throws —
      // the resolver must serve base alone, not fail the micro-batch.
      // The delta layout coincides with the fine side-table's.
      else base.unionByName(
        s.read.schema(graft.ops.MinhashIndex.facadeFineSchema(baseDf.schema))
          .parquet(deltas: _*).select("band", "band_key"))
    }
  }

  private def fineUnionHits(indexBandsPath: String, batch: DataFrame,
                            id: String, text: String,
                            numHashes: Int, bands: Int): DataFrame = {
    val s = batch.sparkSession
    val root = graft.ops.IndexFs.parent(indexBandsPath)
    // The band table feeds BOTH probe legs; an eager localCheckpoint
    // materializes the micro-batch's tokenize+signature pipeline once
    // instead of twice per batch (the same double-compute hazard the
    // batch twin caches against), and its blocks are released when the
    // batch's RDD is GC'd — no cross-batch persist leak.
    val bt = graft.api.GraftAPI.minhashBandsWithSub(
      batch, id, text, numHashes, bands).localCheckpoint()
    // ONE base-table open per micro-batch (review r13): the frame feeds
    // the resolver's base branch AND both declared-schema sibling reads.
    val baseDf = s.read.parquet(indexBandsPath)
    // Probe keys come from the RESOLVER, so appended postings flag the
    // very next micro-batch's dups of them, compact or not (r13).
    val post = resolvedFacadeKeys(s, indexBandsPath, baseDf)
    (graft.ops.Artifacts.readMeta(root).get("hotSize") match {
      case Some(hotSize) =>
        // Hot/cold sizes on the RESOLVED keys: a bucket pushed over the
        // threshold by appended postings probes fine (the append refreshes
        // bands_fine — minhashIndexAppend's invariant — so its keys exist).
        val coldKeys = post
          .groupBy("band", "band_key").agg(count(lit(1)).as("sz"))
          .filter(col("sz") < hotSize.toLong).select("band", "band_key")
        val fineKeys = s.read
          .schema(graft.ops.MinhashIndex.facadeFineSchema(baseDf.schema))
          .parquet(graft.ops.IndexFs.child(root, "bands_fine"))
          .select("band", "band_key", "sub_key").distinct()
        bt.join(coldKeys, Seq("band", "band_key"), "left_semi").select(id)
          .union(bt.join(fineKeys, Seq("band", "band_key", "sub_key"),
            "left_semi").select(id))
      case None =>
        bt.join(post.distinct(), Seq("band", "band_key"), "left_semi")
          .select(id)
    }).distinct()
  }

  def curationVerdictBatch(indexBandsPath: String, baseFpsPath: String,
                           evalShinglesPath: String, outPath: String,
                           id: String, text: String, nChars: String,
                           numHashes: Int = 128, bands: Int = 16,
                           minChars: Long = 150, maxChars: Long = 450,
                           maxRep: Double = 2.5, contamMin: Double = 0.3)
                          (batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    Option(new java.io.File(indexBandsPath).getParent).foreach(root =>
      graft.ops.Artifacts.requireGeometry(root,
        "numHashes" -> numHashes.toString, "bands" -> bands.toString))
    val toks = split(col(text), " ")
    val qOk = col(nChars) >= minChars && col(nChars) <= maxChars &&
      size(toks).cast("double") / size(array_distinct(toks)) <= maxRep
    val baseFps = s.read.parquet(baseFpsPath)
      .select("fp").distinct().withColumn("seen", lit(true))
    val nearHits = fineUnionHits(indexBandsPath, batch, id, text,
      numHashes, bands).withColumn("near", lit(true))
    val evalSet = s.read.parquet(evalShinglesPath).select("x").distinct()
    val sh = graft.api.GraftAPI.shingleRows(batch, id, text)
    val tot = sh.groupBy(id).agg(count(lit(1)).as("n_shingles"))
    val hits = sh.join(broadcast(evalSet), "x")
      .groupBy(id).agg(count(lit(1)).as("n_overlap"))
    val cont = tot.join(hits, id)
      .filter(graft.Tables.r6(
        col("n_overlap").cast("double") / col("n_shingles")) >= contamMin)
      .select(id).withColumn("cont", lit(true))
    val out = batch.select(col(id), qOk.as("q_ok"), md5(col(text)).as("fp"))
      .join(broadcast(baseFps), Seq("fp"), "left")
      .join(nearHits, Seq(id), "left")
      .join(cont, Seq(id), "left")
      .select(col(id), col("q_ok"),
        coalesce(col("seen"), lit(false)).as("exact_dup"),
        coalesce(col("near"), lit(false)).as("near_dup"),
        coalesce(col("cont"), lit(false)).as("contaminated"))
      .select(col(id), col("q_ok"), col("exact_dup"), col("near_dup"),
        col("contaminated"),
        when(!col("q_ok"), "quality")
          .when(col("exact_dup"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .when(col("contaminated"), "contaminated")
          .otherwise("keep").as("verdict"))
    idempotentBatchWriter(outPath)(out, batchId)
  }

  /** Streaming ANN probe against the STORED IVF index — the serving face
    * of `build_ivfpq_index`'s artifact, shipped as a `foreachBatch` body:
    * `queries.writeStream.foreachBatch(annProbeBatch(corpusPath, ixRoot,
    * out, "qid", "qvec") _)`. Each micro-batch of (id, vector) queries is
    * coarse-assigned against the stored centroid table (broadcast-argmin
    * over the tiny batch), joins ONLY its assigned cells' corpus vectors
    * — with a cell-partitioned corpus layout at 100 TB that join is a
    * partition-pruned scan, never the full corpus — and lands per-query
    * cosine top-k through the idempotent partition-per-batch sink
    * (at-least-once replay × [[idempotentBatchWriter]] = exactly-once
    * results). Scores are EXACT over the probed pool; the pool is the
    * assigned cell, or — when the index root carries a committed cell
    * split (r12) — that cell's nearest sub-cells, which is approximate
    * at the cell level exactly like narrowing nprobe (pool ≥ k enforced
    * via whole-cell fallback; retire `_split_SUCCESS` to restore
    * whole-cell pools). Index and corpus frames are bound per batch
    * (read inside foreachBatch), so a re-trained/compacted/re-split
    * index is picked up at the next batch boundary, not mid-query. */
  def annProbeBatch(corpusPath: String, indexRoot: String, outPath: String,
                    qId: String, qVec: String,
                    cId: String = "vec_id", cVec: String = "embedding",
                    k: Int = 10)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val coarse = s.read.parquet(s"$indexRoot/coarse")
    // Pool membership through the probe-root resolver (r13, the ANN
    // mirror of the dedup twins' resolution): a committed codes compact
    // (one (vec_id, cell) row per vector at m = 0), else the cells table
    // ∪ any committed codes delta — so a vector appended against the
    // stored codebooks is servable from the very next micro-batch. An
    // append into a SPLIT cell is served through the whole-cell/fallback
    // paths after the next split refresh (the maintenance job); unsplit
    // cells serve appends immediately.
    val cells = {
      // Declared schema (review r13, the codesSchema rule): a corpus
      // whose held-out slice is empty commits a data-file-less delta,
      // and inference on it would fail every micro-batch — the resolver
      // must serve the cells table alone, not crash the probe.
      def m0(path: String) = s.read
        .schema(graft.ops.VectorOps.codesSchema).parquet(path)
        .filter(col("m") === 0).select("vec_id", "cell")
      val compact = graft.ops.IndexFs.child(indexRoot, "ivfpq_codes_compact")
      val delta = graft.ops.IndexFs.child(indexRoot, "ivfpq_codes_delta")
      if (graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(compact, "_SUCCESS"))) m0(compact)
      else if (graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(delta, "_SUCCESS")))
        s.read.parquet(s"$indexRoot/cells").unionByName(m0(delta))
      else s.read.parquet(s"$indexRoot/cells")
    }
    def dot2(a: Column, b: Column) = graft.functions.VectorFunctions.graftDot(a, b)
    val q = batch.select(col(qId).as("query_id"),
      col(qVec).cast("array<double>").as("qx"))
    // geometry guard: a query whose dimensionality differs from the
    // trained index would score garbage distances; the stored manifest
    // makes it a loud failure on the (tiny) batch instead. The WHOLE
    // batch is validated (ADVICE r8 — min==max==dim in one aggregate
    // over the micro-batch), not just its first row: a batch mixing
    // correct- and wrong-width vectors must fail, not score silently.
    graft.ops.Artifacts.readMeta(indexRoot).get("dim").foreach { d =>
      // min/max over size() SKIP null rows (review r10), so null vectors
      // are counted explicitly — a null query must fail loudly here, not
      // argmin to an arbitrary lowest-cid cell and return garbage.
      q.agg(min(size(col("qx"))).as("lo"), max(size(col("qx"))).as("hi"),
          sum(when(col("qx").isNull, 1L).otherwise(0L)).as("nnull"))
        .take(1).foreach { r =>
          require(r.getLong(2) == 0L,
            s"batch contains ${r.getLong(2)} null query vector(s); " +
              s"index at $indexRoot serves dim=$d vectors")
          if (!r.isNullAt(0)) require(r.getInt(0) == d.toInt && r.getInt(1) == d.toInt,
            s"index at $indexRoot serves dim=$d vectors; batch has " +
              s"dims in [${r.getInt(0)}, ${r.getInt(1)}]")
        }
    }
    val qa = graft.ops.VectorOps.assignCells(
        q.select(col("query_id").as("vec_id"), col("qx").as("x")), coarse)
      .select(col("vec_id").as("query_id"), col("cell").as("qcell"))
    val qfull = broadcast(q.join(qa, "query_id"))
    // Split-aware candidate pool (r12): when the index root carries a
    // COMMITTED cell split (`_split_SUCCESS` — artifacts bind per batch,
    // like a compacted/re-trained index), a query landing in a split
    // cell scans only its nearest sub-cells instead of max_cell
    // vectors, with the same per-query pool >= k floor the batch probe
    // enforces (whole-cell fallback). Unsplit indexes and unsplit cells
    // keep the exact pre-split pool.
    val cand: DataFrame =
      if (!graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(indexRoot, "_split_SUCCESS"))) {
        cells.join(qfull, col("cell") === col("qcell"))
          .select(col("query_id"), col("qx"), col("vec_id"))
      } else {
        def sq(x: Column, cv: Column): Column =
          graft.Tables.r6(dot2(x, x) - lit(2) * dot2(x, cv) + dot2(cv, cv))
        val splitCents = s.read
          .schema(graft.ops.VectorOps.splitCentsSchema)
          .parquet(s"$indexRoot/coarse_split")
        val splitCells = s.read
          .schema(graft.ops.VectorOps.splitCellsSchema)
          .parquet(s"$indexRoot/cells_split")
        val splitGs = broadcast(splitCents
          .select(col("cell").as("scell")).distinct())
        val qres = qfull.join(broadcast(coarse), col("qcell") === col("cid"))
          .select(col("query_id"), col("qcell"),
            zip_with(col("qx"), col("cv"),
              (a, b) => graft.Tables.r6(a - b)).as("qrx"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("d").asc, col("scid").asc)
        val topPer = broadcast(splitCents
          .join(broadcast(qres), col("cell") === col("qcell"))
          .select(col("query_id"), col("cell"), col("scid"),
            sq(col("qrx"), col("scv")).as("d"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= graft.ops.VectorOps.SplitProbes)
          .select(col("query_id"), col("cell"), col("scid")))
        // ONE scan of cells_split serves both the pool count and the
        // candidate set (review r12): the matched frame is pool-sized
        // (probed sub-cells' members), so an eager localCheckpoint is
        // cheap and halves the side-table I/O per micro-batch.
        val matched = splitCells
          .join(topPer, Seq("cell", "scid"))
          .select(col("query_id"), col("vec_id"))
          .localCheckpoint()
        val poolPer = broadcast(matched
          .groupBy(col("query_id")).agg(count(lit(1)).as("pool")))
        val candRaw = cells.join(qfull, col("cell") === col("qcell"))
          .join(splitGs, col("qcell") === col("scell"), "left_anti")
          .select(col("query_id"), col("qx"), col("vec_id"))
        val candSplit = matched
          .join(poolPer.filter(col("pool") >= k), "query_id")
          .join(qfull.select(col("query_id").as("qid2"), col("qx")),
            col("query_id") === col("qid2"))
          .select(col("query_id"), col("qx"), col("vec_id"))
        // pool < k (or 0 — no row in poolPer): whole split cell
        val underfilled = broadcast(qfull
          .join(splitGs, col("qcell") === col("scell"), "left_semi")
          .join(poolPer, Seq("query_id"), "left")
          .filter(coalesce(col("pool"), lit(0L)) < k)
          .select(col("query_id"), col("qx"), col("qcell")))
        val candWide = cells
          .join(underfilled, col("cell") === col("qcell"))
          .select(col("query_id"), col("qx"), col("vec_id"))
        candRaw.unionByName(candSplit).unionByName(candWide)
      }
    val scored = s.read.parquet(corpusPath)
      .select(col(cId).as("corpus_id"), col(cVec).cast("array<double>").as("cx"))
      .join(cand, col("corpus_id") === col("vec_id"))
      .select(col("query_id"), col("corpus_id"),
        graft.Tables.r6(dot2(col("cx"), col("qx")) /
          (sqrt(dot2(col("cx"), col("cx"))) * sqrt(dot2(col("qx"), col("qx")))))
          .as("cosine"))
    val topk = graft.api.GraftAPI
      .topKPerGroup(scored, Seq("query_id"), "cosine", "corpus_id", k)
    idempotentBatchWriter(outPath)(topk, batchId)
  }

  /** Streaming ANN index APPEND against the STORED codebooks — the
    * `foreachBatch` twin of the registry's `ann_index_append` (L3j) and
    * the streaming face of [[graft.jobs.DailyIncrement]]'s ANN leg, for
    * the steady-state ingest where vectors arrive as a stream: each
    * micro-batch of (id, vector) rows is coarse-assigned via the
    * persisted centroid table and residual-encoded via the persisted
    * residual codebooks — NO retraining, the deterministic-codebook
    * append contract — and its (vec_id, m, code, cell) rows land through
    * the idempotent partition-per-batch sink (at-least-once source
    * replay × [[idempotentBatchWriter]] = exactly-once index rows).
    * The delta arrives partitioned by batch_id (retention/backfill
    * granular); a compaction job folds it into the cell-partitioned base
    * exactly like `ann_index_compact`. Per-batch cost: two broadcast
    * joins over the micro-batch + one write — the corpus floats and the
    * stored base codes are never read. Codebook tables are bound per
    * batch (read inside foreachBatch), so a re-trained index is picked
    * up at the next batch boundary, not mid-query. Dim geometry is
    * whole-batch-guarded like [[annProbeBatch]] (ADVICE r8: a batch
    * mixing correct- and wrong-width vectors must fail, not encode
    * silently). */
  def annAppendBatch(indexRoot: String, outPath: String,
                     id: String, vec: String)
                    (batch: DataFrame, batchId: Long): Unit = {
    import graft.ops.VectorOps.{PqM, PqSub}
    val s = batch.sparkSession
    val e = batch.select(col(id).as("vec_id"),
      col(vec).cast("array<double>").as("x"))
    graft.ops.Artifacts.readMeta(indexRoot).get("dim").foreach { d =>
      // Null vectors are counted explicitly (review r10): min/max over
      // size() skip null rows, and a null vector would otherwise encode
      // silently — null residuals argmin to an arbitrary lowest-cid
      // codebook entry and a fabricated code row lands in the delta.
      e.agg(min(size(col("x"))).as("lo"), max(size(col("x"))).as("hi"),
          sum(when(col("x").isNull, 1L).otherwise(0L)).as("nnull"))
        .take(1).foreach { r =>
          require(r.getLong(2) == 0L,
            s"batch contains ${r.getLong(2)} null vector(s); " +
              s"index at $indexRoot encodes dim=$d vectors")
          if (!r.isNullAt(0)) require(r.getInt(0) == d.toInt && r.getInt(1) == d.toInt,
            s"index at $indexRoot encodes dim=$d vectors; batch has " +
              s"dims in [${r.getInt(0)}, ${r.getInt(1)}]")
        }
    }
    val coarse = s.read.parquet(s"$indexRoot/coarse")
    val books = s.read.parquet(s"$indexRoot/ivfpq_codebooks")
    // Lazy persist (review r10): the assignment feeds TWO consumers (the
    // residual join and the final code join) on a per-trigger hot path —
    // without the pin every micro-batch pays the broadcast-argmin twice.
    // The single sink write materializes both branches in one job;
    // unpersisted after the write (foreachBatch owns the lifecycle).
    val bCells = graft.ops.VectorOps.assignCells(e, coarse).persist()
    val remLong = e.join(bCells, "vec_id")
      .join(broadcast(coarse), col("cell") === col("cid"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("x"), col("cv"), (a, b) => graft.Tables.r6(a - b)).as("rx"))
      .select(col("vec_id"), posexplode(array((0 until PqM).map(m =>
        slice(col("rx"), m * PqSub + 1, PqSub)): _*)))
      .select(col("vec_id"), col("pos").cast("int").as("m"), col("col").as("x"))
    val codes = graft.ops.VectorOps
      .assignCellsLong(remLong.select("m", "vec_id", "x"), books)
      .select(col("vec_id"), col("m"), col("cell").as("code"))
      .join(bCells, "vec_id")
      .select(col("vec_id"), col("m"), col("code"), col("cell"))
    try idempotentBatchWriter(outPath)(codes, batchId)
    finally bCells.unpersist(false)
  }

  /** Query-vector row for the streaming ANN probe spec. */
  final case class VecRow(vec_id: Long, embedding: Seq[Double])

  /** Closed session emitted by the custom sessionizer (epoch-µs bounds). */
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L

  private val GapUs = 30L * 60 * 1000000

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * operator you write when built-in `session_window` can't express the
    * state machine (per-session enrichment, abandonment timers, …). State
    * per user = the open session; a ≥30-min gap closes it and emits. In
    * batch mode each group arrives complete (unordered — hence the sort)
    * and every session closes at group end; in streaming the same function
    * runs incrementally with the state store holding the open session.
    * Cross-batch late arrivals (an event OLDER than the open session's
    * end) merge with MONOTONE bounds — min/max, never assignment — so a
    * late event can widen the open session backwards but can never drag
    * `end_us` back and corrupt the next event's gap decision (review r10).
    * A straggler a FULL gap older than the open session's start belongs
    * to an earlier, implicitly-closed session — it emits as its own
    * closed single-event session instead of gluing across a ≥30-min gap
    * (the one approximation O(1) state allows: two such stragglers
    * within a gap of EACH OTHER emit as two sessions where a full replay
    * would merge them; exactness under arbitrary reordering needs a
    * watermark reorder buffer, see [[OrderedTransitionsProcessor]]).
    * In batch the per-group sort makes all three rules no-ops. */
  def sessionizeCustom(ev: Dataset[Ev]): Dataset[Session] = {
    val sq = ev.sparkSession; import sq.implicits._
    val streaming = ev.isStreaming // plan property — resolve driver-side, not in the closure
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[Session], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Option[Session]]) =>
          val closed = Seq.newBuilder[Session]
          var open: Option[Session] = state.getOption.flatten
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val t = micros(e.ts)
            open = open match {
              // beyond-reorder straggler: ≥ a full gap OLDER than the open
              // session's start — its own session, never a merge (the
              // signed gap check below would otherwise glue it across
              // hours). `<=`, not `<` (ADVICE r10): at exactly one full
              // gap the batch split rule (gap >= GapUs) closes, so the
              // straggler guard must too — `<` let the boundary case fall
              // through and glue. Unreachable in batch (per-group sort).
              case Some(s) if t <= s.start_us - GapUs =>
                closed += Session(uid, t, t, 1)
                Some(s)
              case Some(s) if t - s.end_us < GapUs =>
                Some(s.copy(start_us = math.min(s.start_us, t),
                  end_us = math.max(s.end_us, t), n_events = s.n_events + 1))
              case Some(s) =>
                closed += s
                Some(Session(uid, t, t, 1))
              case None =>
                Some(Session(uid, t, t, 1))
            }
          }
          state.update(open)
          // Batch: the group is complete, so the open session is final.
          // Streaming: it stays in state until a later batch closes it.
          val tail = if (!streaming) open.toSeq else Nil
          (closed.result() ++ tail).iterator
      }
  }

  /** Output row of [[runningTotalTws]]: cumulative spend per user in
    * exact integer cents (no FP accumulation drift in state). */
  final case class RunningTotal(event_id: Long, user_id: Long, total_cents: Long)

  /** Per-user running total on the `transformWithState` arbitrary-state
    * API (Spark 4's successor to `mapGroupsWithState`: typed state
    * handles, TTL, timers, RocksDB-backed). State = ONE long per user —
    * cents, not doubles, so replay/re-run accumulate bit-identically.
    * Rows within a micro-batch are processed in (ts, event_id) order;
    * with an event-time-ordered feed the stream output equals the batch
    * cumulative-sum window ([[graft.ops.EventOps.eventsRunningTotal]],
    * the oracle-checked twin). Batch execution runs the same processor
    * with each group arriving complete. */
  class RunningTotalProcessor extends StatefulProcessor[Long, Ev, RunningTotal] {
    @transient private var total: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[RunningTotal] = {
      var acc = if (total.exists()) total.get() else 0L
      val out = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
        // HALF_UP like the batch twin's decimal(12,2) cast (review r10):
        // math.round is half-toward-+inf, so a negative half-cent amount
        // (a -0.125 refund) rounded -12.5 -> -12 while the batch gives
        // -13 — the pinned stream==batch invariant drifted by a cent.
        acc += java.math.BigDecimal.valueOf(e.value)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        RunningTotal(e.event_id, uid, acc)
      }
      total.update(acc)
      out.iterator
    }
  }

  def runningTotalTws(ev: Dataset[Ev]): Dataset[RunningTotal] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** One behavioral transition emitted by [[transitionsStream]]. */
  final case class Transition(user_id: Long, prev_type: String, event_type: String)

  /** E10's streaming form — stateful PAIRWISE emission: state is the
    * user's single most recent event; every arriving event emits the
    * (prev_type, event_type) pair and replaces the state, so a
    * micro-batch boundary between two events of one user loses nothing.
    * Downstream, the append stream of pairs feeds the same count/
    * probability aggregation as the batch matrix
    * ([[graft.ops.EventOps.eventsTransitions]] — StreamingSpec asserts
    * the aggregated equality). O(1) state per user, same discipline as
    * [[latestByUser]].
    *
    * Late-arrival contract (review r10): with one event of state, a
    * cross-batch late arrival (event-time OLDER than the stored prev)
    * cannot recover the pairs an exact replay would produce — that needs
    * the watermark-buffered [[transitionsTwsOrdered]]. What this op
    * guarantees instead: every emitted pair is ordered by EVENT time
    * (never a fabricated reversed transition), and the state is always
    * the user's latest-by-event-time event (a late straggler never
    * displaces a newer prev). In-order feeds are exact. */
  def transitionsStream(ev: Dataset[Ev]): Dataset[Transition] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[Option[Ev], Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[Option[Ev]]) =>
          def key(e: Ev): (Long, Long) = (micros(e.ts), e.event_id)
          var prev: Option[Ev] = state.getOption.flatten
          val out = Seq.newBuilder[Transition]
          it.toSeq.sortBy(key).foreach { e =>
            prev.foreach { p =>
              val (a, b) =
                if (Ordering[(Long, Long)].lteq(key(p), key(e))) (p, e) else (e, p)
              out += Transition(uid, a.event_type, b.event_type)
            }
            if (prev.forall(p => Ordering[(Long, Long)].lteq(key(p), key(e))))
              prev = Some(e)
          }
          state.update(prev)
          out.result().iterator
      }
  }

  /** EXACT out-of-order transitions — the watermark-buffered form of
    * [[transitionsStream]]: per-user events are buffered in LIST state
    * until the event-time watermark passes them, then flushed in (ts,
    * event_id) order with the last-flushed event carried in VALUE state,
    * so the emitted pair sequence equals the batch matrix's full-ordered
    * adjacent pairs for ANY arrival order the watermark admits. This is
    * the standard reorder-buffer construction: state per user is O(events
    * inside the watermark delay), not O(history), because every flush
    * drains the ≤-watermark prefix. Input-driven flushes handle active
    * keys; an event-time TIMER (re-armed at the oldest still-buffered
    * event) drains the tail of keys that stop receiving input — the same
    * watermark-driven-output discipline as [[AbandonedSessionProcessor]].
    * StreamingSpec feeds deliberately shuffled micro-batches and asserts
    * exact pair-multiset equality with the in-order model. */
  class OrderedTransitionsProcessor extends StatefulProcessor[Long, Ev, Transition] {
    private type BufEv = (Long, Long, String) // (event µs, event_id, event_type)
    @transient private var buf: ListState[BufEv] = _
    @transient private var last: ValueState[BufEv] = _
    private def tupleEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.STRING)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[BufEv]("buf", tupleEnc, TTLConfig.NONE)
      last = getHandle.getValueState[BufEv]("last", tupleEnc, TTLConfig.NONE)
    }
    /** Drains buffered events whose event time is STRICTLY below the
      * watermark millisecond, in event-time order; re-arms the flush
      * timer if anything remains. Strict, not ≤ (review r10): Spark's
      * late-row admission is evaluated at millisecond granularity, so an
      * event AT the watermark ms may still gain an admissible same-ms
      * sibling with a smaller (ts, event_id) key in a later batch —
      * flushing it early would emit that sibling as a reversed pair. An
      * event drains only once the watermark strictly passes its ms (the
      * re-arm at head+1 guarantees the timer lands there). */
    private def flush(uid: Long, wmMs: Long): Iterator[Transition] = {
      val all = buf.get().toSeq.sortBy(e => (e._1, e._2))
      val (ripe, rest) = all.partition(_._1 / 1000 < wmMs)
      def rearm(): Unit =
        if (rest.nonEmpty) getHandle.registerTimer(rest.head._1 / 1000 + 1)
      if (ripe.isEmpty) { rearm(); return Iterator.empty }
      val out = Seq.newBuilder[Transition]
      var p: Option[BufEv] = if (last.exists()) Some(last.get()) else None
      ripe.foreach { e =>
        p.foreach(pp => out += Transition(uid, pp._3, e._3))
        p = Some(e)
      }
      p.foreach(last.update)
      if (rest.isEmpty) buf.clear()
      else { buf.put(rest.toArray); rearm() }
      out.result().iterator
    }
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Transition] = {
      rows.foreach(e => buf.appendValue((micros(e.ts), e.event_id, e.event_type)))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      flush(uid, tv.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Transition] =
      flush(uid, tv.getCurrentWatermarkInMs())
  }

  /** [[transitionsStream]] with exact event-time ordering under
    * out-of-order arrival (10-min watermark reorder buffer). */
  def transitionsTwsOrdered(ev: Dataset[Ev]): Dataset[Transition] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new OrderedTransitionsProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** EXACT out-of-order sessionization — the reorder-buffer construction
    * of [[OrderedTransitionsProcessor]] applied to the 30-min-gap session
    * machine, replacing [[sessionizeCustom]]'s O(1)-state approximations
    * with watermark-exact semantics: buffered events drain strictly below
    * the watermark ms in (ts, event_id) order into the gap machine (VALUE
    * state = the open session), and the open session CLOSES only once the
    * watermark proves no admissible event can merge (wm − end ≥ gap) —
    * so the emitted closed-session stream equals the batch machine run
    * over the fully ordered feed, for any arrival order the watermark
    * admits. Timers re-arm at the earliest future decision point: the
    * oldest still-buffered event's ms (more to drain) or the open
    * session's close boundary (end + gap), whichever comes first — a
    * quiet key still closes its last session, and state per key is
    * O(events inside the watermark delay) + one open session. */
  class OrderedSessionProcessor extends StatefulProcessor[Long, Ev, Session] {
    private type OpenS = (Long, Long, Long) // (start_us, end_us, n_events)
    @transient private var buf: ListState[(Long, Long)] = _ // (event µs, event_id)
    @transient private var open: ValueState[OpenS] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, Long)]("buf",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
      open = getHandle.getValueState[OpenS]("open",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    }
    private def flush(uid: Long, wmMs: Long): Iterator[Session] = {
      val all = buf.get().toSeq.sorted
      val (ripe, rest) = all.partition(_._1 / 1000 < wmMs)
      val out = Seq.newBuilder[Session]
      var cur: Option[OpenS] = if (open.exists()) Some(open.get()) else None
      ripe.foreach { case (t, _) =>
        cur = cur match {
          // ripe is sorted and the open session's end is always the max
          // seen, so t ≥ end here — plain forward gap logic, no min/max
          case Some((s0, e0, n)) if t - e0 < GapUs => Some((s0, math.max(e0, t), n + 1))
          case Some(s) => out += Session(uid, s._1, s._2, s._3); Some((t, t, 1L))
          case None => Some((t, t, 1L))
        }
      }
      // Close once UNREACHABLE: every admissible event has ts above the
      // watermark, so gap-from-end is at least wm − end; ≥ gap means no
      // admissible event can ever merge. (Conservative by < 1 ms — the
      // watermark's sub-ms remainder — which only delays the close to
      // the next watermark advance, never changes the session.) A still-
      // buffered rest event can never merge either: its ts ≥ wm ms.
      cur.foreach { case (s0, e0, n) =>
        if (wmMs * 1000 - e0 >= GapUs) {
          out += Session(uid, s0, e0, n)
          cur = None
        }
      }
      cur match { case Some(c) => open.update(c); case None => open.clear() }
      if (rest.isEmpty) buf.clear() else buf.put(rest.toArray)
      val nextDecision =
        rest.headOption.map(_._1 / 1000 + 1).toSeq ++
          cur.map { case (_, e0, _) => (e0 + GapUs) / 1000 + 1 }.toSeq
      if (nextDecision.nonEmpty) getHandle.registerTimer(nextDecision.min)
      out.result().iterator
    }
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Session] = {
      rows.foreach(e => buf.appendValue((micros(e.ts), e.event_id)))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      flush(uid, tv.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] =
      flush(uid, tv.getCurrentWatermarkInMs())
  }

  /** [[sessionizeCustom]] with watermark-exact out-of-order semantics
    * (10-min reorder buffer; emits CLOSED sessions only). */
  def sessionizeTwsOrdered(ev: Dataset[Ev]): Dataset[Session] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new OrderedSessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  private val byRecency: Ordering[Ev] =
    Ordering.by(e => (e.ts.getTime, e.ts.getNanos, e.event_id))

  /** K6 keep-latest upsert as explicit streaming state: one Ev of state
    * per user, replaced whenever a later event arrives — the
    * `mapGroupsWithState` form of the batch window-dedup
    * [[graft.ops.EventOps.upsertLatestByKey]]. Runs in batch too (state
    * starts empty, each group folds once). */
  def latestByUser(ev: Dataset[Ev]): Dataset[Ev] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.groupByKey(_.user_id)
      .mapGroupsWithState[Ev, Ev](GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Ev], state: GroupState[Ev]) =>
          val latest = (state.getOption.iterator ++ it).max(byRecency)
          state.update(latest)
          latest
      }
  }

  /** Versioned top-k snapshot emitted by [[topPurchasesTws]]. */
  final case class TopPurchases(user_id: Long, version: Long, top: Seq[Double])

  /** Per-user top-3 purchase values on `transformWithState` with LIST
    * state — the bounded-buffer leaderboard shape (alerting on "new
    * personal best", serving per-key top-N features). State per user is
    * the k-element value list plus a version counter (two typed state
    * variables on one handle); each micro-batch that contains purchases
    * re-emits the merged top-k with a bumped version, so the LAST version
    * per user is the complete answer and earlier ones are the audit
    * trail. State stays O(k) per user forever — the streaming analogue
    * of the native TopKPerGroup partial buffer. */
  class TopPurchasesProcessor extends StatefulProcessor[Long, Ev, TopPurchases] {
    @transient private var top: ListState[Double] = _
    @transient private var ver: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[Double]("top",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
      ver = getHandle.getValueState[Long]("ver",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[TopPurchases] = {
      val incoming = rows.filter(_.event_type == "purchase").map(_.value).toSeq
      if (incoming.isEmpty) Iterator.empty
      else {
        val merged = (top.get().toSeq ++ incoming)
          .sorted(Ordering[Double].reverse).take(3)
        top.put(merged.toArray)
        val v = (if (ver.exists()) ver.get() else 0L) + 1
        ver.update(v)
        Iterator.single(TopPurchases(uid, v, merged))
      }
    }
  }

  def topPurchasesTws(ev: Dataset[Ev]): Dataset[TopPurchases] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(new TopPurchasesProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Abandoned-session alert emitted by [[abandonedSessionsTws]] when the
    * event-time watermark passes a user's last activity + 30 min. */
  final case class SessionAlert(user_id: Long, last_seen_us: Long, n_events: Long)

  /** EVENT-TIME TIMERS on `transformWithState` — the remaining piece of the
    * arbitrary-state API after value/list/map state: emit an alert when a
    * key goes QUIET, i.e. output triggered by the ABSENCE of input (cart
    * abandonment, heartbeat loss, SLA breach). No input-driven operator
    * can express this — only a watermark-driven timer can, because nothing
    * else runs for the key.
    *
    * Mechanics: every batch of input re-arms a timer at last_seen + 30 min
    * (the previous timer is deleted — one live timer per key); when the
    * event-time watermark passes the armed expiry, `handleExpiredTimer`
    * fires, emits the alert, and CLEARS the state — so state is bounded by
    * ACTIVE keys only, the property that matters at 100 TB/day (an
    * inactive user costs nothing after their alert fires). A stale timer
    * that survives a delete race is ignored by re-checking expiry against
    * current state. */
  class AbandonedSessionProcessor extends StatefulProcessor[Long, Ev, SessionAlert] {
    private val GapMs = 30L * 60 * 1000
    @transient private var last: ValueState[(Long, Long)] = _ // (last_us, n_events)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, Long)]("last",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessionAlert] = {
      var (lastUs, n) = if (last.exists()) last.get() else (0L, 0L)
      val hadState = n > 0
      rows.foreach { e =>
        val t = micros(e.ts)
        if (t > lastUs) lastUs = t
        n += 1
      }
      if (hadState) getHandle.listTimers().foreach(ts =>
        getHandle.deleteTimer(ts.asInstanceOf[Long]))
      last.update((lastUs, n))
      getHandle.registerTimer(lastUs / 1000 + GapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionAlert] = {
      if (!last.exists()) Iterator.empty
      else {
        val (lastUs, n) = last.get()
        if (info.getExpiryTimeInMs() >= lastUs / 1000 + GapMs) {
          last.clear()
          Iterator.single(SessionAlert(uid, lastUs, n))
        } else Iterator.empty // stale timer from a pre-update arm
      }
    }
  }

  /** Alert stream of users whose sessions went quiet for ≥ 30 min of
    * EVENT time. Input must carry a watermark on `ts` (the timer clock). */
  def abandonedSessionsTws(ev: Dataset[Ev]): Dataset[SessionAlert] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new AbandonedSessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Running per-(user, event_type) count emitted by [[typeCountsTws]]. */
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user event-type counters on `transformWithState` with MAP
    * state — the per-key feature-counter shape (per-user action
    * histograms for feature stores). State is a (type → count) map per
    * user; each batch emits the UPDATED counters only, so counts are
    * monotone per (user, type) and the max observed emission equals the
    * final count. MapState keeps per-entry storage (RocksDB key = user ×
    * map key), so one hot user with many types never rewrites a whole
    * blob — the reason to prefer MapState over ValueState[Map]. */
  class TypeCountsProcessor extends StatefulProcessor[Long, Ev, TypeCount] {
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[TypeCount] = {
      rows.toSeq.groupBy(_.event_type).toSeq.sortBy(_._1).map { case (t, es) =>
        val n = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + es.size
        counts.updateValue(t, n)
        TypeCount(uid, t, n)
      }.iterator
    }
  }

  def typeCountsTws(ev: Dataset[Ev]): Dataset[TypeCount] = {
    val sq = ev.sparkSession; import sq.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
