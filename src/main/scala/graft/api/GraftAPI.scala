package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, column-parameterized entry points — the surface a USER of this
  * library calls on their own DataFrames (the harness registry in
  * `graft.ops` binds the same algorithms to the test tables; each facade
  * method here is equivalence-tested against its harness twin in
  * `ApiSpec`).
  *
  * Everything is a pure DataFrame→DataFrame transform: no SparkSession
  * parameter, no paths, no side effects — the caller owns I/O. All
  * shuffle-shape and determinism guarantees of the harness ops carry over
  * unchanged (DECIMAL-routed sums, md5 hashing, explicit tie-breaks), and
  * every method documents its 100 TB behavior.
  */
object GraftAPI {

  import graft.Tables.{dsum, r6}

  /** Partition-order-independent double sum via exact decimal addition,
    * like [[graft.Tables.dsum]] but with finer quantization — for API
    * paths (e.g. [[temperatureMix]]) whose outputs must still normalize
    * at full double precision. `scale` picks the range/precision trade:
    * 12 ⇒ ±1e26 range at 1e-12 granularity (mass-like sums — any real
    * corpus's token/char mass fits; values beyond the range would cast
    * to NULL and silently drop, so don't shrink the range further), 18 ⇒
    * ±1e20 at 1e-18 (sums of (0,1]-bounded terms like p^alpha). */
  private def dsumHi(c: Column, scale: Int): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, scale))).cast("double")

  // ---------------------------------------------------------------- dedup

  /** Exact dedup groups: content hash over `cols` → (fp, keep_id, n_dups).
    * One map-side-combined hash aggregate; `keep` must be a stable id so
    * replays pick identical winners. */
  def exactDedupGroups(df: DataFrame, cols: Seq[String], keep: String): DataFrame =
    // Rows serialize through to_json(struct(cols)) (review r10): the
    // earlier NUL-separated concat_ws SKIPPED null columns, so
    // (null, "x") and ("x", null) collided -- a genuinely different
    // record was silently deleted -- and a value containing the
    // separator could alias a column boundary. JSON keeps field names
    // (null fields omit BY NAME, so distinct null patterns stay
    // distinct strings) and escapes everything, at the same
    // one-hash-aggregate plan shape.
    df.groupBy(md5(to_json(struct(cols.map(col): _*))).as("fp"))
      .agg(min(col(keep)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Survivors of exact dedup: the input rows whose `keep` id won their
    * content group (left-semi against the group table — no row explosion,
    * textless shuffle if `keep` is small). */
  def exactDedup(df: DataFrame, cols: Seq[String], keep: String): DataFrame =
    df.join(exactDedupGroups(df, cols, keep)
      .select(col("keep_id").as(keep)), Seq(keep), "left_semi")

  /** Per-row word-n-gram rows (id, gram-md5) — the shared shingle layout
    * for every similarity op: posexplode + window `lead`s, fully codegen,
    * fixed-width output, one shuffle on `id`. */
  def ngramRows(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    // n = 1 would reference a lead column that never exists and n ≤ 0 is
    // meaningless — fail with the parameter, not an unresolved-column
    // AnalysisException from deep inside the plan (review r10)
    require(n >= 2, s"ngramRows needs n >= 2 (unigrams have no span), got $n")
    val w = Window.partitionBy(id).orderBy("pos")
    val leads = (1 until n).map(i => lead(col("w"), i).over(w).as(s"w$i"))
    df.select(col(id), posexplode(split(lower(col(text)), " ")))
      .withColumnRenamed("col", "w")
      .select(col(id) +: col("w") +: leads: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col(id),
        md5(concat_ws(" ", col("w") +: (1 until n).map(i => col(s"w$i")): _*)).as("g"))
  }

  /** Cross-corpus duplicated-span coverage per document (the
    * exact-substring-dedup signal): fraction of n-gram positions whose
    * gram occurs in ≥ `minDocs` distinct documents. Dup-gram set is
    * duplication-sized → broadcasts on clean corpora, AQE-hash-joins on
    * dirty ones. */
  def crossdocDupRatio(df: DataFrame, id: String, text: String,
                       n: Int = 8, minDocs: Int = 2): DataFrame = {
    val grams = ngramRows(df, id, text, n)
    val dupG = grams.groupBy("g").agg(countDistinct(col(id)).as("nd"))
      .filter(col("nd") >= minDocs).select("g")
    val tot = grams.groupBy(id).agg(count(lit(1)).as("n_grams"))
    val hit = grams.join(dupG, "g").groupBy(id).agg(count(lit(1)).as("n_dup"))
    tot.join(hit, Seq(id), "left")
      .select(col(id), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        r6(coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_grams"))
          .as("dup_ratio"))
  }

  /** Paragraph-level exact dedup (the Dolma/FineWeb intra-corpus
    * paragraph pass) over any (id, text) frame: text splits on
    * `separator` into ordered units (default: whitespace-chunking is NOT
    * applied here — pass "\n\n" for real paragraphs, or pre-chunk and
    * pass "\n"), each distinct unit survives only at its first (id, idx)
    * occurrence, and survivors reassemble per row in original order.
    * Returns (id, n_chunks, n_kept, text_kept); a fully-deduplicated row
    * still reports (n_kept = 0). Keeper choice is an associative
    * integer-key min through one map-side-combined groupBy — no
    * corpus-scale window; `id` must be an integral column (the keeper
    * key is integer-encoded) and unit index must stay below 2^20 (loud
    * in-expression failure otherwise). */
  def paragraphDedup(df: DataFrame, id: String, text: String,
                     separator: String = "\n\n"): DataFrame = {
    // `split` takes a REGEX but the reassembly below uses the separator
    // as a LITERAL — quote it (review r10), or a separator with regex
    // metacharacters ("||", ".", "++") mis-splits (per-character
    // explosion for "||") and text_kept reassembles garbage silently.
    val sepRe = java.util.regex.Pattern.quote(separator)
    val chunks = df
      .select(col(id).as("_id"), posexplode(split(col(text), sepRe)))
      .select(col("_id"), col("pos").cast("long").as("cidx"), col("col").as("chunk"))
    // Both factors are guarded: cidx ≥ 2^20 would collide with the next
    // id's block, and an id outside [0, 2^43) overflows id·2^20 + cidx —
    // silently, to a key that can alias ANOTHER document's chunk (a
    // snowflake-style 10^18 id is far past 2^43 ≈ 8.8e12). Loud
    // in-expression failure on both, not a wrong keeper.
    val enc = when(col("cidx") >= (1L << 20),
        expr("raise_error('paragraphDedup: >=2^20 units in one row — key would alias')")
          .cast("long"))
      .when(col("_id") < 0 || col("_id") >= (1L << 43),
        expr("raise_error('paragraphDedup: id outside [0, 2^43) — keeper key would overflow')")
          .cast("long"))
      .otherwise(col("_id") * (1L << 20) + col("cidx"))
    val keep = chunks.groupBy("chunk").agg(min(enc).as("kkey"))
    val kept = chunks.join(keep, "chunk").filter(enc === col("kkey"))
    val perDoc = kept.groupBy("_id")
      .agg(count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("cidx"), col("chunk")))).as("p"))
      .select(col("_id"), col("n_kept"),
        concat_ws(separator, transform(col("p"), x => x.getField("chunk"))).as("text_kept"))
    chunks.groupBy("_id").agg(count(lit(1)).as("n_chunks"))
      .join(perDoc, Seq("_id"), "left")
      .select(col("_id").as(id), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Distinct word-3-gram shingles, one row per (id, shingle `x`) — the
    * shared tokenize+shingle front of the dedup family, public so
    * downstream verdict jobs (e.g. the streaming incremental-curation
    * twin) can probe stored shingle-set artifacts without re-deriving
    * the recipe. Same windowed-lead form as the engine ops: stays in
    * whole-stage codegen, shuffles on the id only. */
  def shingleRows(df: DataFrame, id: String, text: String): DataFrame = {
    val w = Window.partitionBy(id).orderBy("pos")
    df.select(col(id), posexplode(split(lower(col(text)), " ")))
      .withColumnRenamed("col", "w")
      .withColumn("w1", lead("w", 1).over(w))
      .withColumn("w2", lead("w", 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col(id), concat_ws(" ", col("w"), col("w1"), col("w2")).as("x"))
      .distinct()
  }

  /** MinHash-LSH banding table for any (id, text) frame: `numHashes`
    * Kirsch–Mitzenmacher seed hashes from ONE md5 per shingle, min'd
    * inside a hash aggregate, banded `rowsPerBand` at a time. The 100 TB
    * dedup artifact — write it partitioned by band_key prefix and
    * self-join bucket-locally. Shuffle rows are (id, longs), never text.
    *
    * Defaults are the production operating point (128 hashes / 16 bands
    * of 8 rows — the S-curve knee sits at s ≈ (1/16)^(1/8) ≈ 0.71
    * Jaccard, the usual near-dup bar); the harness queries use a smaller
    * 8/2 configuration so their DuckDB oracles stay tractable — the
    * banding algebra is identical at any (numHashes, bands). */
  def minhashBands(df: DataFrame, id: String, text: String,
                   numHashes: Int = 128, bands: Int = 16): DataFrame =
    minhashBandsWithSub(df, id, text, numHashes, bands)
      .drop("sub_key")

  /** [[minhashBands]] plus the full-signature `sub_key` (md5 over ALL
    * numHashes slots) — the fine re-band key hot-bucket probes and the
    * `bands_fine` side-table share. One signature pass serves both. */
  private[graft] def minhashBandsWithSub(df: DataFrame, id: String,
                                         text: String, numHashes: Int,
                                         bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val ex = shingleRows(df, id, text)
      .select(col(id), md5(col("x")).as("h"))
      .select(col(id),
        conv(substring(col("h"), 1, 8), 16, 10).cast("long").as("a"),
        conv(substring(col("h"), 9, 8), 16, 10).cast("long").as("b"))
    val mins = (1 to numHashes).map(sd => min(col("a") + lit(sd.toLong) * col("b")).as(s"mh$sd"))
    val sig = ex.groupBy(id).agg(mins.head, mins.tail: _*)
    val bandArr = array((1 to bands).map { bnd =>
      val slots = ((bnd - 1) * rowsPerBand + 1 to bnd * rowsPerBand)
        .map(i => col(s"mh$i").cast("string"))
      struct(lit(bnd).as("band"), md5(concat_ws("|", slots: _*)).as("band_key"))
    }: _*)
    val subKey = md5(concat_ws("|",
      (1 to numHashes).map(i => col(s"mh$i").cast("string")): _*))
    sig.select(col(id), subKey.as("sub_key"), explode(bandArr).as("bk"))
      .select(col(id), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"), col("sub_key"))
  }

  /** Persist [[minhashBands]] as a stored dedup index (the facade form of
    * the registry's `build_minhash_index` / [[graft.ops.MinhashIndex]]):
    * postings land at `path` hive-partitioned by band (`band` duplicated
    * as `pband` so the data column keeps its type), one file per band,
    * followed by a `_SUCCESS` marker at the root — write-once, and a
    * crashed build is rebuilt because the marker commits last. Returns
    * the per-band manifest (band, n_keys, n_postings, n_docs) read back
    * FROM the stored table; n_postings == n_docs by the one-key-per-
    * (doc, band) construction, so a lost/doubled posting is visible in
    * the manifest. At 100 TB, bucket the table by band_key as well so
    * incremental batch probes co-partition against it without shuffling
    * the stored side. */
  def writeMinhashIndex(df: DataFrame, id: String, text: String, path: String,
                        numHashes: Int = 128, bands: Int = 16,
                        batchWidth: Long = 0): DataFrame = {
    val s = df.sparkSession
    // The marker must genuinely commit LAST on a rebuild too (ADVICE r8):
    // drop any prior marker before the overwrite starts, or a crash
    // mid-rewrite would leave a valid-looking _SUCCESS over partial data.
    // Marker I/O goes through IndexFs (review r10): `path` is a caller
    // table path, which may be an object-store URI java.io.File cannot see.
    val marker = graft.ops.IndexFs.child(path, "_SUCCESS")
    if (graft.ops.IndexFs.isFile(marker)) require(graft.ops.IndexFs.delete(marker),
      s"could not retire the stale index marker under $path")
    // batchWidth > 0 adds the ingest-batch partition axis (pbatch =
    // id div batchWidth) that makes [[minhashIndexDelete]]'s takedowns
    // partition-pruned: a document posts to EVERY band, so band
    // partitioning alone cannot prune a delete. Readers are unaffected
    // (pbatch is one more hive partition column they never select).
    // One signature pass feeds BOTH the postings (sub_key dropped — a
    // 32-char key per posting would bloat the main table for nothing)
    // and the hot-bucket fine side-table below; persist so the fine
    // write doesn't re-shingle the corpus.
    val bandedSub = minhashBandsWithSub(df, id, text, numHashes, bands)
      .withColumnRenamed(id, "_id")
      .withColumn("pband", col("band"))
      .persist()
    val banded = bandedSub.drop("sub_key")
    val (laid, partCols) =
      if (batchWidth > 0)
        (banded.withColumn("pbatch", expr(s"_id div $batchWidth"))
           .repartition(col("pband"), col("pbatch")),
         Seq("pband", "pbatch"))
      else (banded.repartition(col("pband")), Seq("pband"))
    laid.write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(s"$path/bands")
    // Hot-bucket fine side-table (r12, the facade form of the registry's
    // bands_fine): postings of buckets >= hotSize re-keyed on the
    // full-signature sub_key, so incremental probes
    // ([[graft.streaming.StreamingOps.dedupBatchAgainstIndex]]) match a
    // template-family bucket only on a full-signature hit. Written
    // BEFORE the root marker commits, so "marker commits last" covers
    // it; its row count is O(hot postings), not O(corpus).
    val hotKeys = bandedSub.groupBy("band", "band_key")
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") >= graft.ops.DedupOps.RebandHotSize)
      .select("band", "band_key")
    bandedSub.join(hotKeys, Seq("band", "band_key"), "left_semi")
      .select("_id", "band", "band_key", "sub_key", "pband")
      .repartition(col("pband"))
      .write.mode("overwrite").partitionBy("pband")
      .parquet(s"$path/bands_fine")
    // Per-DOC sub_keys side table (r13): one (_id, sub_key) row per
    // document — ~40 bytes/doc, a fraction of the bands table's
    // numBands rows/doc — so a lifecycle APPEND can refresh bands_fine
    // for buckets the delta pushes over the hot threshold WITHOUT
    // re-signing any base text (the per-POSTING width argument for
    // dropping sub_key from the main table doesn't apply here).
    bandedSub.select("_id", "sub_key").distinct()
      .write.mode("overwrite").parquet(s"$path/sub_keys")
    bandedSub.unpersist()
    // batchWidth is recorded so [[minhashIndexDelete]] can refuse an index
    // written WITHOUT a batch axis with a geometry message instead of a
    // late missing-pbatch-column AnalysisException (ADVICE r9).
    graft.ops.Artifacts.writeMeta(path,
      "numHashes" -> numHashes.toString, "bands" -> bands.toString,
      "batchWidth" -> batchWidth.toString,
      "hotSize" -> graft.ops.DedupOps.RebandHotSize.toString)
    require(graft.ops.IndexFs.touch(marker),
      s"could not commit index marker under $path")
    s.read.parquet(s"$path/bands")
      .groupBy("band")
      .agg(countDistinct(col("band_key")).as("n_keys"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("_id")).as("n_docs"))
      .select(col("band").cast("int").as("band"), col("n_keys"),
        col("n_postings"), col("n_docs"))
  }

  /** APPEND a day's batch to a stored facade MinHash index (the facade
    * form of the registry's `dedup_index_append`, r13): the batch
    * shingles + signs ONLY itself and lands as its own COMMITTED delta
    * generation `<root>/bands_delta/batch=<batchId>/` — one
    * subdirectory per append, each with Spark's own `_SUCCESS`
    * committing last, so a crashed append is invisible to the probe
    * resolver and a replay of the same `batchId` is an idempotent
    * overwrite (the foreachBatch replay contract). The streaming probes
    * ([[graft.streaming.StreamingOps.dedupBatchAgainstIndex]] /
    * `curationVerdictBatch`) resolve `bands` ∪ committed deltas (or a
    * committed `bands_compact`), so a document appended today flags the
    * very next micro-batch's dups of it — no compact required.
    *
    * Delta rows KEEP the full-signature `sub_key` (day-scale tables —
    * the per-posting width argument for dropping it from the main table
    * doesn't apply), and the build persists a per-DOC `sub_keys` table,
    * so this append refreshes the `bands_fine` side-table without
    * re-reading ANY text: new fine = postings of buckets hot at the
    * RESOLVED sizes (base ∪ all committed deltas), sub-keyed from the
    * stored tables — including buckets this very append pushes over the
    * threshold. An index built before the sub_keys table existed
    * refuses the append with the rebuild remedy instead of silently
    * serving half-covered hot buckets. The whole append runs under the
    * retired root marker (the delete legs' discipline): a crash
    * mid-append reads as an uncommitted index. */
  def minhashIndexAppend(spark: SparkSession, bandsPath: String,
                         batch: DataFrame, id: String, text: String,
                         batchId: Long, numHashes: Int = 128,
                         bands: Int = 16): DataFrame = {
    val root = graft.ops.IndexFs.parent(bandsPath)
    graft.ops.Artifacts.requireGeometry(root,
      "numHashes" -> numHashes.toString, "bands" -> bands.toString)
    val meta = graft.ops.Artifacts.readMeta(root)
    // The pre-r13-index refusal runs BEFORE the marker retirement (the
    // delete legs' discipline, review r13): a rejected append on an
    // index built before the sub_keys table existed must leave that
    // valid index valid, not retired-and-never-recommitted.
    if (meta.contains("hotSize"))
      require(graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
          graft.ops.IndexFs.child(root, "sub_keys"), "_SUCCESS")),
        s"index at $root predates the per-doc sub_keys table — rebuild " +
          "via writeMinhashIndex before appending (fine-table refresh " +
          "for newly-hot buckets needs the stored sub keys)")
    // A committed operator-managed bands_compact sibling SHADOWS the
    // deltas in every probe resolver (served first) — this append would
    // commit a generation no probe serves, silently (review r13).
    require(!graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        graft.ops.IndexFs.child(root, "bands_compact"), "_SUCCESS")),
      s"index at $root carries a committed bands_compact sibling, which " +
        "probes serve in preference to the delta generation this append " +
        "would write — retire it before appending")
    // A crashed prior lifecycle op leaves the root marker retired; an
    // append on top would extend a possibly half-rewritten index.
    require(graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(root, "_SUCCESS")),
      s"index at $root is not committed (a crashed lifecycle op?) — " +
        "rebuild via writeMinhashIndex before appending")
    val deltaRoot = graft.ops.IndexFs.child(root, "bands_delta")
    val deltaDir = graft.ops.IndexFs.child(deltaRoot, s"batch=$batchId")
    // Declared schema for every delta read-back (the bandsSchema rule,
    // review r13): an appended EMPTY batch commits a data-file-less
    // generation, and inference on it throws — the layouts of the delta
    // generations and the fine side-table coincide, so one schema
    // serves both.
    val deltaSchema = graft.ops.MinhashIndex.facadeFineSchema(
      spark.read.parquet(bandsPath).schema)
    // localCheckpoint: the banded batch feeds the delta write AND the
    // fine refresh — one signature pass, lineage severed.
    val banded = minhashBandsWithSub(batch, id, text, numHashes, bands)
      .withColumnRenamed(id, "_id")
      .withColumn("pband", col("band"))
      .localCheckpoint()
    // One base-postings frame serves the hot-size resolve, the fine
    // refresh AND the returned manifest (review r13 — this call used to
    // scan the base table three times); persisted across the fine write,
    // released before return (the manifest re-reads from disk lazily).
    val basePost = spark.read.parquet(bandsPath)
      .select("_id", "band", "band_key", "pband")
      .persist()
    // Committed-generation listing is taken ONCE, after this batch's
    // delta lands, and reused by the fine refresh and the manifest
    // (review r13 — it was listed and fully re-read twice per append).
    var committed: Seq[String] = Seq.empty
    try withRetiredMarker(root) {
      banded.repartition(col("pband"))
        .write.mode("overwrite").partitionBy("pband").parquet(deltaDir)
      committed = graft.ops.IndexFs.listDirs(deltaRoot)
        .filter(d => graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(d, "_SUCCESS")))
      meta.get("hotSize").foreach { hs =>
        val hotSize = hs.toLong
        val deltaSub = spark.read.schema(deltaSchema)
          .option("basePath", deltaRoot)
          .parquet(committed: _*)
          .select(col("_id"), col("band"), col("band_key"), col("sub_key"),
            col("pband"))
        val hot = basePost.select("band", "band_key")
          .unionByName(deltaSub.select("band", "band_key"))
          .groupBy("band", "band_key").agg(count(lit(1)).as("sz"))
          .filter(col("sz") >= hotSize).select("band", "band_key")
        // The refresh is a pure function of the stored tables: postings
        // of RESOLVED-hot buckets, sub-keyed from the per-doc sub_keys
        // table (base) and the delta rows themselves — buckets pushed
        // over the threshold by THIS append included, no text re-read.
        // distinct: a replayed batch's rows recompute byte-identically.
        val subKeys = spark.read
          .parquet(graft.ops.IndexFs.child(root, "sub_keys"))
        val newFine = basePost
          .join(hot, Seq("band", "band_key"), "left_semi")
          .join(subKeys, "_id")
          .select("_id", "band", "band_key", "sub_key", "pband")
          .unionByName(deltaSub.join(hot, Seq("band", "band_key"), "left_semi"))
          .distinct()
          .localCheckpoint()
        newFine.repartition(col("pband"))
          .write.mode("overwrite").partitionBy("pband")
          .parquet(graft.ops.IndexFs.child(root, "bands_fine"))
      }
    } finally basePost.unpersist()
    val nBase = spark.read.parquet(bandsPath)
      .groupBy("band").agg(count(lit(1)).as("n_base"))
    val nNew = spark.read.schema(deltaSchema)
      .option("basePath", deltaRoot)
      .parquet(committed: _*)
      .groupBy("band").agg(count(lit(1)).as("n_new"))
    nBase.join(nNew, Seq("band"), "full_outer")
      .select(col("band").cast("int").as("band"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .orderBy("band")
  }

  /** COMPACT a stored facade MinHash index in place (r13, the facade
    * form of the registry's `dedup_index_compact`): folds every
    * committed `bands_delta/batch=<k>/` generation into the `bands`
    * table, extends the per-doc `sub_keys` table with the appended
    * documents' keys, refreshes `bands_fine` at the compacted bucket
    * sizes, and REMOVES the folded generations — afterwards the index
    * is single-layout again, exactly as [[writeMinhashIndex]] leaves
    * it, so every refusal that points here ("compact first") has a
    * one-call remedy that costs O(index), never a corpus re-read.
    *
    * Unlike the registry op (which writes a `bands_compact` SIBLING and
    * leaves the swap to a catalog), the facade compacts IN PLACE: the
    * facade owns its root and its probes resolve per call, so the
    * single-layout invariant is simpler and makes the partition-pruned
    * takedown legal again for formerly-delta-resident documents
    * (appended rows gain the `pbatch` ingest-batch axis from the
    * recorded `batchWidth` during the fold). Probe flags are
    * byte-identical before/after (the resolver already served base ∪
    * deltas — ApiSpec pins it). Runs under the retired root marker;
    * a crash mid-compact reads as an uncommitted index. No-op (beyond
    * the manifest) when no committed delta generations exist. Returns
    * the per-band manifest of the compacted table with the build's
    * n_postings = n_docs invariant. */
  def minhashIndexCompact(spark: SparkSession, bandsPath: String): DataFrame = {
    val root = graft.ops.IndexFs.parent(bandsPath)
    val meta = graft.ops.Artifacts.readMeta(root)
    val deltaRoot = graft.ops.IndexFs.child(root, "bands_delta")
    val committed = graft.ops.IndexFs.listDirs(deltaRoot)
      .filter(d => graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(d, "_SUCCESS")))
    // The same operator-managed-sibling refusal as the takedown: an
    // external `bands_compact` would shadow whatever this fold writes.
    require(!graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        graft.ops.IndexFs.child(root, "bands_compact"), "_SUCCESS")),
      s"index at $root carries a committed bands_compact sibling — " +
        "retire it before compacting in place")
    // The fold overwrites the base table from a localCheckpoint whose
    // blocks die with the JVM, so a crash mid-overwrite loses postings
    // with no intact copy — which is exactly what the retired marker
    // signals. Refuse to run ON TOP of an already-uncommitted index
    // (review r13): compacting a half-rewritten base and then removing
    // the deltas would destroy the only recoverable copy of the
    // appended rows. The remedy for a crashed lifecycle op is a rebuild
    // via writeMinhashIndex.
    require(graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(root, "_SUCCESS")),
      s"index at $root is not committed (a crashed lifecycle op?) — " +
        "rebuild via writeMinhashIndex instead of compacting")
    if (committed.nonEmpty) {
      val baseSchema = spark.read.parquet(bandsPath).schema
      val hasBatchAxis = baseSchema.fieldNames.contains("pbatch")
      val batchWidth = meta.get("batchWidth").map(_.toLong).getOrElse(0L)
      if (hasBatchAxis) require(batchWidth > 0,
        s"index at $root has a pbatch axis but records batchWidth=" +
          s"${meta.get("batchWidth").orNull} — cannot derive the " +
          "appended rows' ingest-batch partitions")
      val deltaSub = spark.read
        .schema(graft.ops.MinhashIndex.facadeFineSchema(baseSchema))
        .option("basePath", deltaRoot)
        .parquet(committed: _*)
        .select("_id", "band", "band_key", "sub_key", "pband")
      // distinct on the posting key: replayed/overlapping generations
      // must fold to one row, the idempotent-append contract extended
      // to the compacted layout.
      val deltaPost = {
        val p = deltaSub.drop("sub_key").distinct()
        if (hasBatchAxis) p.withColumn("pbatch", expr(s"_id div $batchWidth"))
        else p
      }
      // distinct across base ∪ deltas: a batch REPLAYED after a prior
      // compact re-lands docs the base already holds — the fold must
      // collapse them to one posting per (doc, band), not double bucket
      // sizes. O(index) shuffle, which an in-place compact already is.
      val merged = spark.read.parquet(bandsPath)
        .unionByName(deltaPost)
        .distinct()
        .localCheckpoint() // severs the read from the overwrite below
      val subKeys = spark.read
        .parquet(graft.ops.IndexFs.child(root, "sub_keys"))
        .unionByName(deltaSub.select("_id", "sub_key").distinct())
        .distinct()
        .localCheckpoint()
      withRetiredMarker(root) {
        val partCols = if (hasBatchAxis) Seq("pband", "pbatch") else Seq("pband")
        merged.repartition(partCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partCols: _*).parquet(bandsPath)
        subKeys.write.mode("overwrite")
          .parquet(graft.ops.IndexFs.child(root, "sub_keys"))
        // bands_fine at the COMPACTED bucket sizes — same pure function
        // of the stored tables the append maintains, now over one layout.
        meta.get("hotSize").foreach { hs =>
          val post = merged.select("_id", "band", "band_key", "pband")
          val hot = post.groupBy("band", "band_key")
            .agg(count(lit(1)).as("sz"))
            .filter(col("sz") >= hs.toLong).select("band", "band_key")
          val newFine = post
            .join(hot, Seq("band", "band_key"), "left_semi")
            .join(subKeys, "_id")
            .select("_id", "band", "band_key", "sub_key", "pband")
            .distinct()
            .localCheckpoint()
          newFine.repartition(col("pband"))
            .write.mode("overwrite").partitionBy("pband")
            .parquet(graft.ops.IndexFs.child(root, "bands_fine"))
        }
        // The folded generations retire with the marker still down. A
        // crash ANYWHERE in this block — mid-overwrite included — reads
        // as an uncommitted index, and the committed-marker precondition
        // above refuses further lifecycle ops on it: the honest remedy
        // for a crashed in-place fold is a rebuild, not a re-run over a
        // possibly partial base (the facade's documented crash
        // semantics for every in-place mutation).
        require(graft.ops.IndexFs.deleteRecursive(deltaRoot),
          s"could not remove the folded delta generations under $root")
      }
    }
    spark.read.parquet(bandsPath)
      .groupBy("band")
      .agg(countDistinct(col("band_key")).as("n_keys"),
        count(lit(1)).as("n_postings"),
        countDistinct(col("_id")).as("n_docs"))
      .select(col("band").cast("int").as("band"), col("n_keys"),
        col("n_postings"), col("n_docs"))
      .orderBy("band")
  }

  /** Partition-pruned takedown on a stored MinHash postings table
    * written by [[writeMinhashIndex]] WITH a `batchWidth` (the facade
    * form of the registry's `dedup_index_delete`): anti-joins
    * `deleteIds` (one column, the document id) out of ONLY the
    * (band, ingest-batch) partitions containing them via dynamic
    * partition overwrite — untouched batch directories stay
    * byte-identical, and a fully-emptied partition throws toward a
    * catalog DROP PARTITION. Mutates `bandsPath` in place (the live
    * table a production delete rewrites); copy first if the original
    * must stay pristine. */
  def minhashIndexDelete(spark: SparkSession, bandsPath: String,
                         deleteIds: DataFrame, id: String): Unit = {
    val root = graft.ops.IndexFs.parent(bandsPath)
    // Loud geometry guard (ADVICE r9, hardened r10): an index written
    // without a batch axis has no pbatch partition column — fail with
    // instructions here, not with an opaque missing-column
    // AnalysisException mid-join. Ground truth is the STORED SCHEMA
    // (covers registry-built and pre-meta indexes, where the batchWidth
    // meta key is simply absent); the meta check stays as the recorded-
    // geometry cross-check. Both run BEFORE the marker retirement: a
    // rejected mis-call must leave a valid index valid.
    require(spark.read.parquet(bandsPath).columns.contains("pbatch"),
      s"index at $root was written without a batchWidth (ingest-batch " +
        "partition axis) — partition-pruned deletes need it; rebuild " +
        "with writeMinhashIndex(batchWidth = <ids per ingest batch>)")
    graft.ops.Artifacts.readMeta(root).get("batchWidth")
      .foreach(bw => require(bw.toLong > 0,
        s"index at $root records batchWidth=$bw — partition-pruned " +
          "deletes need a positive ingest-batch width; rebuild with " +
          "writeMinhashIndex(batchWidth = <ids per ingest batch>)"))
    // A committed `bands_compact` sibling is what the probe resolver
    // serves FIRST ([[graft.streaming.StreamingOps]], review r13): this
    // takedown rewrites only the bands/bands_delta family, so a compact
    // left in place would keep serving every deleted document's postings
    // no matter what the rewrite below does. The facade defines no
    // compact writer (the sibling is operator-managed, layout unknown
    // here), so refuse loudly before the marker retirement rather than
    // guess at rewriting it.
    require(!graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        graft.ops.IndexFs.child(root, "bands_compact"), "_SUCCESS")),
      s"index at $root carries a committed bands_compact sibling, which " +
        "probes serve in preference to the rewritten postings — retire " +
        "it (or rebuild via writeMinhashIndex over the surviving corpus) " +
        "before the takedown")
    // Delta generations ([[minhashIndexAppend]]) are probe-visible through
    // the resolver, so a takedown that only rewrote `bands` would keep
    // serving deleted documents out of the deltas. Refuse loudly (before
    // the marker retirement — a rejected call leaves a valid index valid):
    // the remedy is [[minhashIndexCompact]] — an O(index) in-place fold
    // that restores the single layout (and the pbatch axis for the
    // appended rows), after which this takedown is legal again.
    val deltaGens = graft.ops.IndexFs
      .listDirs(graft.ops.IndexFs.child(root, "bands_delta"))
      .filter(d => graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(d, "_SUCCESS")))
    if (deltaGens.nonEmpty) {
      val hitDelta = spark.read
        .schema(graft.ops.MinhashIndex.facadeFineSchema(
          spark.read.parquet(bandsPath).schema))
        .option("basePath", graft.ops.IndexFs.child(root, "bands_delta"))
        .parquet(deltaGens: _*)
        .join(deleteIds.select(col(id).as("_id")), Seq("_id"), "left_semi")
        .limit(1).count()
      require(hitDelta == 0L,
        s"index at $root has committed delta generations containing " +
          "documents in the deletion list — run minhashIndexCompact to " +
          "fold the deltas into the base (O(index), no corpus re-read), " +
          "then re-run the takedown against the single layout")
    }
    withRetiredMarker(root) {
      graft.ops.DedupOps.deleteFromBands(spark, bandsPath,
        deleteIds.select(col(id).as("_id")), idCol = "_id")
      // The `bands_fine` side-table holds the SAME documents' hot-bucket
      // postings (review r12): leaving it stale after a takedown lets a
      // later fine probe flag new text as a dup of a document the index
      // no longer contains — rewrite it minus the deleted ids under the
      // same retired marker. localCheckpoint severs the read from the
      // overwrite of its own source path; the survivors table is
      // hot-postings-small, so a full rewrite is fine.
      val fineDir = graft.ops.IndexFs.child(root, "bands_fine")
      if (graft.ops.Artifacts.readMeta(root).contains("hotSize")) {
        val survivors = spark.read
          .schema(graft.ops.MinhashIndex.facadeFineSchema(
            spark.read.parquet(bandsPath).schema))
          .parquet(fineDir)
          .join(deleteIds.select(col(id).as("_id")), Seq("_id"), "left_anti")
          .localCheckpoint()
        survivors.repartition(col("pband"))
          .write.mode("overwrite").partitionBy("pband").parquet(fineDir)
      }
      // The per-doc sub_keys table (r13) holds the same documents' keys:
      // purge them under the same retired marker — takedown completeness,
      // and a later append's fine refresh must not resurrect fine rows
      // for deleted documents.
      val subDir = graft.ops.IndexFs.child(root, "sub_keys")
      if (graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(subDir, "_SUCCESS"))) {
        val keptSub = spark.read.parquet(subDir)
          .join(deleteIds.select(col(id).as("_id")), Seq("_id"), "left_anti")
          .localCheckpoint()
        keptSub.write.mode("overwrite").parquet(subDir)
      }
    }
  }

  /** The delete legs rewrite live partitions in place, so the index's
    * root `_SUCCESS` must not stay valid across the rewrite (ADVICE r9 —
    * the same "marker commits last" rule [[writeMinhashIndex]] enforces
    * for rebuilds): retire it before the dynamic partition overwrite
    * starts, recreate it only after the rewrite commits. A crash
    * mid-delete then reads as an uncommitted index, not a valid-looking
    * marker over a partially rewritten table. No-op when the table has
    * no root marker (scratch layouts). IndexFs-routed (review r10) so
    * the contract holds on object-store index roots too. */
  private def withRetiredMarker(root: String)(body: => Unit): Unit = {
    val marker = graft.ops.IndexFs.child(root, "_SUCCESS")
    val had = graft.ops.IndexFs.isFile(marker)
    if (had) require(graft.ops.IndexFs.delete(marker),
      s"could not retire the index marker under $root before the delete")
    body
    if (had) require(graft.ops.IndexFs.touch(marker),
      s"could not recommit the index marker under $root after the delete")
  }

  /** Partition-pruned takedown on a stored ANN code table
    * ([[buildAnnIndex]]'s `<path>/ivfpq_codes` layout; the facade form
    * of the registry's `ann_index_delete`): rewrites only the cell
    * partitions containing deleted vectors — in the base, in any
    * committed `ivfpq_codes_compact` sibling (the layout probes serve
    * FIRST), in the committed `ivfpq_codes_delta` (a delta-only vector
    * must not survive its own takedown), AND in the `cells` membership
    * table (the streaming pool resolves membership from cells ∪ delta,
    * so a stale row would keep serving the id whenever the caller's
    * corpus purge lags) — all under one retired root marker, with
    * `_split_SUCCESS` retired (split side-tables reflect pre-delete
    * membership). A delete that would fully EMPTY a base or compact
    * cell is REFUSED before the marker retirement (toward a catalog
    * DROP PARTITION — and so a rejected call leaves a committed index
    * committed); an emptied DELTA cell is fine — the day-scale delta is
    * library-managed and simply loses the partition. Mutates in place;
    * the corpus float column remains the caller's own table to purge. */
  def annIndexDelete(spark: SparkSession, codesPath: String,
                     deleteIds: DataFrame, id: String): Unit = {
    // Schema validation BEFORE the marker retirement (review r10, the
    // minhashIndexDelete discipline): a rejected mis-call — wrong path,
    // a table that is not a cell-partitioned code layout — must leave a
    // valid index valid, not retired-and-never-recommitted.
    val liveCols = spark.read.parquet(codesPath).columns.toSet
    Seq("vec_id", "cell").foreach(c => require(liveCols.contains(c),
      s"table at $codesPath has no '$c' column — not a cell-partitioned " +
        "ANN code table (buildAnnIndex's ivfpq_codes layout)"))
    val root = graft.ops.IndexFs.parent(codesPath)
    val del = deleteIds.select(col(id).as("vec_id")).localCheckpoint()
    val compactP = graft.ops.IndexFs.child(root, "ivfpq_codes_compact")
    val deltaP = graft.ops.IndexFs.child(root, "ivfpq_codes_delta")
    val hasCompact = graft.ops.IndexFs.isFile(
      graft.ops.IndexFs.child(compactP, "_SUCCESS"))
    val hasDelta = graft.ops.IndexFs.isFile(
      graft.ops.IndexFs.child(deltaP, "_SUCCESS"))
    // Emptied-cell REFUSALS run before the marker retirement (review
    // r13: deleteFromCodes' internal guard throwing mid-lifecycle left
    // the base rewritten and the index permanently uncommitted).
    def refuseEmptied(table: String, live: org.apache.spark.sql.DataFrame): Unit = {
      val emptied = graft.ops.VectorOps.emptiedCells(live, del)
      require(emptied.isEmpty,
        s"cells ${emptied.mkString(",")} of $table would be emptied by " +
          "this delete; drop those partitions via the catalog instead of " +
          "a data rewrite")
    }
    refuseEmptied(codesPath, spark.read.parquet(codesPath))
    if (hasCompact) refuseEmptied(compactP, spark.read
      .schema(graft.ops.VectorOps.codesSchema).parquet(compactP))
    withRetiredMarker(root) {
      graft.ops.VectorOps.deleteFromCodes(spark, codesPath, del)
      // Lifecycle siblings (review r13): the probe-root resolver serves a
      // committed compact FIRST and unions the committed delta with the
      // cells table, so a takedown that rewrote only the base would keep
      // serving deleted vectors out of both — and a vector that exists
      // ONLY in the delta slice would survive entirely. Declared schema:
      // a data-file-less delta must read as empty, not crash inference.
      if (hasCompact)
        graft.ops.VectorOps.deleteFromCodes(spark, compactP, del,
          source = Some(spark.read
            .schema(graft.ops.VectorOps.codesSchema).parquet(compactP)))
      // The delta takes a guard-FREE full rewrite: it is day-scale and
      // library-managed, so an emptied cell has no catalog partition to
      // drop — the directory just goes.
      if (hasDelta) {
        val survivors = spark.read
          .schema(graft.ops.VectorOps.codesSchema).parquet(deltaP)
          .select("vec_id", "m", "code", "cell")
          .join(del, Seq("vec_id"), "left_anti")
          .localCheckpoint()
        survivors.withColumn("pcell", col("cell"))
          .repartition(col("pcell"))
          .write.mode("overwrite").partitionBy("pcell").parquet(deltaP)
      }
      // cells purge (review r13): the split-aware streaming probe builds
      // its no-compact pool from cells ∪ delta, so a stale membership
      // row serves a deleted id whenever the caller's corpus purge lags
      // — and the facade compact would fold the stale row forward. One
      // scalar-column rewrite; deletes are rare.
      val cellsP = graft.ops.IndexFs.child(root, "cells")
      if (graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(cellsP, "_SUCCESS"))) {
        val kept = spark.read.parquet(cellsP)
          .join(del, Seq("vec_id"), "left_anti")
          .localCheckpoint()
        kept.write.mode("overwrite").parquet(cellsP)
      }
      // A committed cell split reflects the PRE-delete membership
      // (ADVICE r12): the split-aware probe computes its pool >= k floor
      // from cells_split rows before joining the live corpus, so stale
      // split rows inflate the pool with deleted vec_ids. Retire the
      // split marker (the same move [[graft.ops.IvfPqIndex.buildAt]]
      // makes on a rebuild) so probes fall back to whole-cell scans
      // until the next annIndexSplit against this root.
      val split = graft.ops.IndexFs.child(root, "_split_SUCCESS")
      if (graft.ops.IndexFs.isFile(split))
        require(graft.ops.IndexFs.delete(split),
          s"could not retire the stale split marker under $root after the delete")
    }
  }

  /** LSH candidate pairs (id_a < id_b, distinct): bucket-local i<j
    * enumeration over each (band, band_key) group — pair fan-out bounded
    * by bucket size, never n². Feed the pairs to an exact verify
    * (Jaccard on shingle sets) before acting on them. */
  def lshCandidatePairs(df: DataFrame, id: String, text: String,
                        numHashes: Int = 128, bands: Int = 16): DataFrame =
    minhashBands(df, id, text, numHashes, bands)
      .groupBy("band", "band_key")
      .agg(sort_array(collect_list(col(id))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** 16-bit SimHash fingerprint per row: per-token md5, bit j = sign of
    * Σ(±1) over hex-digit parity. Near-dup test = `bit_count(a XOR b)`
    * ≤ threshold; at scale, bucket by 4-bit chunks (pigeonhole) and
    * compare bucket-mates only. One map-side-combined groupBy. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val bits = 16
    val tok = df.select(col(id), explode(split(lower(col(text)), " ")).as("w"))
      .select(col(id), md5(col("w")).as("h"))
    val sums = (1 to bits).map { j =>
      sum(when(ascii(substring(col("h"), j, 1)) % 2 === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val fp = (1 to bits)
      .map(j => when(col(s"b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(id).agg(sums.head, sums.tail: _*)
      .select(col(id), fp.cast("long").as("simhash"))
  }

  /** Marker-token language ID: first language (in declared order) whose
    * marker hit-count is positive and maximal; "und" otherwise.
    * Zero-shuffle codegen'd scoring. */
  def langId(df: DataFrame, text: String,
             markers: Seq[(String, Seq[String])] = Seq(
               "en" -> Seq("the", "a", "and"),
               "de" -> Seq("der", "die", "und"),
               "es" -> Seq("el", "la", "los"),
               "fr" -> Seq("le", "les", "des"))): DataFrame = {
    val toks = split(lower(col(text)), " ")
    def score(ms: Seq[String]): Column =
      size(filter(toks, t => array_contains(array(ms.map(lit): _*), t))).cast("long")
    val scored = df.withColumns(
      markers.map { case (l, ms) => s"_s_$l" -> score(ms) }.toMap)
    val best = markers.map(_._1).foldRight(lit("und")) { (l, acc) =>
      when(col(s"_s_$l") > 0 &&
        markers.map(m => col(s"_s_$l") >= col(s"_s_${m._1}")).reduce(_ && _), lit(l))
        .otherwise(acc)
    }
    scored.withColumn("lang_pred", best).drop(markers.map(m => s"_s_${m._1}"): _*)
  }

  // ------------------------------------------------------------- ranking

  /** Top-k rows per group by `order` (desc), ties broken by `tie` asc.
    * Written as the portable row_number idiom on purpose: with
    * `GraftExtensions` installed, `RewriteRankFilterToTopK` upgrades it
    * to the native partial/final TopKPerGroup operator (≤ k rows per
    * group per partition cross the exchange, no full sort). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: String,
                   tie: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(order).desc, col(tie).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  // --------------------------------------------------------- time series

  /** Per-key EWMA of `value` over `order` via the exponent-rescaled
    * running-sum window (one shuffle on `keys`, no recurrence). `alpha`
    * defaults to 0.5 because powers of two are exact doubles — the
    * backfill-determinism choice; other alphas are computed identically
    * but carry last-ulp pow() variance across platforms. Horizon ~1000
    * steps (v·2^t range) — re-normalize per segment beyond. */
  def ewma(df: DataFrame, keys: Seq[String], order: String, value: String,
           alpha: Double = 0.5): DataFrame = {
    // alpha = 1 makes decay = 0 and the v/decay^t rescaling 0·∞ = NaN
    // from the second row on (alpha = 0 divides out to a constant) —
    // reject the degenerate smoothing factors loudly (review r10)
    require(alpha > 0.0 && alpha < 1.0,
      s"ewma alpha must be in (0, 1) exclusive, got $alpha")
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(order)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val decay = 1.0 - alpha
    df.withColumn("t", row_number().over(wOrd) - lit(1))
      .withColumn("sacc", sum(col(value) / pow(lit(decay), col("t"))).over(wRun))
      .withColumn("v0", first(col(value)).over(wRun))
      .withColumn("ewma",
        pow(lit(decay), col("t")) *
          (col("v0") + lit(alpha) * (col("sacc") - col("v0"))))
      .drop("t", "sacc", "v0")
  }

  /** Backward as-of join: for each left row, the latest right row with
    * the same `keys` and `rightTs` ≤ `leftTs` (within `toleranceUs` if
    * ≥ 0). Union-timeline + `last(ignoreNulls)` — ONE shuffle on the
    * keys, linear state per key, never a per-row rescan. Right columns
    * come back prefixed `asof_`. */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, tie: String,
                       payload: Seq[String], toleranceUs: Long = -1L): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_ts", col(leftTs)).withColumn("_tie", col(tie))
    val r = right.withColumn("_side", lit(0))
      .withColumn("_ts", col(rightTs)).withColumn("_tie", col(tie))
    val lCols = left.columns.toSeq
    val union = l.select(
      (keys :+ "_side" :+ "_ts" :+ "_tie").map(col) ++
        lCols.filterNot(keys.contains).map(c => col(c).as(s"_l_$c")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"_r_$p")): _*)
      .unionByName(r.select(
        (keys :+ "_side" :+ "_ts" :+ "_tie").map(col) ++
          lCols.filterNot(keys.contains).map(c =>
            lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
          payload.map(p => col(p).as(s"_r_$p")): _*))
    // right rows sort BEFORE left rows at equal ts → an exactly-simultaneous
    // right row matches (standard as-of semantics); `tie` (a stable id
    // present in both frames) pins within-side order so replays match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The matched right ROW carries as ONE struct through a single
    // last(ignoreNulls) (review r10): carrying _m_ts and each payload in
    // SEPARATE ignoreNulls windows let a matched row's null payload fall
    // back to an OLDER right row's value — pairing r2's timestamp with
    // r1's price, a row that never existed (and, under a tolerance,
    // judging freshness on r2 while serving r1). The struct is null for
    // left rows, so last picks the latest right row as a unit and null
    // payloads stay null.
    val rRow = when(col("_side") === 0,
      struct(col("_ts").as("_asof_ts") +:
        payload.map(p => col(s"_r_$p").as(p)): _*))
    val carried = union.withColumn("_m", last(rRow, ignoreNulls = true).over(w))
    val mTs = col("_m").getField("_asof_ts")
    val fresh = if (toleranceUs < 0) mTs.isNotNull
    else mTs.isNotNull &&
      unix_micros(col("_ts")) - unix_micros(mTs) <= toleranceUs
    carried.filter(col("_side") === 1)
      .select(keys.map(col) ++
        lCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
        Seq(when(fresh, mTs).as(s"asof_$rightTs")) ++
        payload.map(p =>
          when(fresh, col("_m").getField(p)).as(s"asof_$p")): _*)
  }

  /** Gaps-and-islands sessionization: session id per (key) with a new
    * session when the gap to the previous event exceeds `gapSeconds`.
    * One shuffle on `key`; prefix-sum of boundary flags. */
  def sessionize(df: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    df.withColumn("_prev", lag(col(ts), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("_prev")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }

  // ---------------------------------------------------------------- text

  /** Whitespace/BPE-ish token counts for a text column. Zero-shuffle,
    * codegen'd. */
  def tokenCounts(df: DataFrame, text: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(text), " ")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(lower(col(text)),
          lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long"))

  /** Quality heuristics: length, token count, mean word length, stopword
    * ratio — the cheap pre-filter every curation pipeline runs first.
    * Zero-shuffle. (Punctuation-class token counts live in the tokenizer
    * surface — see `re_tokens` above — not here.) */
  def qualityScore(df: DataFrame, text: String,
                   stopwords: Seq[String] = graft.ops.TextOps.Stopwords): DataFrame = {
    val toks = split(lower(col(text)), " ")
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("n_chars", length(col(text)).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_word_len",
        r6(length(regexp_replace(col(text), " ", "")).cast("double") / size(toks)))
      .withColumn("stopword_ratio",
        r6(size(filter(toks, t => array_contains(stopArr, t))).cast("double") / size(toks)))
  }

  /** Per-vector L2 normalization of an array<float|double> column (HOF
    * arithmetic, zero shuffle; norm-0 vectors pass through unchanged). */
  def l2Normalize(df: DataFrame, vec: String): DataFrame = {
    val v = col(vec).cast("array<double>")
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    df.withColumn("l2_norm", norm)
      .withColumn(vec,
        when(norm > 0.0, transform(v, x => x / norm)).otherwise(v))
  }

  /** Embedding outlier audit — per-group centroid-distance z-score over
    * an array<float|double> column: (id, group, d2, z, is_outlier) with
    * `is_outlier` = z > `zThreshold`. The corrupt/mis-embedded-row
    * filter a pipeline runs before any semantic op trusts the vectors
    * (truncated downloads, preprocessing-version drift, and mislabels
    * all land far from their group's centroid). One long-form explode,
    * two fixed-width shuffles ((group, dim) and id), centroids broadcast
    * back; every stage 6-dp-snaps before its DECIMAL sum so flags are
    * partition-order independent and backfills byte-match. At 100 TB,
    * persist the centroid table like an IVF coarse table and recompute
    * it on the sample cadence. Harness twin: `embed_outliers`. */
  def embeddingOutliers(df: DataFrame, id: String, group: String,
                        vec: String, zThreshold: Double = 2.0): DataFrame = {
    val el = df
      .select(col(id).as("_id"), col(group).as("_grp"),
        posexplode(col(vec).cast("array<double>")))
      .select(col("_id"), col("_grp"),
        col("pos").cast("long").as("dim"), r6(col("col")).as("v"))
    val cent = el.groupBy("_grp", "dim")
      .agg(count(lit(1)).as("n"), dsum(col("v")).as("sv"))
      .select(col("_grp").as("cg"), col("dim").as("cd"),
        r6(col("sv") / col("n")).as("c"))
    val d2 = el.join(broadcast(cent),
        col("_grp") === col("cg") && col("dim") === col("cd"))
      .select(col("_id"), col("_grp"),
        r6((col("v") - col("c")) * (col("v") - col("c"))).as("sq"))
      .groupBy("_id", "_grp")
      .agg(r6(dsum(col("sq"))).as("d2"))
    val stats = d2
      .select(col("_grp"), col("d2"), r6(col("d2") * col("d2")).as("d2sq"))
      .groupBy("_grp")
      .agg(count(lit(1)).as("n"), dsum(col("d2")).as("sd"),
        dsum(col("d2sq")).as("sd2"))
      .select(col("_grp").as("sg"), r6(col("sd") / col("n")).as("mu"),
        r6(sqrt(greatest(
          r6((col("sd2") - col("sd") * col("sd") / col("n")) / col("n")),
          lit(0.0)))).as("sigma"))
    d2.join(broadcast(stats), col("_grp") === col("sg"))
      .select(col("_id").as(id), col("_grp").as(group), col("d2"),
        when(col("sigma") > 0, r6((col("d2") - col("mu")) / col("sigma")))
          .otherwise(lit(0.0)).as("z"))
      .withColumn("is_outlier", col("z") > zThreshold)
  }

  /** Per-source quota rebalancing: cap any single `source`'s share at
    * `quota` rows (C4/Pile-style domain balancing). Selection within a
    * source is by md5-hash rank of the stable `id` — re-runs and
    * repartitions never change the cut, and the kept subset is an
    * unbiased uniform sample of the source. The window partitions BY
    * SOURCE, so the ranking is per-source parallel work, never a global
    * sort. Output keeps every row with `src_rank` + `kept` (the audit
    * artifact; filter `kept` for the corpus). Harness twin:
    * `corpus_source_quota`. */
  def sourceQuota(df: DataFrame, id: String, source: String, quota: Long): DataFrame = {
    val w = Window.partitionBy(source)
      .orderBy(md5(col(id).cast("string")), col(id))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("src_rank") <= quota)
  }

  /** Token-budget selection: keep the rows with the highest integer
    * `quality` until the global sum of `weight` reaches
    * `budgetFrac × total`, truncating the boundary-quality group at its
    * `id`-ordered prefix. Scale shape (see `PipelineOps.corpusBudgetSelect`):
    * the quality spine cumulates on a broadcast-sized table and the doc
    * side only needs a per-quality-bucket prefix window — no global sort,
    * no partition-less window over the data. `quality` MUST be integral
    * (bucket your score first): that keeps the keep-decision arithmetic
    * exact and the spine small. */
  def budgetSelect(df: DataFrame, id: String, quality: String, weight: String,
                   budgetFrac: Double = 0.5): DataFrame = {
    val wSpine = Window.orderBy(col(quality).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = df.groupBy(quality).agg(sum(weight).as("_btok"))
      .withColumn("_cum_before", coalesce(sum("_btok").over(wSpine), lit(0L)))
      .select(col(quality), col("_cum_before"))
    val budget = df.agg((sum(col(weight)) * lit(budgetFrac)).as("_budget"))
    val wIn = Window.partitionBy(quality).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_within", coalesce(sum(weight).over(wIn), lit(0L)))
      .join(broadcast(spine), quality)
      .crossJoin(broadcast(budget))
      .filter(col("_cum_before") + col("_within") + col(weight) <= col("_budget"))
      .drop("_within", "_cum_before", "_budget")
  }

  /** Deterministic split assignment: adds a `split` column from an
    * md5-hash unit deviate over `id` against cumulative `fractions`
    * (label → fraction, applied in the given order; remainder falls to
    * the last label). Hash-not-rand: reprocessing or repartitioning
    * never moves a row between splits — the property that keeps
    * train/eval separation valid across backfills. Zero shuffle. */
  def splitAssign(df: DataFrame, id: String,
                  fractions: Seq[(String, Double)] =
                    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val u = conv(substring(md5(col(id).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val expr0 = fractions.init.zip(cuts).foldLeft(when(lit(false), "")) {
      case (acc, ((label, _), cut)) => acc.when(u < cut, label)
    }
    df.withColumn("split", expr0.otherwise(fractions.last._1))
  }

  /** Per-vertex triangle participation counts over an UNDIRECTED edge
    * list (`src`/`dst` any orderable type; duplicate and reversed edges
    * are normalized away). Two-path + closing-edge join with low→high
    * orientation finds each triangle exactly once; output is
    * (vertex, n_tri). At real scale orient by degree instead of raw id
    * for the O(m^1.5) candidate bound. */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_tri"))
  }

  /** Per-row lexical diversity for a text column: whitespace token count,
    * distinct-type count, type-token ratio, hapax share. Two hash-aggs
    * both keyed on `id` (the second reuses the first's partitioning). */
  def lexicalDiversity(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = df.select(col(id), explode(split(col(text), " ")).as("_w"))
      .groupBy(id, "_w").agg(count(lit(1)).as("_c"))
    tf.groupBy(id).agg(
        sum("_c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("_c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col(id), col("n_tokens"), col("n_types"),
        r6(col("n_types").cast("double") / col("n_tokens")).as("ttr"),
        r6(col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"))
  }

  /** Per-row unigram Shannon entropy (nats) + norm_entropy = H/ln(n_types)
    * clamped to [0,1] — the distribution-shape quality signal
    * [[lexicalDiversity]]'s TTR misses ({a:99,b:1} and {a:50,b:50} share a
    * TTR but have entropies 0.056 vs 0.693). Same one-shuffle dataflow:
    * both aggs and the join key on `id`, so the token stream shuffles
    * once; per-type terms 6-dp-snap before the DECIMAL sum so re-runs
    * byte-match. Harness twin: `text_token_entropy`. */
  def tokenEntropy(df: DataFrame, id: String, text: String): DataFrame = {
    // window-over-tf form: one corpus explode serves counts AND totals
    // (a tf⋈perDoc join would plan the tf subtree twice — see the
    // registry twin's captured plan)
    val wd = Window.partitionBy(id)
    df.select(col(id), explode(split(lower(col(text)), " ")).as("_w"))
      .groupBy(id, "_w").agg(count(lit(1)).as("_c"))
      .withColumn("n_tokens", sum(col("_c")).over(wd))
      .withColumn("n_types", count(lit(1)).over(wd))
      .select(col(id), col("n_tokens"), col("n_types"),
        r6(col("_c").cast("double") / col("n_tokens") *
          log(col("n_tokens").cast("double") / col("_c"))).as("_term"))
      .groupBy(id, "n_tokens", "n_types")
      .agg(dsum(col("_term")).as("_hs"))
      .select(col(id), col("n_tokens"), col("n_types"),
        r6(col("_hs").cast("double")).as("entropy"),
        when(col("n_types") === 1, lit(0.0))
          .otherwise(least(lit(1.0), r6(col("_hs").cast("double") /
            log(col("n_types").cast("double"))))).as("norm_entropy"))
  }

  /** Truncated-dimension (Matryoshka) recall audit: recall@k of exact
    * cosine search over each prefix length in `dims` against the search
    * at `dims.max` (the full-width control — its rows report recall 1.0
    * by construction). One corpus scan scores every prefix (queries
    * broadcast, |dims| fixed-width rows per pair, window-bounded top-k);
    * run it before committing to dimension-truncated serving. Query rows
    * present in `df` under the same id are excluded from their own
    * ranking. Harness twin: `embed_mrl_recall`. */
  def truncatedDimRecall(df: DataFrame, id: String, vec: String,
                         queries: DataFrame, qId: String, qVec: String,
                         dims: Seq[Int], k: Int = 10): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ > 0), "dims must be positive")
    val q = queries.select(col(qId).as("_qid"), col(qVec).cast("array<double>").as("_qv"))
    val w = Window.partitionBy("_dim", "_qid")
      .orderBy(col("_cos").desc, col(id).asc)
    val topk = df.select(col(id), col(vec).cast("array<double>").as("_x"))
      .crossJoin(broadcast(q))
      .filter(col(id) =!= col("_qid"))
      .select(col(id), col("_qid"),
        explode(array(dims.map { d =>
          val dnum = graft.functions.VectorFunctions.graftDot(
            slice(col("_x"), 1, d), slice(col("_qv"), 1, d))
          val den = sqrt(graft.functions.VectorFunctions.graftDot(
              slice(col("_x"), 1, d), slice(col("_x"), 1, d))) *
            sqrt(graft.functions.VectorFunctions.graftDot(
              slice(col("_qv"), 1, d), slice(col("_qv"), 1, d)))
          // zero-norm prefix → null cosine, which the desc ordering puts
          // LAST — 0/0 = NaN would sort above every real score and rank
          // a corrupt all-zero vector first (review r10)
          struct(lit(d).as("dim"),
            r6(when(den =!= 0.0, dnum / den)).as("cos"))
        }: _*)).as("_s"))
      .select(col(id), col("_qid"),
        col("_s.dim").as("_dim"), col("_s.cos").as("_cos"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select(col("_dim"), col("_qid"), col(id))
    // single-pass hit count: a (query, id) surviving at the full width
    // contributes one hit to every dim it survived in — no filtered
    // "truth" branch, which would push below the top-k and duplicate
    // the corpus subtree (see the registry twin's captured plan)
    val hits = topk.groupBy("_qid", id)
      .agg(collect_set(col("_dim")).as("_ds"))
      .filter(array_contains(col("_ds"), lit(dims.max)))
      .select(col("_qid"), explode(col("_ds")).as("_dim"))
      .groupBy("_dim", "_qid").agg(count(lit(1)).as("_h"))
    val spine = df.sparkSession.range(1)
      .select(explode(array(dims.map(lit): _*)).as("_dim"))
      .crossJoin(q.select("_qid"))
    spine.join(hits, Seq("_dim", "_qid"), "left")
      .select(col("_dim").as("dim"), col("_qid").as(qId),
        coalesce(col("_h"), lit(0L)).as("n_hit"),
        r6(coalesce(col("_h"), lit(0L)).cast("double") / lit(k)).as("recall"))
  }

  /** Recall@k of an approximate ranking against an exact one: both inputs
    * are (query, candidate) rankings already cut to k (or cut here via
    * [[topKPerGroup]] upstream); output is per-query hit count and
    * recall. Left-semi + spine left-join — neither ranking is collected,
    * and queries the approximate side missed entirely still report 0. */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                query: String, candidate: String, k: Int): DataFrame = {
    val hits = exact.join(approx, Seq(query, candidate), "leftsemi")
      .groupBy(query).agg(count(lit(1)).as("_h"))
    exact.select(query).distinct().join(hits, Seq(query), "left")
      .select(col(query), coalesce(col("_h"), lit(0L)).as("n_hit"),
        r6(coalesce(col("_h"), lit(0L)).cast("double") / lit(k)).as("recall"))
  }

  /** Snapshot differencing: the I/U/D changelog between two versions of
    * a keyed table. Every non-key column the two sides share is compared
    * null-safely; unchanged keys are dropped. Output: the key columns
    * (coalesced across sides), `op` ∈ {I, U, D}, and both payloads as
    * `old_*` / `new_*`. Each side shuffles once on the key and the
    * full-outer sort-merge join reuses that partitioning (Sort only —
    * no third exchange); output is changed-keys scale. Works on raw
    * rows or on pre-aggregated snapshots (`ops.PipelineOps
    * .cdcDiffSnapshots` is this over two windowed aggregates); route
    * float payloads through exact [[dsum]]-style aggregation first so
    * the U-test cannot flap on FP noise. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = oldDf.columns.filterNot(keys.contains)
      .intersect(newDf.columns.filterNot(keys.contains)).toSeq
    // explicit presence markers, NOT key-column nullability (review r10):
    // an old-side row with a null first key column matches nothing in the
    // join, and testing `_ok_<key> isNull` would misread that vanished
    // old row as an Insert — the markers are non-null by construction, so
    // side detection survives null keys
    val o = oldDf.select(keys.map(k => col(k).as(s"_ok_$k")) ++
      payload.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("_o_present", lit(true))
    val n = newDf.select(keys.map(k => col(k).as(s"_nk_$k")) ++
      payload.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("_n_present", lit(true))
    val cond = keys.map(k => col(s"_ok_$k") === col(s"_nk_$k")).reduce(_ && _)
    val same = payload.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .foldLeft(lit(true))(_ && _)
    o.join(n, cond, "full_outer")
      .withColumn("op",
        when(col("_o_present").isNull, "I")
          .when(col("_n_present").isNull, "D")
          .when(same, "N").otherwise("U"))
      .filter(col("op") =!= "N")
      .select(keys.map(k => coalesce(col(s"_ok_$k"), col(s"_nk_$k")).as(k)) ++
        (col("op") +: payload.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }

  /** Per-key symbol-sequence n-grams ("paths"): orders each key's rows by
    * `order`, slides an n-length window over the `symbol` column via
    * n−1 `lead`s (ONE shuffle on the key — every lead shares the same
    * window spec, hence the same exchange + sort), and returns
    * (path, n, n_keys) with occurrence count and distinct-key support.
    * Counts map-side combine to ≤ |alphabet|ⁿ rows; cut with
    * [[topKPerGroup]] or orderBy/limit downstream (which plans as
    * `TakeOrderedAndProject`, not a global sort). */
  def pathNgrams(df: DataFrame, key: String, order: Seq[String],
                 symbol: String, n: Int): DataFrame = {
    require(n >= 2, "path length must be at least 2")
    val w = Window.partitionBy(key).orderBy(order.map(col): _*)
    val withSteps = (1 until n).foldLeft(df.withColumn("_s0", col(symbol))) {
      case (acc, i) => acc.withColumn(s"_s$i", lead(col(symbol), i).over(w))
    }
    withSteps.filter(col(s"_s${n - 1}").isNotNull)
      .select(col(key),
        concat_ws(">", (0 until n).map(i => col(s"_s$i")): _*).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"), countDistinct(col(key)).as("n_keys"))
  }

  /** Temperature-scaled source mixing (the multilingual-corpus
    * rebalancing rule): per-source token share p, smoothed share
    * q ∝ p^alpha, and rep_factor = q/p — the expected per-source
    * duplication under the smoothed draw (> 1 ⇒ upsample). One
    * map-side-combined groupBy over the corpus; everything after is
    * source-cardinality math. `weight` is the per-row mass column
    * (token count, char count, …). */
  def temperatureMix(df: DataFrame, source: String, weight: String,
                     alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    // Determinism discipline (ADVICE r6): every cross-partition sum
    // routes through exact DECIMAL addition ([[dsumHi]] — the
    // high-precision form of Tables.dsum, because the shares here must
    // normalize to 1 at full double precision, which (25,6)
    // quantization would visibly break), so the weights are byte-stable
    // across partitionings/reruns — the discipline the oracle-checked
    // `corpus_temperature_mix` follows. The default alpha=0.5 path uses
    // sqrt (exactly-rounded IEEE op), not pow (implementation-defined
    // last-ulp). Everything after the two sums is per-source
    // deterministic IEEE scalar math.
    val src = df.groupBy(col(source).as("source"))
      .agg(count(lit(1)).as("n_rows"),
        dsumHi(col(weight).cast("double"), scale = 12).as("mass"))
    val tot = src.agg(dsumHi(col("mass"), scale = 12).as("total"))
    val withP = src.crossJoin(broadcast(tot))
      .withColumn("p", col("mass") / col("total"))
      .withColumn("pa", if (alpha == 0.5) sqrt(col("p")) else pow(col("p"), alpha))
    val z = withP.agg(dsumHi(col("pa"), scale = 18).as("z"))
    withP.crossJoin(broadcast(z))
      .withColumn("q", col("pa") / col("z"))
      .select(col("source"), col("n_rows"), col("mass"), col("p"), col("q"),
        (col("q") / col("p")).as("rep_factor"))
  }

  /** k-means IVF cell assignment (VERDICT r5 #3): `iters` Lloyd rounds
    * (seeds = the `k` lowest-id vectors, broadcast-argmin assignment,
    * 6-dp-snapped distances and centroid means so re-runs byte-match on
    * any partitioning), returning one (id, cell) row per vector. At
    * 100 TB: train on a sample, persist the centroid table as the index
    * artifact, write the corpus partitioned by cell so probes prune to
    * one partition. Cells follow the data distribution, so
    * recall-per-probe beats a hash/sign-grid bucketing at equal probe
    * count (measured: 0.2 → 0.7 recall@10 on the sf0.01 fixture). */
  def kmeansAssign(df: DataFrame, id: String, vec: String,
                   k: Int = 16, iters: Int = 2): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive: k=$k iters=$iters")
    val e = df.select(col(id).as("vec_id"), col(vec).cast("array<double>").as("x"))
    // same loud null/ragged validation as the PQ encoders (review r10):
    // a null vector would otherwise argmin to the lowest cell id and a
    // ragged one would silently poison the centroid means
    validatedDim(e, vec, 1)
    graft.ops.VectorOps.assignCells(e,
      graft.ops.VectorOps.kmeansCentroids(e, iters, k))
      .select(col("vec_id").as(id), col("cell"))
  }

  /** Product-quantization encoder: split `vec` into `m` equal subvectors,
    * Lloyd-train `k` centroids per subspace ([[kmeansAssign]] machinery)
    * and emit one (id, code) row with the m-element cell-id array — the
    * 4-bytes-per-vector storage form ANN serves from at corpus scale
    * (floats stay out of the probe path; see `knn_pq` for the ADC
    * shortlist + exact rerank read side). Codebooks are deterministic
    * (lowest-id seeds, snapped arithmetic), so re-encoding is
    * backfill-stable. */
  def pqEncode(df: DataFrame, id: String, vec: String,
               m: Int = 8, k: Int = 16, iters: Int = 2): DataFrame = {
    require(m > 0 && k > 0 && iters > 0, s"m/k/iters must be positive: $m/$k/$iters")
    val gen = beginPins() // retire completed prior encodes' cached frames
    try {
      val e = df.select(col(id).as("vec_id"), col(vec).cast("array<double>").as("x"))
      val sub = validatedDim(e, vec, m) / m
      // Long-form training (the `knn_pq` structure): all m codebooks train
      // in ONE frame keyed by the subspace column — one Lloyd pass and one
      // assignment regardless of m, instead of m sequential trainings. The
      // subvector frame and the trained codebook are pinned ([[pinned]])
      // so the Lloyd fold's and the assignment's many plan references read
      // cached blocks instead of re-running the upstream scan per
      // reference.
      val emLong = pinned(gen, e.select(col("vec_id"), posexplode(array((0 until m).map(i =>
          slice(col("x"), i * sub + 1, sub)): _*)))
        .select(col("vec_id"), col("pos").cast("int").as("m"), col("col").as("x")))
      val cents = pinned(gen, graft.ops.VectorOps.kmeansCentroidsLong(emLong, iters, k))
      graft.ops.VectorOps.assignCellsLong(emLong, cents)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("m"), col("cell")))).as("p"))
        .select(col("vec_id").as(id),
          transform(col("p"), x => x.getField("cell")).as("code"))
    } finally endPins(gen)
  }

  /** Eagerly-materialized persist for the encoders' shared frames: the
    * Lloyd training folds and the final assignment reference these
    * frames many times in one plan, and without a cache every reference
    * re-executes the upstream subtree (the multi-consumer recompute
    * class the ops twins pin with their generation-managed caches).
    * Generationally retired like VectorOps' cacheEager (review r7):
    * each encoder call opens a CALL-LOCAL generation via [[beginPins]]
    * and hands it back via [[endPins]] when the call exits; the next
    * call's beginPins retires every generation whose owning call has
    * ENDED. A driver looping encode jobs therefore holds at most one
    * completed call's blocks — and, unlike the old shared-buffer form
    * (ADVICE r10), a concurrent encoder can never unpersist an in-flight
    * call's pins mid-materialization (which was silent full recompute:
    * correct results, uncached cost). */
  private val retireablePins =
    scala.collection.mutable.Queue.empty[scala.collection.mutable.ArrayBuffer[DataFrame]]

  // CacheLifecycle.retire, not raw unpersist (review r10): a generation
  // pinned by a now-stopped SparkSession must not fail the replacement
  // session's first encode with the dead context's block-manager RPC.
  private def beginPins(): scala.collection.mutable.ArrayBuffer[DataFrame] =
    synchronized {
      while (retireablePins.nonEmpty)
        graft.ops.CacheLifecycle.retire(retireablePins.dequeue())
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    }

  private def endPins(
      gen: scala.collection.mutable.ArrayBuffer[DataFrame]): Unit =
    synchronized { retireablePins.enqueue(gen); () }

  // The generation buffer is call-local, so registration needs no lock
  // and the eager count (a full Spark job) blocks nobody.
  private def pinned(gen: scala.collection.mutable.ArrayBuffer[DataFrame],
                     df: DataFrame): DataFrame = {
    gen += df
    df.persist()
    df.count(); df
  }

  /** Frame-level vector validation shared by the PQ encoders (ADVICE
    * r6): ONE column-pruned aggregate replaces the old one-arbitrary-row
    * probe — a null vector or ragged lengths fail loudly here instead of
    * NPE-ing the probe or silently emitting truncated/null subvector
    * codes. Returns the (uniform) dimensionality. */
  private def validatedDim(e: DataFrame, vec: String, m: Int): Int = {
    val st = e.agg(count(lit(1)).as("n"),
        sum(when(col("x").isNull, 1L).otherwise(0L)).as("nulls"),
        min(size(col("x"))).as("mn"), max(size(col("x"))).as("mx"))
      .collect()(0)
    if (st.getLong(0) == 0L) throw new IllegalArgumentException(
      s"no rows — cannot infer vector dimensionality from '$vec'")
    require(st.getLong(1) == 0L,
      s"${st.getLong(1)} null vectors in '$vec' — drop or impute upstream")
    val (n, mx) = (st.getInt(2), st.getInt(3))
    require(n == mx,
      s"ragged vector lengths in '$vec' (min $n, max $mx) — uniform length required")
    require(n % m == 0, s"vector length $n not divisible by m=$m subspaces")
    n
  }

  /** IVF + residual-PQ index encoder — the artifact producer for the
    * `knn_ivf_pq` read path: each vector coarse-assigns to a learned
    * cell, and its RESIDUAL (vector − coarse centroid, 6-dp-snapped)
    * PQ-encodes against codebooks trained long-form across all `m`
    * subspaces (one Lloyd pass regardless of m). Emits
    * (id, cell, code[m]) — the complete ANN index row: write it
    * partitioned by `cell` and a probe reads ONE cell's m-byte codes
    * plus the small codebooks, never the float vectors (those are
    * fetched only for the shortlist rerank). Deterministic (lowest-id
    * seeds, snapped arithmetic), so re-encoding is backfill-stable. */
  def ivfPqEncode(df: DataFrame, id: String, vec: String,
                  cells: Int = 16, m: Int = 8, k: Int = 16,
                  iters: Int = 2): DataFrame = {
    require(cells > 0 && m > 0 && k > 0 && iters > 0,
      s"cells/m/k/iters must be positive: $cells/$m/$k/$iters")
    val gen = beginPins() // retire completed prior encodes' cached frames
    try {
      val e = df.select(col(id).as("vec_id"), col(vec).cast("array<double>").as("x"))
      val sub = validatedDim(e, vec, m) / m
      // Pin the coarse centroids, the assignment, and the residual long
      // form (review r7): coarse feeds the assignment AND the residual
      // broadcast, asg feeds the residual build AND the final cell join,
      // emLong feeds the Lloyd fold and the code assignment — unpinned,
      // each plan reference would re-run the full coarse training subtree.
      val coarse = pinned(gen, graft.ops.VectorOps.kmeansCentroids(e, iters, cells))
      val asg = pinned(gen, graft.ops.VectorOps.assignCells(e, coarse))
      val emLong = pinned(gen, e.join(asg, "vec_id")
        .join(broadcast(coarse), col("cell") === col("cid"))
        .select(col("vec_id"),
          zip_with(col("x"), col("cv"), (a, b) => r6(a - b)).as("rx"))
        .select(col("vec_id"), posexplode(array((0 until m).map(i =>
          slice(col("rx"), i * sub + 1, sub)): _*)))
        .select(col("vec_id"), col("pos").cast("int").as("m"), col("col").as("x")))
      val cents = pinned(gen, graft.ops.VectorOps.kmeansCentroidsLong(emLong, iters, k))
      graft.ops.VectorOps.assignCellsLong(emLong, cents)
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("m"), col("cell")))).as("p"))
        .select(col("vec_id"),
          transform(col("p"), x => x.getField("cell")).as("code"))
        .join(asg, "vec_id")
        .select(col("vec_id").as(id), col("cell"), col("code"))
    } finally endPins(gen)
  }

  /** Persist a complete IVF + residual-PQ ANN index for `df` under
    * `path` — the production "build once at ingest, probe forever" job
    * (the registry twin is `build_ivfpq_index` over the harness corpus):
    * trains the coarse quantizer and both PQ codebooks, encodes the
    * corpus, and writes the parquet artifact set (`coarse`, `cells`,
    * `pq_codebooks`, `pq_codes`, `ivfpq_codebooks`, `ivfpq_codes`
    * hive-partitioned by coarse cell, plus a root `_SUCCESS` commit
    * marker). A probe reads ONE cell directory + two broadcast codebook
    * tables; float vectors stay out of the read path until the shortlist
    * rerank. Training is deterministic (lowest-id seeds, 6-dp-snapped
    * DECIMAL arithmetic), so a rebuild byte-matches — backfill-stable.
    * Returns the per-cell manifest (cell, n_vecs, n_codes), the fan-out a
    * capacity planner reads. */
  def buildAnnIndex(df: DataFrame, id: String, vec: String, path: String,
                    cells: Int = 16, m: Int = 8, k: Int = 16,
                    iters: Int = 2): DataFrame = {
    require(cells > 0 && m > 0 && k > 0 && iters > 0,
      s"cells/m/k/iters must be positive: $cells/$m/$k/$iters")
    val e = df.select(col(id).as("vec_id"), col(vec).cast("array<double>").as("x"))
    validatedDim(e, vec, m)
    val s = df.sparkSession
    val ix = graft.ops.IvfPqIndex.Ix(path)
    graft.ops.IvfPqIndex.buildAt(s, e, ix, cells, m, k, iters)
    val nv = s.read.parquet(ix.cells)
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val nc = s.read.parquet(ix.ivfCodes)
      .groupBy("cell").agg(count(lit(1)).as("n_codes"))
    nv.join(nc, "cell").select(col("cell"), col("n_vecs"), col("n_codes"))
  }

  /** Hot-cell SPLIT maintenance on a stored [[buildAnnIndex]] layout —
    * the remedy for what [[annIndexStats]]'s `imbalance`/`max_cell`
    * detect (the facade form of the registry's `ann_index_split`, and
    * the ANN mirror of the MinHash hot-bucket reband): cells holding ≥
    * `hotSize` vectors train `subK` sub-centroids on their RESIDUALS
    * against the stored coarse centroids (one grouped Lloyd pass trains
    * every hot cell in the same jobs, same 6-dp-snapped deterministic
    * math as the codebooks) and re-assign into `coarse_split` /
    * `cells_split` side-tables next to the index, guarded by their own
    * `_split_SUCCESS` commit marker (a crash mid-write reads as "no
    * split"). Probes narrow a split cell to the sub-cells nearest the
    * query's residual instead of scanning `max_cell` vectors. `df` must
    * be the SAME corpus the index was built from — only the hot cells'
    * vectors are read. Returns the per-hot-cell manifest
    * (cell, n_vecs, n_sub, max_sub); empty when no cell is hot.
    * Harness twin: `ann_index_split` / `knn_ivf_split`. */
  def annIndexSplit(df: DataFrame, id: String, vec: String, path: String,
                    hotSize: Long = 32L, subK: Int = 4): DataFrame = {
    require(hotSize > 1 && subK > 1,
      s"hotSize/subK must exceed 1: $hotSize/$subK")
    val s = df.sparkSession
    val ix = graft.ops.IvfPqIndex.Ix(path)
    val e = df.select(col(id).as("vec_id"),
      col(vec).cast("array<double>").as("x"))
    graft.ops.IvfPqIndex.rewriteSplitFrom(
      graft.ops.VectorOps.splitRowsOf(s, e, ix, hotSize, subK), ix)
    graft.ops.VectorOps.splitManifest(s, ix)
  }

  /** APPEND a batch of vectors to a stored [[buildAnnIndex]] layout —
    * the facade form of the registry's `ann_index_append` (r13, the ANN
    * mirror of [[minhashIndexAppend]]): the batch coarse-assigns
    * against the STORED centroids and residual-encodes against the
    * STORED codebooks — NO retraining, so a re-encode of the same batch
    * is byte-identical — and folds into the single committed
    * `ivfpq_codes_delta` sibling (distinct per (vec_id, m): a replayed
    * batch folds to the same rows, the foreachBatch replay contract).
    * The probe resolvers ([[graft.ops.IvfPqIndex.resolvedCodes]], the
    * split-aware [[graft.streaming.StreamingOps.annProbeBatch]] pool)
    * serve base ∪ committed delta, so an appended vector is servable
    * the very next probe with no compact. Rows whose `vec_id` the base
    * `cells` table already holds are SKIPPED (already indexed — this is
    * what makes a replay AFTER [[annIndexCompact]] a clean no-op
    * instead of double-serving the id through base and delta). The
    * delta rewrite runs under the retired root marker: overwrite drops
    * the old generation first, so a crash mid-write must read as an
    * uncommitted index, not a valid index silently missing its
    * appended vectors. Returns the merged per-cell manifest
    * (cell, n_base, n_new). At 100 TB this is the daily vector
    * arrival job: two broadcast-argmin map passes over the batch plus
    * one delta-sized write — the corpus and the stored codes are never
    * rescanned. */
  def annIndexAppend(batch: DataFrame, id: String, vec: String,
                     path: String): DataFrame = {
    val s = batch.sparkSession
    val ix = graft.ops.IvfPqIndex.Ix(path)
    val meta = graft.ops.Artifacts.readMeta(path)
    // Geometry refusals BEFORE the marker retirement (the lifecycle
    // discipline): a rejected call leaves a valid index valid.
    Seq("m", "dim").foreach(k => require(meta.contains(k),
      s"index at $path records no '$k' geometry — rebuild via buildAnnIndex"))
    val mM = meta("m").toInt
    val dim = meta("dim").toInt
    val sub = dim / mM
    // A committed operator-managed compact sibling SHADOWS the delta in
    // every probe resolver (served first, deltas ignored) — an append
    // would commit rows no probe serves and the facade compact refuses
    // while the sibling exists, so refuse HERE, loudly (review r13).
    require(!graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        ix.ivfCodesCompact, "_SUCCESS")),
      s"index at $path carries a committed ivfpq_codes_compact sibling, " +
        "which probes serve in preference to the delta this append " +
        "would write — retire it (or fold it in) before appending")
    // A crashed prior lifecycle op leaves the root marker retired; an
    // append on top would mutate a possibly half-rewritten index.
    require(graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(path, "_SUCCESS")),
      s"index at $path is not committed (a crashed lifecycle op?) — " +
        "rebuild via buildAnnIndex before appending")
    val e = batch.select(col(id).as("vec_id"),
      col(vec).cast("array<double>").as("x"))
    // An EMPTY day commits a no-op cleanly (the minhashIndexAppend
    // contract): dim is known from the stored meta, so there is nothing
    // to validate or encode — the fold below just rewrites the prior
    // delta (or lands a data-file-less one).
    val newCodes =
      if (e.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            graft.ops.VectorOps.codesSchema.fields.filter(_.name != "pcell")))
      else {
        val got = validatedDim(e, vec, mM)
        require(got == dim,
          s"batch vectors are $got-dimensional; the index at $path was " +
            s"trained at dim=$dim")
        val fresh = e.join(s.read.parquet(ix.cells).select("vec_id"),
          Seq("vec_id"), "left_anti")
        // ONE shared stored-codebook encode path with the registry append
        // (review r13): byte-stable replay must not be able to drift.
        graft.ops.VectorOps.encodeAgainstStored(fresh,
          s.read.parquet(ix.coarse), s.read.parquet(ix.ivfCodebooks),
          mM, sub)
      }
    // Fold into the single delta generation. Declared schema on the
    // prior read: a previous empty append commits a data-file-less
    // table. localCheckpoint severs the read from the overwrite.
    val merged = (if (graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        ix.ivfCodesDelta, "_SUCCESS")))
      s.read.schema(graft.ops.VectorOps.codesSchema)
        .parquet(ix.ivfCodesDelta)
        .select("vec_id", "m", "code", "cell")
        .unionByName(newCodes)
    else newCodes).distinct().localCheckpoint()
    withRetiredMarker(path) {
      merged.withColumn("pcell", col("cell"))
        .repartition(col("pcell"))
        .write.mode("overwrite").partitionBy("pcell")
        .parquet(ix.ivfCodesDelta)
    }
    val nBase = s.read.parquet(ix.cells)
      .groupBy("cell").agg(count(lit(1)).as("n_base"))
    val nNew = s.read.schema(graft.ops.VectorOps.codesSchema)
      .parquet(ix.ivfCodesDelta)
      .filter(col("m") === 0)
      .groupBy("cell").agg(count(lit(1)).as("n_new"))
    nBase.join(nNew, Seq("cell"), "full_outer")
      .select(col("cell"), coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .orderBy("cell")
  }

  /** COMPACT a stored [[buildAnnIndex]] layout in place (r13, the ANN
    * mirror of [[minhashIndexCompact]]): folds the committed
    * `ivfpq_codes_delta` into the `ivfpq_codes` table and the appended
    * (vec_id, cell) memberships into `cells`, removes the folded delta,
    * and retires any `_split_SUCCESS` (the split side-tables reflect
    * PRE-compact cell membership — probes fall back to whole-cell pools
    * until the next [[annIndexSplit]], the same rule the takedown
    * applies). Single layout afterwards; probes resolve base alone and
    * return exactly what base ∪ delta returned (the fold is a set
    * union, distinct per (vec_id, m) row — replay-idempotent). Runs
    * under the retired root marker; refuses while a committed
    * operator-managed `ivfpq_codes_compact` sibling would shadow the
    * folded base. Returns the per-cell manifest (cell, n_vecs,
    * n_codes) of the compacted table. */
  def annIndexCompact(spark: SparkSession, path: String): DataFrame = {
    val ix = graft.ops.IvfPqIndex.Ix(path)
    require(!graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        ix.ivfCodesCompact, "_SUCCESS")),
      s"index at $path carries a committed ivfpq_codes_compact sibling " +
        "(served FIRST by the probe resolver) — retire it before " +
        "compacting in place")
    // Same rationale as minhashIndexCompact (review r13): the in-place
    // fold must not run on top of a crashed lifecycle op's partial base.
    require(graft.ops.IndexFs.isFile(
        graft.ops.IndexFs.child(path, "_SUCCESS")),
      s"index at $path is not committed (a crashed lifecycle op?) — " +
        "rebuild via buildAnnIndex instead of compacting")
    if (graft.ops.IndexFs.isFile(graft.ops.IndexFs.child(
        ix.ivfCodesDelta, "_SUCCESS"))) {
      val delta = spark.read.schema(graft.ops.VectorOps.codesSchema)
        .parquet(ix.ivfCodesDelta)
        .select("vec_id", "m", "code", "cell")
      val merged = spark.read.parquet(ix.ivfCodes)
        .select("vec_id", "m", "code", "cell")
        .unionByName(delta)
        .distinct()
        .localCheckpoint()
      val newCells = spark.read.parquet(ix.cells)
        .unionByName(delta.filter(col("m") === 0).select("vec_id", "cell"))
        .distinct()
        .localCheckpoint()
      withRetiredMarker(path) {
        merged.withColumn("pcell", col("cell"))
          .repartition(col("pcell"))
          .write.mode("overwrite").partitionBy("pcell")
          .parquet(ix.ivfCodes)
        newCells.write.mode("overwrite").parquet(ix.cells)
        require(graft.ops.IndexFs.deleteRecursive(ix.ivfCodesDelta),
          s"could not remove the folded delta under $path")
        val split = graft.ops.IndexFs.child(path, "_split_SUCCESS")
        if (graft.ops.IndexFs.isFile(split))
          require(graft.ops.IndexFs.delete(split),
            s"could not retire the stale split marker under $path")
      }
    }
    spark.read.parquet(ix.ivfCodes)
      .groupBy("cell")
      .agg(countDistinct(col("vec_id")).as("n_vecs"),
        count(lit(1)).as("n_codes"))
      .orderBy("cell")
  }

  /** Health audit of a stored ANN index ([[buildAnnIndex]] layout) — the
    * one-row dashboard an operator reads before deciding to re-train:
    * cell coverage vs the quantizer's `quantizerCells` capacity, size
    * skew (`imbalance` = 6-dp max-over-mean cell size, the re-train
    * trigger; `max_cell` bounds worst-case probe I/O), and the raw code
    * count for the m-codes-per-vector encode cross-check. Caller passes
    * the STORED tables (`cells` = (vec_id, cell), `codes` = the code
    * manifest) — reads touch only scalar columns, never floats, so the
    * audit costs one pass over ~12 bytes/vector at any corpus size.
    * Harness twin: `ann_index_stats`. */
  def annIndexStats(cells: DataFrame, codes: DataFrame,
                    quantizerCells: Int): DataFrame = {
    require(quantizerCells > 0, "quantizerCells must be positive")
    val per = cells.groupBy("cell").agg(count(lit(1)).as("n"))
    per.agg(
        count(lit(1)).as("n_cells"),
        sum(col("n")).as("n_vecs"),
        min(col("n")).as("min_cell"),
        max(col("n")).as("max_cell"),
        r6(max(col("n")) * count(lit(1)) / sum(col("n")).cast("double"))
          .as("imbalance"))
      .withColumn("empty_cells", lit(quantizerCells.toLong) - col("n_cells"))
      .crossJoin(broadcast(codes.agg(count(lit(1)).as("n_codes"))))
      .select(col("n_cells"), col("n_vecs"), col("min_cell"),
        col("max_cell"), col("imbalance"), col("empty_cells"), col("n_codes"))
  }

  /** Bucket-size skew audit over a stored MinHash postings table
    * ([[writeMinhashIndex]] layout / [[minhashBands]] output): per band,
    * the bucket count, max bucket, hot (≥2) vs singleton split, and the
    * exact LSH candidate-pair volume Σ sz·(sz−1)/2 that band will feed a
    * pair join — the quadratic-blowup early warning that decides a
    * re-band (more bands / more rows per band) before a hot bucket
    * stalls candidate generation. Two fixed-width aggregations over the
    * stored scalar columns; document text is never touched. Harness
    * twin: `minhash_index_stats`. */
  def minhashIndexSkew(bands: DataFrame): DataFrame = {
    val buckets = bands.groupBy("band", "band_key").agg(count(lit(1)).as("sz"))
    buckets.groupBy("band")
      .agg(count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(when(col("sz") >= 2, 1L).otherwise(0L)).as("hot_buckets"),
        sum(when(col("sz") === 1, 1L).otherwise(0L)).as("singletons"),
        sum((col("sz") * (col("sz") - 1) / 2).cast("long")).as("cand_pairs"))
      .select(col("band").cast("int").as("band"), col("n_buckets"),
        col("max_bucket"), col("hot_buckets"), col("singletons"),
        col("cand_pairs"))
  }

  /** Metadata-FILTERED ANN against a stored index: top-`k` by cosine
    * among rows of `df` satisfying `pred`, scanning only the `probes`
    * coarse cells nearest the `query` vector. `coarse`/`cells` are the
    * stored quantizer tables ([[buildAnnIndex]] layout: (cid, cv) and
    * (vec_id, cell)). Pre-filtering inside the probe, not post-filtering
    * an unfiltered top-k: `pred` should reference scalar metadata
    * columns of `df` so Catalyst pushes it to the candidate scan, and
    * the probe fans wider than an unfiltered query's single cell because
    * a filter thins each cell's pool. Exact cosine runs only on the
    * filter-surviving candidates of the probed cells — at 100 TB with a
    * cell-partitioned layout the probe touches ~k/selectivity vectors,
    * never the corpus. Harness twin: `knn_filtered`. */
  def annFilteredTopK(df: DataFrame, id: String, vec: String,
                      coarse: DataFrame, cells: DataFrame,
                      query: Seq[Double], pred: Column,
                      probes: Int = 4, k: Int = 10): DataFrame = {
    require(probes > 0 && k > 0, s"probes/k must be positive: $probes/$k")
    def dot2(a: Column, b: Column) = graft.functions.VectorFunctions.graftDot(a, b)
    val qv = typedLit(query)
    val probeCells = coarse
      .select(col("cid"), r6(dot2(qv, qv) - lit(2) * dot2(qv, col("cv")) +
        dot2(col("cv"), col("cv"))).as("d"))
      .orderBy(col("d").asc, col("cid").asc).limit(probes)
      .select("cid")
    val x = col(vec).cast("array<double>")
    df.filter(pred)
      .withColumnRenamed(id, "_gid")
      .join(cells, col("_gid") === col("vec_id"))
      .join(broadcast(probeCells), col("cell") === col("cid"))
      .select(col("_gid").as(id), {
        // zero-norm guard as in truncatedDimRecall: NaN sorts above
        // every real cosine under desc, null sorts last (review r10)
        val den = sqrt(dot2(x, x)) * sqrt(dot2(qv, qv))
        r6(when(den =!= 0.0, dot2(x, qv) / den)).as("cosine")
      })
      .orderBy(col("cosine").desc, col(id).asc)
      .limit(k)
  }

  /** Corpus-scaled sign-bit bucketing for near-dup candidate generation:
    * the bit width grows with the row count (least B with 2^B ≥
    * n/targetBucketSize), so the same call that yields 32 buckets on a
    * 500-row fixture yields ~n/T buckets on a 100 TB corpus and
    * same-bucket pair volume stays ~linear in n. Returns `df` plus a
    * `bucket` column. True near-dups (cosine → 1) share every sign bit
    * and always co-bucket; for recall beyond sign agreement, gate with
    * [[kmeansAssign]] cells instead. Harness twin: `embed_neardup`. */
  def scaledSignBuckets(df: DataFrame, vec: String,
                        targetBucketSize: Int = 16): DataFrame = {
    require(targetBucketSize > 0, s"targetBucketSize must be positive")
    graft.ops.VectorOps.scaledCells(df,
        j => targetBucketSize.toLong * (1L << (j - 1)), vec)
      .withColumnRenamed("cell", "bucket")
  }

  /** SemDeDup cell rule: √n sign-bit cells (least B with 4^B ≥ n) — the
    * cluster column to hand [[semanticDedup]] when no learned clustering
    * is available. Harness twin: `semantic_dedup_scaled`. */
  def sqrtNSignCells(df: DataFrame, vec: String): DataFrame =
    graft.ops.VectorOps.scaledCells(df, j => 1L << (2 * (j - 1)), vec)

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows by the codegen'd `graft_dot` product over L2-normalized
    * vectors. Corpus-side scoring is map-side (queries broadcast); the
    * per-query top-k is the row_number idiom → native TopKPerGroup under
    * GraftExtensions. At IVF scale, pre-bucket the corpus instead. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame,
                 qId: String, cId: String, vec: String, k: Int): DataFrame = {
    val q = l2Normalize(queries.select(col(qId).as("query_id"), col(vec)), vec)
      .withColumnRenamed(vec, "_qv")
    val c = l2Normalize(corpus.select(col(cId).as("corpus_id"), col(vec)), vec)
      .withColumnRenamed(vec, "_cv")
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine",
        graft.functions.VectorFunctions.graftDot(col("_qv"), col("_cv")))
      .select("query_id", "corpus_id", "cosine")
    topKPerGroup(scored, Seq("query_id"), "cosine", "corpus_id", k)
  }

  /** SemDeDup-style semantic dedup over a caller-supplied CLUSTER column
    * (k-means cell id, LSH bucket, shard key — whatever bounds the
    * candidate space): within each cluster, drop a row iff a LOWER-`id`
    * row sits within cosine ≥ `tau`; survivors keep `keep = true`,
    * dropped rows carry their lowest-id near-dup as `rep_id`. Greedy by
    * id — local, deterministic, no transitive closure (pair volume is
    * Σ|cluster|², the quantity the caller's clustering controls).
    * Harness twin: `semantic_dedup` (VectorOps.semanticDedup). */
  def semanticDedup(df: DataFrame, id: String, cluster: String, vec: String,
                    tau: Double): DataFrame = {
    // cosine written EXACTLY as the harness twin (graftDot / (norm·norm),
    // then 6-dp snap) so facade and harness agree bit-for-bit at τ
    def d(a: Column, b: Column): Column = graft.functions.VectorFunctions.graftDot(a, b)
    val av = col("a._v").cast("array<double>")
    val bv = col("b._v").cast("array<double>")
    val cos = r6(d(av, bv) / (sqrt(d(av, av)) * sqrt(d(bv, bv))))
    val slim = df.select(col(id), col(cluster), col(vec).as("_v"))
    val reps = slim.as("a")
      .join(slim.as("b"),
        col(s"a.$cluster") === col(s"b.$cluster") && col(s"a.$id") > col(s"b.$id"))
      .select(col(s"a.$id").as(id), col(s"b.$id").as("_bid"), cos.as("_cos"))
      .filter(col("_cos") >= tau)
      .groupBy(id).agg(min(col("_bid")).as("_rep"))
    df.select(col(id), col(cluster))
      .join(reps, Seq(id), "left")
      .select(col(id), col(cluster),
        col("_rep").isNull.as("keep"),
        coalesce(col("_rep"), col(id)).as("rep_id"))
  }
}
