package graft.jobs

import org.apache.spark.sql.functions._

/** spark-submit entry point for the STEADY-STATE DAILY RUN — the job that
  * absorbs a day's document batch into an already-curated corpus using
  * only the stored base artifacts (r9: the operable composition of
  * `curation_incremental`, `shard_pack_incremental`'s continuation
  * packing, and `dedup_index_append`):
  *
  *   1. VERDICTS: every batch doc gets the quality / exact-dup /
  *      near-dup / decontamination verdict against the base fingerprints,
  *      persisted MinHash postings, and eval shingles
  *      ([[graft.ops.PipelineOps.curationIncremental]]) →
  *      `<outDir>/verdicts`;
  *   2. SHARDS: the day's KEEPERS pack into training shards continuing
  *      the global shard numbering — the packer's whole state is one
  *      scalar (tokens already packed), passed as the optional third
  *      argument: the PREVIOUS run's reported `packed_tokens_total`
  *      (cumulative — the report emits it precisely so it can be fed
  *      back verbatim), or derived from the base slice for the demo
  *      corpus → `<outDir>/shards`;
  *   3. INDEX: the batch's band postings land as a delta next to the
  *      base MinHash index ([[graft.ops.DedupOps.dedupIndexAppend]]), so
  *      tomorrow's near-dup probe sees today's documents; the per-band
  *      manifest → `<outDir>/postings_manifest`;
  *   4. ANN: the day's embedding batch is encoded against the base
  *      index's STORED codebooks (coarse-assign + residual-PQ, no
  *      retraining — [[graft.ops.VectorOps.annIndexAppend]]) and lands
  *      as a cell-partitioned delta next to the base codes, so
  *      tomorrow's vector probes see today's vectors too; the merged
  *      per-cell manifest → `<outDir>/ann_delta_manifest`. One
  *      spark-submit absorbs a day for BOTH indexes (VERDICT r9 #4);
  *   5. MAINTENANCE AUDIT (r12): hot-shard posture of both index
  *      families over the DELTA-TOUCHED shards of base ∪ today's delta
  *      — (family, hot_shards, max_shard, unremedied, remedy_job) rows
  *      → `<outDir>/maintenance`, with the counts on the report line.
  *      `unremedied` (hot shards this root's committed fine/split
  *      side-table does not cover) is the scheduler's trigger — it
  *      converges to 0 after the remedy runs against this root, while
  *      `hot_shards` stays the raw posture. Cost class: one
  *      scalar-column pass over the stored postings (the stats-ops
  *      shape), aggregated only over shards the day touched — the
  *      corpus text is still never re-read.
  *
  * Every stage re-runs idempotently (all writes are overwrites keyed by
  * the batch), and at 100 TB the job costs one pass over the DAY plus
  * one scalar-column pass over the stored postings for the maintenance
  * audit (stage 5 — the same ~12-bytes-per-posting class as the stats
  * ops): the base corpus TEXT is never re-read — that is the point of
  * the stored-artifact architecture.
  *
  * Usage:
  * {{{
  * spark-submit --class graft.jobs.DailyIncrement graft-engine.jar \
  *   /data/corpus/sfdir /data/corpus/increments/2026-08-15 [packedTokens]
  * }}}
  */
object DailyIncrement {

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: DailyIncrement <sfDir> <outDir> [packedTokens]")
    val sfDir = args(0)
    val outDir = args(1)
    val spark = JobSession.get("graft-daily-increment")
    try {
      graft.ops.PipelineOps.curationIncremental(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/verdicts")
      val verdicts = spark.read.parquet(s"$outDir/verdicts")
      val keep = verdicts.filter(col("verdict") === "keep").select("doc_id")
      val cut = graft.ops.DedupOps.IncrementalCutoff
      // shared tokenization (review r10): one definition with the
      // registry packer, so the base/batch token formula cannot drift
      val toks = graft.ops.PipelineOps.tokenCounts(spark, sfDir)
      // BATCH rows only feed the packer — keep ⊆ batch, so the result is
      // identical, but the doc_id filter pushes to the parquet scan: the
      // steady-state day never re-tokenizes the base corpus text (review
      // r10 — pre-filter, the join evaluated split(text) for every base
      // document and discarded it).
      val batchToks = toks.filter(col("doc_id") >= cut)
      // The packer's whole state is one scalar: tokens already packed
      // BEFORE this batch (args(2) = yesterday's reported
      // packed_tokens_total; derived from the base slice for the demo
      // corpus when absent). Resolved to a concrete long here because the
      // report line must carry the CUMULATIVE total back out — emitting
      // only the day's sum would make a caller who feeds it back restart
      // shard numbering near zero (ADVICE r9).
      val baseTokens = args.lift(2).map(_.toLong).getOrElse(
        toks.filter(col("doc_id") < cut)
          .agg(coalesce(sum(col("n_tokens")), lit(0L)))
          .head().getLong(0))
      val state = spark.range(1).select(lit(baseTokens).as("base_tokens"))
      graft.ops.PipelineOps.packByBudget(
          batchToks.join(keep, "doc_id"),
          budget = graft.ops.PipelineOps.IncrementalShardBudget,
          startTokens = Some(state))
        .write.mode("overwrite").parquet(s"$outDir/shards")
      graft.ops.DedupOps.dedupIndexAppend(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/postings_manifest")
      graft.ops.VectorOps.annIndexAppend(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/ann_delta_manifest")
      val annNew = spark.read.parquet(s"$outDir/ann_delta_manifest")
        .agg(coalesce(sum("n_new"), lit(0L))).head().getLong(0)
      // 5. MAINTENANCE AUDIT (r12): after the day lands, re-check both
      // index families' hot-shard posture — the operable form of the
      // detect→remedy loop. Semantics chosen so the loop CONVERGES and
      // stays O(day + one scalar-column pass) (review r12):
      //   - only shards the DELTA touched are audited (nothing else can
      //     newly cross a threshold today); the sizes still count
      //     base ∪ delta rows, so a slow multi-day drift is caught the
      //     day it crosses;
      //   - `unremedied` counts hot shards NOT covered by THIS root's
      //     committed fine/split side-table — it returns to 0 once the
      //     remedy runs against this root (for an incremental root:
      //     compact the delta in, then refresh the side-table — the
      //     registry reband/split jobs on the compacted root, or the
      //     GraftAPI facades pointed here), while `hot_shards` remains
      //     the raw posture;
      //   - both families audit the SAME root their artifacts live
      //     under (the base+delta lifecycle), so the counts and the
      //     remedy operate on one geometry.
      // The scan cost is the stats-ops class (fixed-width scalar
      // columns, ~12 bytes/posting — never the corpus text), and the
      // delta-key semi-join keeps the aggregation to touched shards.
      def hotPosture(postings: org.apache.spark.sql.DataFrame,
                     touched: org.apache.spark.sql.DataFrame,
                     keys: Seq[String], threshold: Long,
                     covered: org.apache.spark.sql.DataFrame)
          : (Long, Long, Long) = {
        val hot = postings
          .join(broadcast(touched.distinct()), keys, "left_semi")
          .groupBy(keys.map(col): _*).agg(count(lit(1)).as("sz"))
          .filter(col("sz") >= threshold)
          .persist()
        val agg = hot.agg(count(lit(1)).as("n"),
          coalesce(max("sz"), lit(0L)).as("mx")).head()
        val un = hot.join(broadcast(covered.distinct()), keys, "left_anti")
          .count()
        hot.unpersist()
        (agg.getLong(0), agg.getLong(1), un)
      }
      val mhIx = graft.ops.MinhashIndex.ensureBase(spark, sfDir)
      val mhDelta = spark.read.parquet(s"${mhIx.root}/bands_delta")
        .select("band", "band_key")
      val mhFineCovered =
        if (new java.io.File(mhIx.root, "_fine_SUCCESS").isFile)
          spark.read.schema(graft.ops.DedupOps.fineSchema)
            .parquet(s"${mhIx.root}/bands_fine").select("band", "band_key")
        else spark.emptyDataFrame
          .withColumn("band", lit(0)).withColumn("band_key", lit(""))
          .limit(0)
      val (mhHot, mhMax, mhUn) = hotPosture(
        spark.read.parquet(mhIx.bands).select("band", "band_key")
          .unionByName(mhDelta),
        mhDelta, Seq("band", "band_key"),
        graft.ops.DedupOps.RebandHotSize, mhFineCovered)
      val annIx = graft.ops.IvfPqIndex.ensureBase(spark, sfDir)
      val annDelta = spark.read.parquet(s"${annIx.root}/ivfpq_codes_delta")
        .filter(col("m") === 0).select("cell")
      val annSplitCovered =
        if (new java.io.File(annIx.root, "_split_SUCCESS").isFile)
          spark.read.schema(graft.ops.VectorOps.splitCentsSchema)
            .parquet(s"${annIx.root}/coarse_split").select("cell")
        else spark.emptyDataFrame.withColumn("cell", lit(0L)).limit(0)
      val (annHot, annMax, annUn) = hotPosture(
        spark.read.parquet(annIx.cells).select("cell")
          .unionByName(annDelta),
        annDelta, Seq("cell"),
        graft.ops.VectorOps.SplitHotSize, annSplitCovered)
      val sq2 = spark; import sq2.implicits._
      Seq(
        ("minhash", mhHot, mhMax, mhUn,
          "dedup_index_compact + dedup_index_reband (or GraftAPI.writeMinhashIndex fine refresh on this root)"),
        ("ann", annHot, annMax, annUn,
          "ann_index_compact + ann_index_split (or GraftAPI.annIndexSplit on this root)"))
        .toDF("family", "hot_shards", "max_shard", "unremedied", "remedy_job")
        .write.mode("overwrite").parquet(s"$outDir/maintenance")
      val shards = spark.read.parquet(s"$outDir/shards")
      val dayTokens = shards.agg(coalesce(sum("n_tokens"), lit(0L)))
        .head().getLong(0)
      // packed_tokens_total is THE feedback value: pass it verbatim as the
      // next run's third argument. packed_tokens_day is informational.
      val report =
        s"[daily-increment] batch=${verdicts.count()} keep=${keep.count()} " +
          s"packed_tokens_day=$dayTokens " +
          s"packed_tokens_total=${baseTokens + dayTokens} " +
          s"last_shard=${shards.agg(coalesce(max("shard"), lit(-1L))).head().getLong(0)} " +
          s"ann_new=$annNew " +
          s"hot_buckets=$mhHot hot_cells=$annHot " +
          s"unremedied_buckets=$mhUn unremedied_cells=$annUn"
      println(report)
    } finally JobSession.release(spark)
  }
}
