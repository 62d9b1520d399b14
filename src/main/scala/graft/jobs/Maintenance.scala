package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The detect → remedy → re-audit MAINTENANCE loop over both index
  * families' base roots — the execution half VERDICT r12 asked for
  * (round-12 built the audit; nothing ran the remedy it named).
  *
  * [[Maintenance.audit]] is the shared detect step (extracted from
  * [[DailyIncrement]] stage 5, which now calls it): hot-shard posture of
  * both families over the DELTA-TOUCHED shards of base ∪ delta, with
  * `unremedied` = hot shards this root's COMMITTED fine/split side-table
  * does not cover — the scheduler's trigger, converging to 0 once the
  * remedy runs while `hot_shards` stays the raw posture. One
  * scalar-column pass over stored postings; the corpus text is never
  * read.
  *
  * [[MaintenanceRun]] is the remedy executor: for each family the audit
  * reports unremedied > 0 it performs the documented remedy against the
  * SAME root —
  *
  *   - minhash: fold the delta in (`dedup_index_compact`'s layout — the
  *     probe resolver serves it from then on) and REBUILD `bands_fine`
  *     from the resolved postings ([[graft.ops.MinhashIndex.rewriteFine]]
  *     — deterministic, so a re-run byte-matches);
  *   - ann: fold the codes delta in (`ann_index_compact`) and rebuild
  *     the cell-split side-tables over the RESOLVED membership (base ∪
  *     appended vectors), so a cell pushed over the hot threshold by
  *     appends splits with ALL its members;
  *
  * then re-audits and writes the post-remedy posture. Probe outputs are
  * unchanged by construction (every side-table is a deterministic
  * function of the corpus — the fine/split purity the specs pin), so the
  * remedy is always safe to run; JobsSpec pins the full convergence:
  * planted hot shards → daily run reports unremedied > 0 → maintenance
  * run → re-audit reports 0, probes byte-identical.
  *
  * Usage:
  * {{{
  * spark-submit --class graft.jobs.MaintenanceRun graft-engine.jar \
  *   /data/corpus/sfdir /data/corpus/increments/2026-08-15
  * }}}
  * (second arg = the daily run's outDir; `maintenance` inside it is
  * overwritten with the post-remedy posture.)
  */
object Maintenance {

  /** One family's audited posture. */
  final case class Posture(family: String, hotShards: Long, maxShard: Long,
                           unremedied: Long, remedyJob: String)

  /** Hot-shard posture of `postings` restricted to `touched` shards:
    * (hot count, max size, hot-but-not-`covered` count). Semantics chosen
    * so the loop CONVERGES and stays O(day + one scalar-column pass)
    * (review r12): only shards the delta touched are audited (nothing
    * else can newly cross a threshold today); sizes still count base ∪
    * delta rows, so a slow multi-day drift is caught the day it crosses. */
  private def hotPosture(postings: DataFrame, touched: DataFrame,
                         keys: Seq[String], threshold: Long,
                         covered: DataFrame): (Long, Long, Long) = {
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

  /** The two-family audit over the base roots' resolved state. Reads
    * stored fixed-width tables only (~12 bytes/posting — the stats-ops
    * cost class); deltas are ensured, so the posture is a pure function
    * of the corpus. */
  def audit(spark: SparkSession, sfDir: String): Seq[Posture] = {
    val mhIx = graft.ops.MinhashIndex.ensureBase(spark, sfDir)
    graft.ops.MinhashIndex.ensureDelta(spark, sfDir, mhIx)
    val mhDelta = spark.read.schema(graft.ops.DedupOps.bandsSchema)
      .parquet(mhIx.delta).select("band", "band_key")
    val mhFineCovered =
      if (new java.io.File(mhIx.root, "_fine_SUCCESS").isFile)
        spark.read.schema(graft.ops.DedupOps.fineSchema)
          .parquet(mhIx.fine).select("band", "band_key")
      else spark.emptyDataFrame
        .withColumn("band", lit(0)).withColumn("band_key", lit(""))
        .limit(0)
    val (mhHot, mhMax, mhUn) = hotPosture(
      spark.read.parquet(mhIx.bands).select("band", "band_key")
        .unionByName(mhDelta),
      mhDelta, Seq("band", "band_key"),
      graft.ops.DedupOps.RebandHotSize, mhFineCovered)
    val annIx = graft.ops.IvfPqIndex.ensureBase(spark, sfDir)
    graft.ops.IvfPqIndex.ensureDelta(spark, sfDir, annIx)
    val annDelta = spark.read.schema(graft.ops.VectorOps.codesSchema)
      .parquet(annIx.ivfCodesDelta)
      .filter(col("m") === 0).select("cell")
    val annSplitCovered =
      if (graft.ops.IndexFs.isFile(
          graft.ops.IndexFs.child(annIx.root, "_split_SUCCESS")))
        spark.read.schema(graft.ops.VectorOps.splitCentsSchema)
          .parquet(s"${annIx.root}/coarse_split").select("cell")
      else spark.emptyDataFrame.withColumn("cell", lit(0L)).limit(0)
    val (annHot, annMax, annUn) = hotPosture(
      spark.read.parquet(annIx.cells).select("cell")
        .unionByName(annDelta),
      annDelta, Seq("cell"),
      graft.ops.VectorOps.SplitHotSize, annSplitCovered)
    Seq(
      Posture("minhash", mhHot, mhMax, mhUn,
        "graft.jobs.MaintenanceRun (dedup_index_compact + bands_fine rebuild on this root)"),
      Posture("ann", annHot, annMax, annUn,
        "graft.jobs.MaintenanceRun (ann_index_compact + resolved-membership cell split on this root)"))
  }

  /** A computed audit as the (family, hot_shards, max_shard, unremedied,
    * remedy_job) frame both jobs persist. */
  def auditDF(spark: SparkSession, postures: Seq[Posture]): DataFrame = {
    val sq = spark; import sq.implicits._
    postures
      .map(p => (p.family, p.hotShards, p.maxShard, p.unremedied, p.remedyJob))
      .toDF("family", "hot_shards", "max_shard", "unremedied", "remedy_job")
  }

  /** Execute one family's remedy against the registry base root. */
  private[jobs] def remedy(spark: SparkSession, sfDir: String,
                           family: String): Unit = family match {
    case "minhash" =>
      graft.ops.DedupOps.dedupIndexCompact(spark, sfDir).count()
      val ix = graft.ops.MinhashIndex.ensureBase(spark, sfDir)
      graft.ops.MinhashIndex.rewriteFine(
        graft.ops.DedupOps.fineRowsFor(spark, sfDir,
          graft.ops.MinhashIndex.resolvedPostings(spark, sfDir, ix)), ix)
    case "ann" =>
      graft.ops.VectorOps.annIndexCompact(spark, sfDir).count()
      val ix = graft.ops.IvfPqIndex.ensureBase(spark, sfDir)
      val resolvedCells = graft.ops.IvfPqIndex
        .resolvedCodes(spark, sfDir, ix)
        .filter(col("m") === 0).select("vec_id", "cell")
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
      graft.ops.IvfPqIndex.rewriteSplitFrom(
        graft.ops.VectorOps.splitRowsOf(spark, e, ix,
          graft.ops.VectorOps.SplitHotSize, graft.ops.VectorOps.SplitSubK,
          Some(resolvedCells)), ix)
    case other =>
      throw new IllegalArgumentException(s"unknown index family '$other'")
  }
}

/** spark-submit entry point for the remedy executor — see [[Maintenance]]. */
object MaintenanceRun {

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MaintenanceRun <sfDir> <outDir>")
    val Array(sfDir, outDir) = args
    val spark = JobSession.get("graft-maintenance-run")
    try {
      val pre = Maintenance.audit(spark, sfDir)
      val toRemedy = pre.filter(_.unremedied > 0).map(_.family)
      toRemedy.foreach(Maintenance.remedy(spark, sfDir, _))
      val post = Maintenance.audit(spark, sfDir)
      Maintenance.auditDF(spark, post)
        .write.mode("overwrite").parquet(s"$outDir/maintenance")
      def of(ps: Seq[Maintenance.Posture], f: String) =
        ps.find(_.family == f).map(_.unremedied).getOrElse(-1L)
      val report =
        s"[maintenance-run] remedied=${
          if (toRemedy.isEmpty) "none" else toRemedy.mkString("+")} " +
          s"unremedied_buckets_pre=${of(pre, "minhash")} " +
          s"unremedied_cells_pre=${of(pre, "ann")} " +
          s"unremedied_buckets=${of(post, "minhash")} " +
          s"unremedied_cells=${of(post, "ann")}"
      println(report)
    } finally JobSession.release(spark)
  }
}
