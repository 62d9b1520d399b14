package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler (dev-only, not part of the driver contract):
  * times the dedup_clusters sub-stages one action at a time so composite
  * latency attributes to a stage instead of needing bisection.
  *
  * CAVEAT (review r7): the inlined stage fragments below (quality-filter
  * thresholds, shingle window) are SNAPSHOTS of the production constants
  * in PipelineOps/DedupOps, copied so each fragment times in isolation.
  * If those constants move, re-sync before trusting per-stage numbers —
  * the composite timings (`dedup_clusters total`, `curation execute`)
  * always run the real registry functions and stay trustworthy. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "2097152")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    (1 to 2).foreach { i =>
      System.err.println(s"[profile] ---- iteration $i ----")
      t("docs.count")(docs.count())
      val w = Window.partitionBy("doc_id").orderBy("pos")
      def shingles = docs
        .select(col("doc_id"), posexplode(split(lower(col("text")), " ")))
        .withColumnRenamed("col", "w")
        .withColumn("w1", lead("w", 1).over(w))
        .withColumn("w2", lead("w", 2).over(w))
        .filter(col("w2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("w"), col("w1"), col("w2")).as("x"))
      t("explode only")(docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), " "))).count())
      t("shingles no distinct")(shingles.count())
      t("shingles distinct")(shingles.distinct().count())
      val p = shingles.distinct().persist()
      t("shingles distinct persist")(p.count())
      t("persisted re-count")(p.count())
      p.unpersist()
      t(s"dedup_clusters total") {
        val n = ops.DedupOps.queries("dedup_clusters")(spark, sfDir).count()
        System.err.println(s"[profile] rows=$n rounds=${ops.DedupOps.lastClusterRounds}")
      }
      spark.catalog.clearCache(); System.gc()
      // ---- curation phase decomposition ----
      val toks = split(col("text"), " ")
      val quality = docs
        .filter(col("n_chars") >= 150 && col("n_chars") <= 450 &&
          size(toks).cast("double") / size(array_distinct(toks)) <= 2.5)
        .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tokens"),
          md5(col("text")).as("fp"))
      t("quality.count")(quality.count())
      t("clusterDrops.count")(ops.DedupOps.dedupClusters(spark, sfDir)
        .filter(col("cluster_id") =!= col("doc_id")).count())
      t("contaminated.count")(ops.DedupOps.decontamNgram(spark, sfDir)
        .filter(col("contam_ratio") >= 0.3).count())
      val cp = t("curation build")(
        ops.PipelineOps.queries("curation_pipeline")(spark, sfDir))
      t("curation analyze+optimize")(cp.queryExecution.executedPlan)
      spark.sparkContext.setLogLevel("INFO")
      t("curation execute")(cp.count())
      spark.sparkContext.setLogLevel("WARN")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
