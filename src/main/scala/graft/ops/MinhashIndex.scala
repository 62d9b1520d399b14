package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH band-table artifact — the dedup counterpart of
  * [[IvfPqIndex]] (VERDICT r7 #1's factoring applied to the dedup family,
  * and the closure of SCALE.md's "simjoinLsh.persist() → a real checkpoint
  * table" single-node artifact): shingling + signatures + banding run ONCE
  * at ingest time and write a parquet table; dedup probes read the stored
  * postings and never re-shingle the corpus.
  *
  * Stored layout (deterministic — md5 shingles + Kirsch–Mitzenmacher
  * integer minhash, so any builder writes byte-identical postings and the
  * probe oracles can mirror the full build+probe chain):
  *
  *   <root>/bands   (doc_id, band, band_key), hive-partitioned by
  *                  pband (= band) — one directory per band, so a probe
  *                  that bands its batch the same way prunes to the
  *                  matching band directory before any I/O.
  *
  * At 100 TB the postings table is additionally bucketed by `band_key`
  * so the per-batch semi-join probe co-partitions without a shuffle of
  * the stored side; rows are fixed-width (id, int, 32-char key) — the
  * corpus text never lives in the index.
  */
object MinhashIndex {

  final case class Ix(root: String) {
    def bands: String = s"$root/bands"
  }

  /** Full-corpus band index, build-if-absent. Idempotent and crash-safe:
    * the root `_SUCCESS` marker is touched only after the table has
    * committed, so a partial build is rebuilt from scratch. Synchronized:
    * parallel suites in one JVM must not race the build. */
  def ensure(s: SparkSession, dir: String): Ix = synchronized {
    val ix = Ix(Artifacts.root("mhix_v1", dir, "documents.parquet"))
    if (!new java.io.File(ix.root, "_SUCCESS").isFile)
      buildAt(DedupOps.bandRows(s, dir), ix)
    ix
  }

  /** Corpus-slice index (docs below [[DedupOps.IncrementalCutoff]]) for
    * the incremental-dedup probe: the stored side of "new batch vs
    * existing corpus". Same build-once contract, separate root. */
  def ensureBase(s: SparkSession, dir: String): Ix = synchronized {
    val ix = Ix(Artifacts.root("mhix_v1", dir, "documents.parquet") + "_base")
    if (!new java.io.File(ix.root, "_SUCCESS").isFile)
      buildAt(DedupOps.bandRowsBelow(s, dir, DedupOps.IncrementalCutoff), ix)
    ix
  }

  private def fineMarker(ix: Ix): java.io.File =
    new java.io.File(ix.root, "_fine_SUCCESS")

  /** Declared schema of a FACADE `bands_fine` side-table
    * ([[graft.api.GraftAPI.writeMinhashIndex]]'s layout: `_id` instead
    * of the registry's `doc_id`), derived from the postings schema so
    * the caller's id type is preserved. Shared by the streaming probe
    * and the takedown rewrite so neither can drift; a declared schema
    * is required because a hot-bucket-free corpus writes a
    * data-file-less partitioned table and inference on it throws. */
  def facadeFineSchema(postings: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      postings("_id"), postings("band"), postings("band_key"),
      org.apache.spark.sql.types.StructField("sub_key",
        org.apache.spark.sql.types.StringType),
      postings("pband")))

  /** Marker-disciplined rewrite of the `bands_fine` side-table (ADVICE
    * r11): the table lands inside a COMMITTED index root, so its own
    * `_fine_SUCCESS` marker retires before the overwrite and recommits
    * only after it — a crash mid-write reads as "no fine table" to
    * every consumer ([[ensureFine]], the incremental probe), never as a
    * trustworthy partial one. The main index `_SUCCESS` stays valid
    * throughout: the fine table is additive, and the raw postings
    * remain correct without it. */
  def rewriteFine(fine: DataFrame, ix: Ix): Unit = synchronized {
    val m = fineMarker(ix)
    if (m.isFile) require(m.delete(),
      s"could not retire the fine marker under ${ix.root} before the rewrite")
    fine.repartition(col("pband"))
      .write.mode("overwrite").partitionBy("pband")
      .parquet(s"${ix.root}/bands_fine")
    require(m.createNewFile() || m.isFile,
      s"could not commit the fine marker under ${ix.root}")
  }

  /** Build-once `bands_fine` next to an index — the stored side of the
    * hot-bucket fine probe ([[graft.ops.DedupOps.dedupIncremental]]):
    * postings of buckets ≥ the hot threshold re-keyed on the
    * full-signature sub_key, computed from the STORED postings (only
    * the hot docs' text is re-signed). Returns the table path; absent
    * or uncommitted (no `_fine_SUCCESS`) tables rebuild. */
  def ensureFine(s: SparkSession, dir: String, ix: Ix): String = synchronized {
    if (!fineMarker(ix).isFile)
      rewriteFine(DedupOps.fineRowsFor(s, dir,
        s.read.parquet(ix.bands).select("doc_id", "band", "band_key")), ix)
    s"${ix.root}/bands_fine"
  }

  /** One file per band via the repartition; `band` is duplicated as the
    * partition column `pband` so the data column keeps its exact
    * IntegerType (partition-value inference would re-derive it). */
  private def buildAt(bands: DataFrame, ix: Ix): Unit = {
    bands
      .withColumn("pband", col("band"))
      .repartition(col("pband"))
      .write.mode("overwrite").partitionBy("pband").parquet(ix.bands)
    Artifacts.writeMeta(ix.root,
      "numHashes" -> DedupOps.NumHashes.toString,
      "bands" -> DedupOps.NumBands.toString)
    require(new java.io.File(ix.root, "_SUCCESS").createNewFile() ||
      new java.io.File(ix.root, "_SUCCESS").isFile,
      s"could not commit index marker under ${ix.root}")
  }
}
