package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.12 L9): media as opaque
  * `BinaryType` blobs with typed metadata, plus a partition-wise
  * feature-extraction stage with the decode kernel STUBBED.
  *
  * The harness has no media files or codec libraries, so blobs are the
  * UTF-8 bytes of `documents.text` — byte-for-byte deterministic, which
  * lets the DuckDB oracle check the full Spark-side plumbing (schema,
  * batching, partitioning) even though the "decode" is a fake.
  *
  * Scale shape: a real 100 TB media pipeline stores blobs in parquet
  * binary columns (or pointers to object storage beyond ~1 MB), keeps
  * metadata in sibling scalar columns so pruning never touches bytes, and
  * decodes partition-wise in fixed-size batches to bound executor memory —
  * exactly the `mapPartitions` + grouped-batch shape below. Swap
  * [[MediaDecode.decode]] for a JNI/codec call and nothing else changes.
  */
object MultimodalOps {

  /** The stubbed decode kernel. Deterministic fake: "dimensions" are read
    * from the blob's md5 (stand-in for parsing a real header), so the
    * oracle can recompute them. A real implementation replaces ONLY this
    * object (e.g. javax.imageio / ffmpeg bindings). */
  object MediaDecode {
    final case class Media(docId: Long, width: Int, height: Int, nFrames: Int, px: Long)

    private val hexChars = "0123456789abcdef".toCharArray

    // digest reused within a thread (review r11: a fresh
    // MessageDigest.getInstance + 32 per-byte format calls PER ROW was
    // the dominant constant cost of the stub kernel; MD5 digests reset
    // themselves after digest())
    private val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue() = java.security.MessageDigest.getInstance("MD5")
    }

    def md5Hex(bytes: Array[Byte]): String = {
      val d = md.get().digest(bytes)
      val out = new Array[Char](d.length * 2)
      var i = 0
      while (i < d.length) {
        out(i * 2) = hexChars((d(i) >> 4) & 0xf)
        out(i * 2 + 1) = hexChars(d(i) & 0xf)
        i += 1
      }
      new String(out)
    }

    /** Fake header parse: width/height/frame-count from md5 nibbles. */
    def decode(docId: Long, blob: Array[Byte]): Media = {
      val h = md5Hex(blob)
      val w = 16 + Integer.parseInt(h.substring(0, 2), 16)
      val ht = 16 + Integer.parseInt(h.substring(2, 4), 16)
      val f = 1 + Integer.parseInt(h.substring(4, 5), 16)
      Media(docId, w, ht, f, w.toLong * ht * f)
    }
  }

  private val BatchSize = 64

  /** Metadata projection over the blob column: byte size, 4 KiB chunk
    * count, content hash. Pure column algebra — the blob never leaves the
    * scan stage, and a `SELECT doc_id, n_bytes` on the result prunes the
    * bytes entirely. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .select(col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        ceil(length(col("blob")) / lit(4096.0)).cast("long").as("n_chunks"),
        md5(col("blob")).as("fp"))
      .orderBy("doc_id")

  /** Partition-wise batched feature extraction: Dataset[(id, blob)] →
    * mapPartitions → grouped fixed-size batches → decode → typed rows.
    * The `grouped(BatchSize)` is the batch boundary a columnar decoder
    * (Arrow batch / GPU kernel) would consume. */
  private def decoded(s: SparkSession, dir: String): DataFrame = {
    val sq = s; import sq.implicits._
    documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map {
        case (id, blob) => MediaDecode.decode(id, blob)
      }))
      .toDF("doc_id", "width", "height", "n_frames", "px")
  }

  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    decoded(s, dir).orderBy("doc_id")

  /** Resize planning: fit each decoded frame inside a 224×224 box
    * preserving aspect ratio, never upscaling — the standard vision-model
    * preprocessing step. The decode runs in the batched partition-wise
    * kernel; the geometry is pure column algebra after it (a real
    * pipeline would pass out_w/out_h back into the next kernel batch). */
  def mediaResize(s: SparkSession, dir: String): DataFrame = {
    val scale = least(lit(1.0), lit(224.0) / col("width"), lit(224.0) / col("height"))
    decoded(s, dir)
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), floor(col("width") * scale).cast("long")).as("out_w"),
        greatest(lit(1L), floor(col("height") * scale).cast("long")).as("out_h"))
      .orderBy("doc_id")
  }

  /** Frame sampling: ≤ 4 evenly-spaced frame indices per video
    * (step = ceil(n_frames/4)), exploded to one row per sampled frame —
    * the training-data shape where each frame becomes an example. The
    * explode is map-side; nothing shuffles until a downstream agg. */
  def mediaFrameSample(s: SparkSession, dir: String): DataFrame = {
    val step = ceil(col("n_frames") / lit(4.0)).cast("long")
    decoded(s, dir)
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1, step)).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  /** L9d: media dedup by leading-chunk fingerprint — blobs whose first
    * 64 CHARACTERS (on the text stand-in; a binary blob column would
    * take its first N bytes — substring is char-based, review r11) hash
    * identically collapse to their group's min doc_id
    * (derivatives of one source — re-encodes, truncations, appended
    * variants — share their head; the sub-blob hash is the deterministic
    * stand-in for a perceptual/chunk hash). The window min shuffles
    * (16-byte fp, doc_id) pairs only — bytes never move; dedup,
    * replication checks, and cache keys all run on the fingerprint, not
    * the blob. `keep = false` rows are the reclaimable storage. */
  def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    val m = documents(s, dir)
      .select(col("doc_id"),
        md5(encode(substring(col("text"), 1, 64), "utf-8")).as("fp"))
    val w = Window.partitionBy("fp")
    m.withColumn("canonical_id", min(col("doc_id")).over(w))
      .select(col("doc_id"), col("fp"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
      .orderBy("doc_id")
  }

  /** L9e: perceptual-hash near-dup pairs — a 16-bit pHash stand-in (md5
    * head, deterministic like the rest of the decode stub) compared by
    * Hamming distance ≤ 2, the visually-similar-media analogue of
    * [[mediaDedup]]'s exact match. Pairs enumerate only within an 8-bit
    * bucket (the hash's high byte — the pigeonhole trick from SimHash
    * pairs: distance-≤2 pairs agreeing on the high byte are found; FULL
    * recall at d ≤ 2 needs d+1 = 3 blocks by pigeonhole — a two-block
    * high/low union still misses a pair with one flipped bit in EACH
    * byte (review r11) — so the complete form splits the hash in three
    * and unions three bucketings), so the
    * candidate set is bucket-local and the 2^8 buckets shard evenly —
    * never a global n² self-join; bytes never move, only (bucket, 16-bit
    * hash, id). */
  def mediaPhashPairs(s: SparkSession, dir: String): DataFrame = {
    val m = documents(s, dir)
      .select(col("doc_id"),
        conv(substring(md5(encode(col("text"), "utf-8")), 1, 4), 16, 10)
          .cast("int").as("ph"))
      .withColumn("bucket", floor(col("ph") / lit(256)).cast("int"))
    m.as("a")
      .join(m.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ph").as("ph_a"), col("b.ph").as("ph_b"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_phash_pairs"  -> mediaPhashPairs _,
    "media_dedup"        -> mediaDedup _,
    "multimodal_meta"    -> multimodalMeta _,
    "media_features"     -> mediaFeatures _,
    "media_resize"       -> mediaResize _,
    "media_frame_sample" -> mediaFrameSample _,
  )

  /** hex-pair → int in DuckDB ('0x..'::INT). */
  private def hex(expr: String, from: Int, len: Int): String =
    s"CAST('0x' || substring($expr, $from, $len) AS INTEGER)"

  val oracleSql: Map[String, String] = Map(
    "media_phash_pairs" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    ${hex("md5(text)", 1, 4)} AS ph
        |  FROM documents),
        |k AS (SELECT doc_id, ph,
        |    CAST(floor(ph / 256.0) AS INTEGER) AS bucket FROM m)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.ph AS ph_a, b.ph AS ph_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
        |FROM k a JOIN k b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    "media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id, md5(substring(text, 1, 64)) AS fp FROM documents)
        |SELECT doc_id, fp,
        |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 4096.0) AS BIGINT) AS n_chunks,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_features" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
         |d AS (SELECT doc_id,
         |    16 + ${hex("h", 1, 2)} AS width,
         |    16 + ${hex("h", 3, 2)} AS height,
         |    1 + ${hex("h", 5, 1)} AS n_frames
         |  FROM m)
         |SELECT doc_id, width, height, n_frames,
         |  CAST(width AS BIGINT) * height * n_frames AS px
         |FROM d ORDER BY doc_id""".stripMargin,
    "media_resize" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
         |d AS (SELECT doc_id,
         |    16 + ${hex("h", 1, 2)} AS width,
         |    16 + ${hex("h", 3, 2)} AS height
         |  FROM m),
         |sc AS (SELECT *, least(1.0, 224.0 / width, 224.0 / height) AS scale FROM d)
         |SELECT doc_id, width, height,
         |  greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_w,
         |  greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_h
         |FROM sc ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
         |d AS (SELECT doc_id, CAST(1 + ${hex("h", 5, 1)} AS BIGINT) AS n_frames FROM m)
         |SELECT doc_id, n_frames,
         |  unnest(range(0, n_frames, CAST(ceil(n_frames / 4.0) AS BIGINT))) AS frame_idx
         |FROM d ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
