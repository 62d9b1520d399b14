package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table readers + oracle-parity helpers shared by every operator.
  *
  * Design notes (100 TB posture):
  *  - All readers are plain `spark.read.parquet` scans: the vectorized
  *    parquet reader + Catalyst column pruning / predicate pushdown do the
  *    heavy lifting; operators never pre-materialize.
  *  - Double aggregation goes through DECIMAL so results are exact and
  *    partition-order-independent — a plain `sum(double)` differs run-to-run
  *    at scale (FP addition is non-associative), which would break both the
  *    DuckDB oracle hash-compare and any incremental/backfill reconciliation
  *    on a real cluster.
  */
object Tables {
  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = tbl(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = tbl(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = tbl(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = tbl(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = tbl(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = tbl(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = tbl(s, dir, "region")
  /** `events.parquet` has shipped `ts` in three physical shapes across
    * harness revisions; normalize ALL of them to a TZ-aware TimestampType
    * here so every downstream `unix_micros(ts)` / `ts.cast("long")` site
    * (session gaps, funnels, attribution, as-of tolerance) works unchanged:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it natively (PARQUET_TYPE_ILLEGAL);
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true` so it
    *    arrives as a nanos BIGINT → `timestamp_micros(ts div 1000)` (`div`,
    *    not `/` — nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer range,
    *    a float divide would corrupt the microseconds).
    *  - timestamp[us] without UTC flag: Spark 4 reads TIMESTAMP_NTZ, which
    *    forbids `cast(bigint)` / `unix_micros`; `cast("timestamp")` is
    *    value-preserving because all sessions pin
    *    `spark.sql.session.timeZone=UTC` (wall-clock == instant).
    *  - already TZ-aware: pass through.
    *
    * DuckDB oracles read the same parquet wall-clock values, so all three
    * branches agree with the oracle side. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = tbl(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = tbl(s, dir, "embeddings")

  /** Fixed cardinality for every two-pass prefix-sum / global-rank spine
    * in the engine (`shard_pack_tokens`, curation stage 5,
    * `orders_pareto`, …): the only unpartitioned window and the offsets
    * broadcast in those decompositions are O(this) REGARDLESS of corpus
    * size. One shared constant so the bound can't drift per call site
    * (review r7). */
  val SpineBuckets = 4096L

  /** Exact, order-independent sum of a double column: route through
    * DECIMAL(25,6) so every partition ordering yields bit-identical output,
    * then surface as double. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum, then one IEEE double divide. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Explicit round-half-up to 6 dp: `floor(x·10⁶ + 0.5)/10⁶`, written the
    * same way in the DuckDB oracles ([[sqlR6]]). Spark's `round` is
    * HALF_UP while DuckDB's is half-even, and integer-ratio columns
    * (cume_dist, Jaccard, stopword ratios) DO hit binary-exact …5 values
    * at the 7th decimal where the two diverge — found by the sf0.1 oracle
    * sweep, invisible at sf0.01. */
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** DuckDB mirror of [[r6]]. */
  def sqlR6(e: String): String = s"floor(($e) * 1000000 + 0.5) / 1000000"

  /** Timestamp → 'yyyy-MM-dd HH:mm:ss.SSSSSS' string (µs precision).
    * Emitting timestamps as strings sidesteps parquet INT96-vs-µs-vs-ns
    * representation drift between Spark, pyarrow, and DuckDB.
    * DuckDB mirror: `strftime(t, '%Y-%m-%d %H:%M:%S.%f')`. */
  def tsFmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Date-valued timestamp → 'yyyy-MM-dd' string.
    * DuckDB mirror: `strftime(t, '%Y-%m-%d')`. */
  def dateFmt(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
