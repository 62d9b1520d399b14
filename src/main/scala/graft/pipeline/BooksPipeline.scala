package graft.pipeline

import graft.ops.BooksOps
import org.apache.spark.sql.SparkSession

/** The reference's two Airflow DAGs restated as ONE Spark job
  * (SURVEY.md §3.1–3.2): raw ragged JSON → flatten/typecast → columnar
  * warehouse load → read-back validation.
  *
  * Where the reference materializes to disk between every task and hands
  * paths over XCom (/root/reference/dags/bigbookapi.py:66,88), the Spark
  * restatement is one lazily-planned pipeline with a single persisted hop
  * at the declared sink. Under Airflow each stage can still be its own
  * `spark-submit` of this entry point — XCom keeps carrying only paths.
  *
  * Deliberate semantic FIX vs the reference: the load is an idempotent
  * OVERWRITE, not the reference's blind append
  * (/root/reference/dags/bigbookapi.py:170 `if_exists="append"` duplicates
  * every row on re-run) — retries and backfills are safe by construction
  * (SURVEY.md §4.3).
  */
object BooksPipeline {

  /** Counts logged by the reference at each hop
    * (/root/reference/scripts/extract.py:66, transform.py:48,
    * db_to_snowflake.py:118-125). */
  final case class EtlReport(rawRecords: Long, transformed: Long, loadedReadBack: Long)

  /** Extract (JSONL, ragged) → Transform (P1–P7 flatten) → Load
    * (parquet overwrite) → Validate (E3 read-back non-emptiness,
    * /root/reference/dags/db_to_snowflake.py:122). */
  def run(spark: SparkSession, rawJsonlPath: String, warehousePath: String): EtlReport = {
    // The JSON parse is the expensive subtree (text scan + from_json);
    // cache it so the sink write, the raw count, and the transformed
    // count all share ONE parse instead of three (review r10).
    val raw = BooksOps.parseRawJsonLines(spark.read.text(rawJsonlPath)).cache()
    try {
      val flat = BooksOps.flattenRawBooks(raw)
      flat.write.mode("overwrite").parquet(warehousePath)
      val readBack = spark.read.parquet(warehousePath).count()
      require(readBack > 0, "E3 validation failed: loaded books table is empty")
      EtlReport(raw.count(), flat.count(), readBack)
    } finally { raw.unpersist(); () }
  }
}
