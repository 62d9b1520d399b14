package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract guards: the driver's correctness gate only checks what
  * is DECLARED, so declaration drift (a query without an oracle, an orphan
  * oracle, a broken flagship) silently weakens the gate. This spec makes
  * drift a test failure instead. */
class InventorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries intentionally without a DuckDB oracle (rows-only check). Keep
    * this list SHORT and justified. Empty since r6: the four sketch ops
    * now ship in calibration-audit form — exact values + an in-query
    * tolerance bit the oracle asserts `true` — so every declared query is
    * fully hash-verified. */
  private val rowsOnly = Set.empty[String]

  test("every declared query has an oracle or a documented rows-only waiver") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or waiver: $missing")
  }

  test("no orphan oracles (oracle for a query that doesn't exist)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracle entries: $orphans")
  }

  test("rows-only waivers are still real queries") {
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty)
  }

  test("flagship entry returns rows (driver t1 smoke parity)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md §2 and the registry agree: no broken promises, no undocumented ops") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    // every ✅-marked key in the coverage table must be a real registry query
    val promised = "`([a-z0-9_]+)` ✅".r.findAllMatchIn(survey).map(_.group(1)).toSet
    val broken = promised -- SparkEntry.queries.keySet
    assert(broken.isEmpty, s"SURVEY promises queries the registry lacks: $broken")
    // every registry key must be documented somewhere in SURVEY (table or prose)
    val undocumented = SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(undocumented.isEmpty, s"registry queries missing from SURVEY.md: $undocumented")
  }

  test("every oracle ends in a total ORDER BY or is a single-row aggregate") {
    // hash-compare is order-sensitive; an oracle without ORDER BY must be
    // a 1-row aggregate (count_star / scan_rest_pages shapes).
    val noOrder = SparkEntry.oracleSql.filterNot(_._2.toUpperCase.contains("ORDER BY"))
    val allowed = Set("count_star", "scan_rest_pages", "sql_forecast_revenue",
      "pipeline_observe", "ann_index_stats") // single-row metrics records
    assert((noOrder.keySet -- allowed).isEmpty,
      s"oracles missing ORDER BY: ${noOrder.keySet -- allowed}")
  }
}
