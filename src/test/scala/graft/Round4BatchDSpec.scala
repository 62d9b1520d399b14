package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 batch-D operators: EWMA smoothing,
  * last-touch attribution, and the hive-partitioned layout sink. */
class Round4BatchDSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("events_ewma matches the sequential recurrence per type") {
    val rows = ops.EventOps.eventsEwma(spark, sf)
      .orderBy("event_type", "day").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var prev = Double.NaN
      rs.foreach { r =>
        val (v, e) = (r.getDouble(2), r.getDouble(3))
        val want = if (prev.isNaN) v else 0.5 * prev + 0.5 * v
        assert(math.abs(e - want) < 1e-3, s"ewma ${r.getString(0)} ${r.getString(1)}")
        prev = e
      }
    }
  }

  test("events_attribution: conversions partition the purchase set") {
    val rows = ops.EventOps.eventsAttribution(spark, sf).collect()
    val channels = rows.map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "none")))
    val nPurch = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == nPurch)
    // attributed channels must carry a positive mean gap within 24h
    rows.filter(_.getString(0) != "none").foreach { r =>
      val gap = r.getDouble(3)
      assert(gap > 0.0 && gap <= 24 * 60, s"gap $gap for ${r.getString(0)}")
    }
  }

  test("sink_partitioned_layout: pruned read-back equals raw-table agg") {
    val got = ops.Relational.sinkPartitionedLayout(spark, sf).collect()
    val want = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0) && g.getLong(1) == w.getLong(1))
    }
    // layout on disk: one directory per partition value, none spurious.
    // Derive the path exactly as the op does (fingerprint-keyed since the
    // stale-layout fix) — a hardcoded path would hold only while an old
    // layout dir happened to survive in /tmp.
    val base = new java.io.File(
      ops.Artifacts.root("hivepart_v1", sf, "orders.parquet"))
    val dirs = base.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 5 && dirs.forall(_.startsWith("o_orderpriority=")))
  }
}
