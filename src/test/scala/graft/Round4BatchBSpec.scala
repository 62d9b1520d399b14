package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 batch-B operators: array higher-order
  * functions, quality-quartile bucketing, distribution windows, Pareto
  * shares, edit-distance fuzzy match, and windowed event dedup. */
class Round4BatchBSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("array_hof: aggregate total equals sum of token lengths") {
    val rows = ops.TextOps.arrayHof(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).toLowerCase.split(" ", -1)
      assert(r.getLong(1) == toks.count(_.length > 4), s"n_long for ${r.getLong(0)}")
      assert(r.getLong(2) == toks.map(_.length.toLong).sum, s"total_len for ${r.getLong(0)}")
      assert(r.getString(3) == toks.take(3).map(_.toUpperCase).mkString(" "))
    }
  }

  test("quality buckets: 4 quartiles partition the corpus evenly-ish") {
    val rows = ops.TextOps.docsQualityBuckets(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = rows.map(_.getLong(1)).sum
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == nDocs)
    // ntile: bucket sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // score ranges are non-overlapping and increasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
    }
  }

  test("cume_dist/percent_rank are in (0,1] and monotone within a nation") {
    val rows = ops.Relational.windowCumeDist(spark, sf)
      .orderBy("c_nationkey", "c_acctbal", "c_custkey").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val pr = rs.map(_.getDouble(3))
      val cd = rs.map(_.getDouble(4))
      assert(pr.head == 0.0 && math.abs(cd.last - 1.0) < 1e-9)
      assert(pr.zip(pr.tail).forall { case (a, b) => a <= b })
      assert(cd.zip(cd.tail).forall { case (a, b) => a <= b })
      assert(cd.forall(c => c > 0.0 && c <= 1.0))
    }
  }

  test("pareto: cum_share monotone to 1.0, revenue descending") {
    val rows = ops.Relational.ordersPareto(spark, sf).collect()
    assert(rows.nonEmpty)
    val rev = rows.map(_.getDouble(1))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
    val cs = rows.map(_.getDouble(3))
    assert(cs.zip(cs.tail).forall { case (a, b) => a <= b })
    assert(math.abs(cs.last - 1.0) < 1e-6)
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
  }

  test("fuzzy match: every probe resolves to its own source supplier") {
    val rows = ops.DedupOps.fuzzyJoinEdit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // deleting one char leaves distance 1 to the original name, and
      // supplier names differ pairwise in >= 1 digit position elsewhere,
      // so the original is always the unique argmin
      assert(r.getLong(3) <= 1L, s"probe ${r.getLong(0)} matched at distance ${r.getLong(3)}")
      assert(r.getString(2).endsWith(f"${r.getLong(0)}%09d"))
    }
  }

  test("pagerank step: total rank mass conserved (0.15·|S| + 0.85·|C|)") {
    val rows = ops.Relational.graphPagerankStep(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0.15))
    // each customer with >=1 edge contributes exactly 1.0 (split over its
    // suppliers), damped by 0.85; suppliers add 0.15 base each
    val nSup = rows.length
    val edges = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
    val nCust = edges.select("o_custkey").distinct().count()
    val mass = rows.map(_.getDouble(1)).sum
    // 6-dp snapping of per-edge terms bounds the drift well under 0.01
    assert(math.abs(mass - (0.15 * nSup + 0.85 * nCust)) < 0.01,
      s"mass $mass vs ${0.15 * nSup + 0.85 * nCust}")
  }

  test("events dedup: at most one survivor per (user, type, minute)") {
    val df = ops.EventOps.eventsDedupWindow(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getLong(1), r.getString(2), r.getString(3)))
    assert(keys.distinct.length == keys.length)
    // never more survivors than source events, and at least one per key
    val src = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.length <= src)
  }
}
