package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 batch-F operators: snapshot-diff CDC
  * generation, incremental aggregate maintenance, cohort LTV, 3-step path
  * mining, and the Zipf corpus-fit audit. */
class Round4BatchFSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("cdc_diff_snapshots: ops partition correctly and unchanged keys are dropped") {
    val diff = ops.PipelineOps.cdcDiffSnapshots(spark, sf).collect()
    assert(diff.nonEmpty)
    val byOp = diff.groupBy(_.getString(1))
    assert(byOp.keySet.subsetOf(Set("I", "D", "U")))
    // inserts have no old side, deletes no new side, updates differ somewhere
    byOp.getOrElse("I", Array.empty).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(4) && !r.isNullAt(3))
    }
    byOp.getOrElse("D", Array.empty).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(5) && !r.isNullAt(2))
    }
    byOp.getOrElse("U", Array.empty).foreach { r =>
      assert(r.getLong(2) != r.getLong(3) || r.getDouble(4) != r.getDouble(5))
    }
  }

  test("agg_incremental_merge: state+delta merge equals the full recompute") {
    import graft.Tables._
    val merged = ops.PipelineOps.aggIncrementalMerge(spark, sf)
    val full = orders(spark, sf).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderpriority")
    assert(merged.collect().toSeq == full.collect().toSeq)
  }

  test("orders_cohort_ltv: cumulative revenue is the running sum of the curve") {
    import graft.Tables._
    // (cohort_month, m_since, n_cust, revenue, cum_revenue)
    val tri = ops.Relational.ordersCohortLtv(spark, sf).collect()
    assert(tri.forall(_.getLong(1) >= 0))
    // age-0 cell counts the whole cohort: everyone's first order lands there
    val cohortSizes = orders(spark, sf)
      .groupBy("o_custkey").agg(min(to_date(col("o_orderdate"))).as("first"))
      .groupBy(date_format(col("first"), "yyyy-MM").as("m"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tri.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == cohortSizes(r.getString(0)))
    }
    // cum_revenue replays the per-cohort prefix sum of revenue
    tri.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      val prefix = sorted.scanLeft(0.0)(_ + _.getDouble(3)).drop(1)
      sorted.zip(prefix).foreach { case (r, exp) =>
        assert(math.abs(r.getDouble(4) - exp) < 1e-4)
      }
    }
  }

  test("events_paths3: top-20 trigram paths, support never exceeds count") {
    val p = ops.EventOps.eventsPaths3(spark, sf).collect()
    assert(p.length <= 20 && p.nonEmpty)
    assert(p.forall(r => r.getString(0).count(_ == '>') == 2))
    assert(p.forall(r => r.getLong(2) <= r.getLong(1)))
    // sorted by n desc (then support desc, then path asc)
    assert(p.map(_.getLong(1)).toSeq == p.map(_.getLong(1)).toSeq.sortBy(-_))
  }

  test("text_zipf: fit over the top-100 vocabulary with a negative slope") {
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .distinct().count()
    val z = ops.TextOps.textZipf(spark, sf).collect()
    assert(z.length == 1)
    assert(z.head.getLong(0) == math.min(vocab, 100L))
    assert(z.head.getDouble(1) < 0.0) // frequency falls with rank
    // intercept ~ ln(max frequency): positive for any non-trivial corpus
    assert(z.head.getDouble(2) > 0.0)
  }
}
