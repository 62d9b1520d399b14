package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the TPC-H Q9/Q11/Q16/Q20/Q21-shaped SQL queries
  * (adapted to the reference schema: no partsupp, no commit/receipt dates).
  * The DuckDB hash-compare proves value equality; these prove the internal
  * consistency a hash can't (thresholds actually hold, exclusions actually
  * excluded, sort contracts). */
class Round4SqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("nation profit: grouped years in data range, finite profit") {
    val rows = ops.Relational.sqlNationProfit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).startsWith("NATION_"))
      val y = r.getLong(1)
      assert(y >= 1995L && y <= 2001L, s"year $y out of data range")
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
    // (nation, year) keys are unique — the GROUP BY is the whole key
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("important parts: every kept part clears the global threshold") {
    import org.apache.spark.sql.functions._
    val df = ops.Relational.sqlImportantParts(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // descending by value, tie-broken by partkey
    val vals = rows.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    // recompute the threshold independently via the DataFrame API
    val s = spark
    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val su = s.read.parquet(s"$sf/supplier.parquet")
    val v = li.join(su, li("l_suppkey") === su("s_suppkey"))
      .where(col("s_nationkey") === 3)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(25,6)")).as("v"))
    val Array(total, n) = v.agg(sum("v").cast("double"), count(lit(1)))
      .head().toSeq.toArray.map(_.toString.toDouble)
    val thr = 2.0 * (total / n)
    rows.foreach(r => assert(r.getDouble(1) > thr))
    assert(rows.length == v.where(col("v").cast("double") > thr).count())
  }

  test("supplier cnt: Brand#5 and negative-balance suppliers excluded") {
    val rows = ops.Relational.sqlSupplierCnt(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) != "Brand#5"))
    assert(rows.forall(_.getLong(2) >= 1L))
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("promo suppliers: each has a qualifying (supplier, part) group") {
    import org.apache.spark.sql.functions._
    val picked = ops.Relational.sqlPromoSuppliers(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(picked.nonEmpty)
    val s = spark
    val li = s.read.parquet(s"$sf/lineitem.parquet")
    val promo = s.read.parquet(s"$sf/part.parquet")
      .where(col("p_type") === "PROMO").select(col("p_partkey"))
    val qualifying = li
      .join(promo, li("l_partkey") === promo("p_partkey"), "left_semi")
      .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("q"))
      .where(col("q") > 50)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert(picked == qualifying)
  }

  test("late suppliers: sole-late semantics hold for every reported row") {
    val df = ops.Relational.sqlLateSuppliers(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getLong(1) >= 1L))
    val waits = rows.map(_.getLong(1))
    assert(waits.zip(waits.tail).forall { case (a, b) => a >= b })
  }

  test("min-cost supplier (Q2 shape): every row achieves its part's regional minimum") {
    import org.apache.spark.sql.functions._
    val rows = ops.Relational.sqlMinCostSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the per-part European minimum independently
    val s = spark
    val eu = s.read.parquet(s"$sf/supplier.parquet")
      .join(s.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(s.read.parquet(s"$sf/region.parquet"),
        col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "EUROPE")
      .select("s_suppkey")
    val minCost = s.read.parquet(s"$sf/lineitem.parquet")
      .join(eu, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .join(s.read.parquet(s"$sf/part.parquet").where(col("p_size") === 15),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey").agg(min("l_extendedprice").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(5) == minCost(r.getLong(0)),
        s"part ${r.getLong(0)} cost ${r.getDouble(5)} != ${minCost(r.getLong(0))}")
    }
  }
}
