package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native TopKPerGroup operator (graft.plans): semantic equivalence with
  * the window idiom plus plan-shape assertions — partial before the
  * exchange, final after, no full-input Sort anywhere. */
class PlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def native() =
    plans.TopKPerGroup(Tables.orders(spark, sf), 3,
      Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select("o_custkey", "o_orderkey", "o_totalprice")

  test("native top-k equals the window row_number idiom") {
    val viaWindow = ops.Relational.topkPerGroup(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect().toSeq
    val viaNative = native().orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(viaNative == viaWindow)
  }

  test("plan is partial -> exchange -> final, with no full-input window sort") {
    val executed = native().queryExecution.executedPlan
    val s = executed.toString
    val partialIdx = s.indexOf("TopKPerGroupPartial")
    val finalIdx = s.indexOf("TopKPerGroupFinal")
    val exchangeIdx = s.indexOf("Exchange")
    assert(partialIdx >= 0 && finalIdx >= 0, s"missing exec nodes in:\n$s")
    // tree prints root-first: final above exchange above partial
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"expected final->exchange->partial order in:\n$s")
    assert(!s.contains("Window"), s"window operator leaked into:\n$s")
  }

  test("k larger than any group degenerates to identity per group") {
    val all = plans.TopKPerGroup(Tables.customer(spark, sf), 1000000,
      Seq(col("c_nationkey")), Seq(col("c_custkey").asc))
    assert(all.count() == Tables.customer(spark, sf).count())
  }

  test("optimizer rewrites the rank-filter idiom to the native operator when rank is dropped") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val idiom = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice") // rank dropped
    val s = idiom.queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroupFinal"), s"rewrite did not fire:\n$s")
    assert(!s.contains("Window"), s"window survived the rewrite:\n$s")
    // and it still computes the same rows as keeping the window
    val kept = ops.Relational.topkPerGroup(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(idiom.orderBy("o_custkey", "o_orderkey").collect().toSeq == kept)
  }

  test("rewrite does NOT fire when the rank column is kept") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val s = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn")
      .queryExecution.executedPlan.toString
    assert(s.contains("Window") && !s.contains("TopKPerGroup"))
  }

  test("partial buffer budget exhaustion degrades to pass-through, result unchanged") {
    val saved = plans.TopKPerGroup.partialBufferRowBudget
    try {
      // a 4-row budget on a ~1.5k-group input forces the pass-through path
      plans.TopKPerGroup.partialBufferRowBudget = 4L
      val viaWindow = ops.Relational.topkPerGroup(spark, sf)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey")
        .collect().toSeq
      val viaNative = native().orderBy("o_custkey", "o_orderkey").collect().toSeq
      assert(viaNative == viaWindow)
    } finally plans.TopKPerGroup.partialBufferRowBudget = saved
  }

  test("float grouping keys: -0.0 and 0.0 land in ONE group (normalized like Window)") {
    val sq = spark; import sq.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("g", "uid")
    val top1 = plans.TopKPerGroup(df, 1, Seq(col("g")), Seq(col("uid").asc))
    // 2 groups (0.0 merged with -0.0), not 3 — matching the window idiom
    assert(top1.count() == 2)
  }

  test("join_dpp plans a dynamicpruning partition filter on the fact scan") {
    val df = ops.Relational.joinDpp(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
  }
}
