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
}
