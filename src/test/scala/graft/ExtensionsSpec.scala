package graft

import graft.functions.VectorFunctions.graftDot
import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: the codegen'd graft_dot expression
  * (value parity with the HOF fold it replaced) and the injected
  * idempotent-string-fn optimizer rule (plan assertion). */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot equals the higher-order-function fold bit-for-bit") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = e.select(col("vec_id"),
        graftDot(col("v"), col("v")).as("custom"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("graft_dot is null-safe and length-clamping") {
    val sq = spark; import sq.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // clamp to min length
      (None, Some(Seq(1.0)))                            // null -> null
    ).toDF("a", "b")
    val rows = df.select(graftDot(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("injected rule collapses lower(lower(x)) in the optimized plan") {
    val df = Tables.nation(spark, TestSpark.Sf0001)
      .select(lower(lower(col("n_name"))).as("l"))
    val lowers = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case l: Lower => l })
    assert(lowers.size == 1, s"expected 1 Lower after collapse, got ${lowers.size}")
    // and semantics are unchanged
    assert(df.collect().forall(r => r.getString(0) == r.getString(0).toLowerCase))
  }
}
