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

  test("graft_dot is null-safe and fails loudly on a length mismatch") {
    val sq = spark; import sq.implicits._
    val rows = Seq((Option.empty[Seq[Double]], Some(Seq(1.0))))
      .toDF("a", "b").select(graftDot(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0), "null array -> null")
    // review r11: the old min(len) clamp silently mis-scored ragged
    // embeddings (the HOF form nulls, DuckDB errors) — a mismatch must
    // abort with both lengths named, not return a plausible number
    val e = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 9.0)))
        .toDF("a", "b").select(graftDot(col("a"), col("b"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("length mismatch") && msgs.contains("2") &&
      msgs.contains("3"), msgs)
  }

  test("wrong-arity graft_dot call is a clear error, not IndexOutOfBounds (review r11)") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(array(1.0d))").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("exactly 2 arguments"), msgs)
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
