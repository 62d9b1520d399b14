package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 batch-C operators: cross-doc
  * duplicated-n-gram coverage, OOV rate, extended aggregates, and the
  * LATERAL top-k join. */
class Round4BatchCSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("dedup_crossdoc_ngrams matches a local brute-force recomputation") {
    val rows = ops.DedupOps.dedupCrossdocNgrams(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute force on the collected corpus (500 docs × ~90 grams — cheap)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ", -1).sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSeq
    }.filter(_._2.nonEmpty)
    val docsPerGram = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    val expect = grams.map { case (id, gs) =>
      val dup = gs.count(g => docsPerGram(g) >= 2).toLong
      id -> ((gs.length.toLong, dup,
        math.floor(dup.toDouble / gs.length * 1e6 + 0.5) / 1e6))
    }.toMap
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, d, ratio) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == d, s"doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - ratio) < 1e-9, s"ratio doc ${r.getLong(0)}")
    }
  }

  test("text_oov_rate: vocab covers the corpus-majority tokens") {
    val rows = ops.TextOps.textOovRate(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // top-20-of-31-word vocab: corpus-wide OOV mass must be a minority
    val oov = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(oov < 0.5, s"corpus OOV fraction $oov")
  }

  test("agg_extended_stats: moment stats agree with Spark's native skewness/kurtosis") {
    import org.apache.spark.sql.functions._
    val rows = ops.Relational.aggExtendedStats(spark, sf).collect()
    assert(rows.length == 3)
    val native = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(skewness(col("l_quantity")).as("sk"), kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (sk, ku) = native(r.getString(0))
      assert(math.abs(r.getDouble(8) - sk) < 1e-4, s"skew ${r.getString(0)}")
      assert(math.abs(r.getDouble(9) - ku) < 1e-4, s"kurt ${r.getString(0)}")
      assert(r.getLong(4) <= r.getLong(1)) // count_if <= n
    }
  }

  test("join_lateral_topk matches the window-rank formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val lateral = ops.Relational.joinLateralTopk(spark, sf).collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = graft.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(lateral.length == expect.length)
    lateral.zip(expect).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
    }
  }
}
