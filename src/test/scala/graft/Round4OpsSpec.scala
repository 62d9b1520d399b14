package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the round-4 additions: chunking, BPE merge
  * candidates, source entropy, MinHash calibration, per-dimension moments,
  * shard manifests, and the new TPC-H-shaped SQL queries. Each test
  * asserts an invariant the DuckDB hash-compare can't express (coverage,
  * bounds, internal consistency). */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("chunk overlap: stride-48 windows of 64 cover every token exactly") {
    val rows = ops.TextOps.docsChunkOverlap(spark, sf)
      .select("doc_id", "chunk_id", "n_toks", "chunk_len").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val n = sorted.head.getLong(2)
      // chunk ids are 0..k-1 dense
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq)
      // every chunk but the last is full-size; coverage reaches the end
      sorted.init.foreach(r => assert(r.getLong(3) == 64, s"doc $doc: $r"))
      val lastStart = (sorted.length - 1) * 48L
      assert(lastStart + sorted.last.getLong(3) == n,
        s"doc $doc: last chunk must end at n_toks")
      // one extra chunk would start past the end
      if (sorted.length > 1)
        assert(lastStart < n, s"doc $doc: empty trailing chunk")
    }
  }

  test("bpe merges: top-20 adjacent pairs, 2 chars each, descending") {
    val rows = ops.TextOps.textBpeMerges(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("source entropy bounded by ln(n_langs)") {
    val rows = ops.TextOps.docSourceEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(3); val langs = r.getLong(2)
      assert(h >= 0.0 && h <= math.log(langs.toDouble) + 1e-6,
        s"entropy $h out of [0, ln($langs)] for ${r.getString(0)}")
    }
  }

  test("minhash estimate is a calibrated [0,1] estimator of Jaccard") {
    val rows = ops.DedupOps.dedupMinhashEst(spark, sf)
      .select("est_jaccard", "exact_jaccard", "abs_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
    val meanErr = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanErr <= 0.25, s"mean |est - exact| = $meanErr: estimator broken")
  }

  test("per-dimension moments: n = corpus size, variance non-negative") {
    val nVecs = Tables.embeddings(spark, sf).count()
    val rows = ops.VectorOps.embedDimStats(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getLong(1) == nVecs)
      assert(r.getDouble(3) >= 0.0, s"negative variance: $r")
    }
  }

  test("shard manifest partitions the corpus exactly") {
    val docs = Tables.documents(spark, sf)
    val rows = ops.PipelineOps.shardManifest(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val totToks = docs.select(size(split(col("text"), " ")).cast("long").as("nt"))
      .agg(sum("nt")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totToks)
    // shard ids dense from 0
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until rows.length).toSeq)
  }

  test("cust order dist accounts for every customer") {
    val total = ops.Relational.sqlCustOrderDist(spark, sf)
      .agg(sum("custdist")).collect()(0).getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }

  test("top supplier carries the max revenue") {
    val rows = ops.Relational.sqlTopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "all returned suppliers tie at the max")
  }

  test("idle customers: every returned nation count is positive") {
    val rows = ops.Relational.sqlIdleCustomers(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(1) > 0))
  }
}
