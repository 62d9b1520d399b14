package graft

import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the multimodal operators (SURVEY.md §2.12 L9).
  * The DuckDB oracle re-derives the same md5-based fake decode, so it
  * proves Spark-side plumbing but not the geometry; these assert the
  * semantic contracts independently of the formulas.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("multimodal_meta: chunk count covers the byte length at 4 KiB") {
    val rows = MultimodalOps.multimodalMeta(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      assert(c * 4096 >= n && (c - 1) * 4096 < n)
    }
  }

  test("media_features: px == width*height*n_frames, dims in decode range") {
    val rows = MultimodalOps.mediaFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, f, px) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      assert(w >= 16 && w <= 271 && h >= 16 && h <= 271 && f >= 1 && f <= 16)
      assert(px == w.toLong * h * f)
    }
  }

  test("media_resize: fits 224 box, never upscales, constraining dim exact") {
    val rows = MultimodalOps.mediaResize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))
      assert(ow <= 224 && oh <= 224, s"out of box: $r")
      assert(ow <= w && oh <= h, s"upscaled: $r")
      if (w <= 224 && h <= 224) assert(ow == w && oh == h, s"needless resize: $r")
      else assert(math.max(ow, oh) == 224, s"constraining dim not 224: $r")
    }
  }

  test("media_frame_sample: 1..4 in-bounds evenly-stepped frames per doc") {
    val byDoc = MultimodalOps.mediaFrameSample(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      val n = rs.head.getLong(1)
      val idx = rs.map(_.getLong(2)).sorted.toSeq
      assert(idx.size >= 1 && idx.size <= 4)
      assert(idx.head == 0 && idx.last < n)
      val step = math.ceil(n / 4.0).toLong
      assert(idx == idx.indices.map(_ * step))
    }
  }
}
