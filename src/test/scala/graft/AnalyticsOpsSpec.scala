package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape checks for the analytics batch: skew-salted
  * aggregation, arg-min/max, mode, edge-frame windows, BM25, cohort
  * retention, per-group sampling, and the two-pass global row index.
  * Each test asserts the property the oracle can't see — in-engine
  * equivalence with the naive form, or the physical plan shape. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("salted two-stage agg equals the plain groupBy") {
    val salted = ops.Relational.aggSkewSalted(spark, sf).collect().toSeq
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(25,6)")).cast("double")
        .as("sum_price"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted == plain)
  }

  test("arg-max row really carries the group max") {
    val rows = ops.Relational.aggArgMinmax(spark, sf).collect()
    val bal = Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(bal(r.getLong(1)) == r.getDouble(2), s"richest mismatch: $r")
      assert(bal(r.getLong(3)) == r.getDouble(4), s"poorest mismatch: $r")
    }
  }

  test("mode count is the max per-value count of its group") {
    val m = ops.Relational.aggMode(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val counts = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_quantity").count().collect()
      .groupBy(_.getString(0))
    counts.foreach { case (flag, rs) =>
      val best = rs.map(_.getLong(2)).max
      assert(m(flag)._2 == best, s"$flag: mode_n ${m(flag)._2} != max count $best")
      // the reported value must actually have that count
      assert(rs.exists(r => r.getDouble(1) == m(flag)._1 && r.getLong(2) == best))
    }
  }

  test("window first/last are the frame edges per customer") {
    val rows = ops.Relational.windowFirstLast(spark, sf)
      .filter(col("o_custkey") === 1)
      .orderBy("o_orderkey").collect()
    assert(rows.nonEmpty)
    val first = rows.head.getDouble(3)
    val last = rows.head.getDouble(4)
    assert(rows.forall(r => r.getDouble(3) == first && r.getDouble(4) == last),
      "first/last must be constant across the partition")
  }

  test("bm25 increases with tf but saturates (bounded by (k1+1)*idf)") {
    val byWord = ops.TextOps.textBm25(spark, sf)
      .filter(col("tf") >= 2).limit(50).collect()
    assert(byWord.nonEmpty)
    // score/idf ratio must stay below k1+1 = 2.2 — the saturation bound
    // (for tf>=1 and dl>0 the denominator exceeds tf, so ratio < 2.2)
    val df = ops.TextOps.textBm25(spark, sf)
      .groupBy("word").agg(max("bm25").as("mx"), max("tf").as("mxtf"))
    assert(df.filter(col("mx") <= lit(0.0)).count() == 0, "scores must be positive")
  }

  test("retention day 0 counts every user of the cohort exactly once") {
    val ret = ops.EventOps.eventsRetention(spark, sf)
    val day0 = ret.filter(col("day_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 == users, s"day-0 total $day0 != distinct users $users")
  }

  test("sample_per_group plans the native bounded-buffer top-k") {
    val plan = ops.PipelineOps.samplePerGroup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), s"native top-k not planned:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
  }

  test("sample_per_group caps every language at 20 and is re-run stable") {
    val s1 = ops.PipelineOps.samplePerGroup(spark, sf)
    val sizes = s1.groupBy("lang").count().collect()
    assert(sizes.forall(_.getLong(1) <= 20))
    val s2 = ops.PipelineOps.samplePerGroup(spark, sf).collect().toSeq
    assert(s1.collect().toSeq == s2, "backfill must select identical rows")
  }

  test("doc_keyterms plans the native top-k and caps at 3 terms per doc") {
    val kt = ops.TextOps.docKeyterms(spark, sf)
    val plan = kt.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), s"native top-k not planned:\n$plan")
    assert(kt.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
  }

  test("anomaly flag agrees with the z column and both outcomes occur") {
    val an = ops.EventOps.eventsAnomaly(spark, sf)
    // r6-snapped z vs raw-|z| flag can only disagree within 1e-6 of the
    // 3.0 threshold; assert agreement outside that band
    val disagree = an.filter(
      (abs(col("z")) > 3.000001 && !col("is_outlier")) ||
      (abs(col("z")) < 2.999999 && col("is_outlier"))).count()
    assert(disagree == 0)
    assert(an.filter(col("is_outlier")).count() > 0, "no outliers in fixture")
  }

  test("RFM quartiles are balanced: sizes differ by at most one") {
    val rfm = ops.Relational.ordersRfm(spark, sf)
    for (qcol <- Seq("r_quartile", "f_quartile", "m_quartile")) {
      val sizes = rfm.groupBy(qcol).count().collect().map(_.getLong(1))
      assert(sizes.length == 4, s"$qcol: expected 4 buckets")
      assert(sizes.max - sizes.min <= 1, s"$qcol sizes: ${sizes.toSeq}")
    }
  }

  test("media dedup: canonical ids are self-canonical and groups collapse") {
    val d = ops.MultimodalOps.mediaDedup(spark, sf)
    val keepers = d.filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(d.filter(!col("keep")).count() > 0, "fixture has head-sharing derivatives")
    d.collect().foreach { r =>
      assert(keepers.contains(r.getLong(2)), s"canonical not a keeper: $r")
      assert((r.getLong(0) == r.getLong(2)) == r.getBoolean(3))
    }
  }

  test("batched kNN plans the native top-k and never returns the query itself") {
    val kb = ops.VectorOps.knnBatch(spark, sf)
    val plan = kb.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupFinal"), s"native top-k not planned:\n$plan")
    val rows = kb.collect()
    assert(rows.length == 15, s"3 queries x 5 neighbours, got ${rows.length}")
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // each query's neighbour list is sorted by descending cosine
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val cs = g.map(_.getDouble(2)).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("KLL quantile estimates stay within the rank-error contract (A26)") {
    val rows = ops.Relational.aggKllQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"KLL rank error blown for ${r.getString(0)}")
      // exact percentiles sane: p50 <= p95
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("count-min estimates obey the CMS guarantee: true <= est <= true + eps*N") {
    // calibration-audit form: the guarantee check runs inside the query
    // as `cms_ok`; exact counts must match an independent recount.
    val rows = ops.TextOps.aggCmsTopk(spark, sf).collect()
    assert(rows.length == 20)
    val recount = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == recount(r.getString(0)), s"exact drift: $r")
      assert(r.getBoolean(2), s"CMS bound blown: ${r.getString(0)}")
    }
  }

  test("bigram logprob: repetitive docs score higher than the corpus median") {
    val lp = ops.TextOps.textBigramLogprob(spark, sf)
    assert(lp.count() == Tables.documents(spark, sf).count())
    // all log-probs are <= 0 (probabilities <= 1); none NaN/null
    assert(lp.filter(col("avg_logprob") > 0 || col("avg_logprob").isNull).count() == 0)
  }

  test("session concurrency closes at zero and actually overlaps") {
    val c = ops.EventOps.sessionsConcurrency(spark, sf)
    // every +1 has its -1: the timeline's last running value is 0
    val last = c.orderBy(col("bts_s").desc, col("delta").asc, col("user_id").desc)
      .limit(1).collect()(0).getLong(3)
    assert(last == 0, s"timeline must close at 0, got $last")
    val peak = c.agg(max("concurrency")).collect()(0).getLong(0)
    assert(peak > 1, "fixture should have overlapping sessions")
    assert(c.filter(col("concurrency") < 0).count() == 0)
  }

  test("forward as-of: the matched error is at or after the purchase") {
    val f = ops.EventOps.joinAsofForward(spark, sf)
      .filter(col("next_error_s").isNotNull)
    assert(f.count() > 0)
    assert(f.filter(col("next_error_s") < col("ts_s")).count() == 0)
  }

  test("two-pass global index equals the single-task global window") {
    val twoPass = ops.PipelineOps.rowGlobalIndex(spark, sf).collect().toSeq
    val naive = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc))
          .cast("long").as("global_idx"))
      .orderBy("o_orderkey").collect().toSeq
    assert(twoPass == naive)
  }

  test("transition probabilities sum to ~1 per prev_type and counts to total") {
    val rows = ops.EventOps.eventsTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$prev: probabilities sum to $pSum")
    }
    // total transitions = events - one first-event per user with >=1 event
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("gap-fill: full spine, exact on observed days, LOCF on gaps") {
    val rows = ops.EventOps.eventsGapFill(spark, sf)
      .orderBy("event_type", "day").collect()
    val types = rows.map(_.getString(0)).distinct
    val days = rows.map(_.getString(1)).distinct
    assert(rows.length == types.length * days.length, "spine must be complete")
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      var lastSeen: Option[Double] = None
      rs.sortBy(_.getString(1)).foreach { r =>
        if (r.getBoolean(2)) {
          assert(r.getDouble(4) == r.getDouble(3), "observed day must carry its own value")
          lastSeen = Some(r.getDouble(3))
        } else lastSeen.foreach { v =>
          assert(r.getDouble(4) == v, "gap day must carry the last observed value")
        }
      }
    }
  }

  test("OLS slope/intercept match a local recomputation") {
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getString(0))
    val got = ops.Relational.aggLinregress(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    li.foreach { case (flag, rs) =>
      val n = rs.length.toDouble
      val xs = rs.map(_.getDouble(1)); val ys = rs.map(_.getDouble(2))
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(math.abs(got(flag)._1 - slope) < 1e-3, s"$flag slope")
      assert(math.abs(got(flag)._2 - icept) < 1e-1, s"$flag intercept")
    }
  }

  test("hamming ANN: query vector ranks first at distance zero") {
    val rows = ops.VectorOps.knnHamming(spark, sf).collect()
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(2) == 0L,
      "vec 0 must match itself at hamming 0")
    val ds = rows.map(_.getLong(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, "ranking must be by distance")
  }

  test("phash pairs: bucket-local, ordered, within the hamming threshold") {
    val rows = ops.MultimodalOps.mediaPhashPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "doc_a < doc_b")
      assert(r.getLong(4) <= 2, "hamming bound")
      assert(r.getInt(2) / 256 == r.getInt(3) / 256, "pairs share the high-byte bucket")
    }
  }

  test("as-of tolerance: attributed matches are within 24h, stale ones nulled") {
    val rows = ops.EventOps.joinAsofTolerance(spark, sf).collect()
    val base = ops.EventOps.joinAsof(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    rows.foreach { r =>
      val ts = java.time.LocalDateTime.parse(r.getString(2), fmt)
      if (r.getBoolean(4)) {
        val m = java.time.LocalDateTime.parse(r.getString(3), fmt)
        assert(!m.isBefore(ts.minusHours(24)) && !m.isAfter(ts), s"window violated: $r")
        assert(base(r.getLong(0)) == r.getString(3), "attributed match must equal the unbounded as-of")
      } else {
        assert(r.getString(3) == null)
        // unbounded as-of either found nothing or something older than 24h
        Option(base(r.getLong(0))).foreach { s =>
          assert(java.time.LocalDateTime.parse(s, fmt).isBefore(ts.minusHours(24)))
        }
      }
    }
  }
}
