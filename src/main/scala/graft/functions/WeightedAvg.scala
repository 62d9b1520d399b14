package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY.md §2.14): exact weighted average via
  * `Aggregator[IN, BUF, OUT]` — the engine's sanctioned path for custom
  * aggregation logic (black-box row UDFs stay banned).
  *
  * The buffer keeps (Σ value·weight, Σ weight) as exact DECIMALs, with
  * both inputs snapped to 6 decimal places on entry: partial buffers merge
  * in any order on a cluster, and decimal accumulation makes the result
  * partition-order-independent — the same determinism-by-construction rule
  * as [[graft.Tables.dsum]]. Fractional weights are exact to 6 dp (0.25
  * stays 0.25); inputs must satisfy |x| < 9.2e12 (the 6-dp scaled-long
  * snap), far beyond the fixture range. The Σv·w column needs ≤ 20 integer
  * digits inside the encoder's DECIMAL(38,18) — ~1e20, out of reach even
  * at petabyte row counts.
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBD, JBD), Double] {
  /** Snap a double to an exact 6-dp decimal (half-up, like SQL round).
    * NaN/Infinity and values outside the scaled-long range fail loudly —
    * `math.round` alone would map NaN to an exact 0 contribution and
    * silently saturate at ±Long.MaxValue, diverging from SQL aggregate
    * semantics (NaN poisons; overflow errors under ANSI). */
  private def d6(x: Double): JBD = {
    require(!x.isNaN && !x.isInfinity, s"weighted_avg: non-finite input $x")
    val scaled = x * 1e6
    require(math.abs(scaled) < Long.MaxValue.toDouble,
      s"weighted_avg: |$x| exceeds the 6-dp scaled-long range (~9.2e12)")
    // HALF_UP = half away from zero, honoring the documented "like SQL
    // round" contract for NEGATIVE inputs too (review r10): math.round
    // is half-toward-+inf, so -0.5e-6 scaled would snap to 0 where
    // SQL/DuckDB round gives -1e-6.
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
  }

  override def zero: (JBD, JBD) = (JBD.ZERO, JBD.ZERO)

  override def reduce(b: (JBD, JBD), in: (Double, Double)): (JBD, JBD) = {
    val v = d6(in._1)
    val w = d6(in._2)
    (b._1.add(v.multiply(w)), b._2.add(w))
  }

  override def merge(a: (JBD, JBD), b: (JBD, JBD)): (JBD, JBD) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBD, JBD)): Double =
    if (b._2.signum == 0) Double.NaN
    else b._1.divide(b._2, 12, RoundingMode.HALF_EVEN).doubleValue

  override def bufferEncoder: Encoder[(JBD, JBD)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
