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
  * stays 0.25); inputs must satisfy |x| < 9.2e12. The REAL capacity bound
  * is the buffer encoder's DECIMAL(38,18) — every accumulated value
  * (including each v·w product, which the per-input cap alone does NOT
  * bound below 1e20) must keep ≤ 20 integer digits, so the accumulators
  * are range-checked after every add and fail LOUDLY at the true hazard
  * point (review r10: pre-guard, a legal-input product like 1e10·1e10
  * overflowed to null at shuffle serialization and NPE'd the merge).
  */
object WeightedAvg extends Aggregator[(Double, Double), (JBD, JBD), Double] {
  /** Snap a double to an exact 6-dp decimal (half-up, like SQL round).
    * NaN/Infinity and values outside the scaled-long range fail loudly —
    * `math.round` alone would map NaN to an exact 0 contribution and
    * silently saturate at ±Long.MaxValue, diverging from SQL aggregate
    * semantics (NaN poisons; overflow errors under ANSI). */
  private def d6(x: Double): JBD = {
    require(!x.isNaN && !x.isInfinity, s"weighted_avg: non-finite input $x")
    require(math.abs(x) < 9.2e12,
      s"weighted_avg: |$x| exceeds the supported input magnitude (~9.2e12)")
    // HALF_UP = half away from zero, honoring the documented "like SQL
    // round" contract for NEGATIVE inputs too (review r10): math.round
    // is half-toward-+inf, so -0.5e-6 scaled would snap to 0 where
    // SQL/DuckDB round gives -1e-6.
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
  }

  /** The encoder serializes the buffer as DECIMAL(38,18) = 20 integer
    * digits; an accumulator past that silently becomes null at shuffle
    * time (non-ANSI) and NPEs the merge. Check after EVERY add so the
    * failure is loud and names the aggregate, not a downstream NPE. */
  private def checked(x: JBD, what: String): JBD = {
    require(x.precision - x.scale <= 20,
      s"weighted_avg: $what exceeded the DECIMAL(38,18) buffer range " +
        "(~1e20) — rescale the inputs")
    x
  }

  override def zero: (JBD, JBD) = (JBD.ZERO, JBD.ZERO)

  override def reduce(b: (JBD, JBD), in: (Double, Double)): (JBD, JBD) = {
    val v = d6(in._1)
    val w = d6(in._2)
    (checked(b._1.add(v.multiply(w)), "sum(value*weight)"),
      checked(b._2.add(w), "sum(weight)"))
  }

  override def merge(a: (JBD, JBD), b: (JBD, JBD)): (JBD, JBD) =
    (checked(a._1.add(b._1), "sum(value*weight)"),
      checked(a._2.add(b._2), "sum(weight)"))

  override def finish(b: (JBD, JBD)): Double =
    if (b._2.signum == 0) Double.NaN
    else b._1.divide(b._2, 12, RoundingMode.HALF_EVEN).doubleValue

  override def bufferEncoder: Encoder[(JBD, JBD)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
