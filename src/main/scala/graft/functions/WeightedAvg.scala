package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY.md §2.14): exact weighted average via
  * `Aggregator[IN, BUF, OUT]` — the engine's sanctioned path for custom
  * aggregation logic (black-box row UDFs stay banned).
  *
  * The buffer keeps the weighted sum in SCALED LONG space (micro-units),
  * not doubles: partial buffers merge in any order on a cluster, and
  * integer accumulation makes the result partition-order-independent —
  * the same determinism-by-construction rule as [[graft.Tables.dsum]].
  * Inputs are (value, weight) pairs with 2-decimal test data; the ×1e6
  * scaling is exact for them and overflows only past ~9e12 weighted sum,
  * far beyond the fixture range.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
  private val Scale = 1000000L

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (v, w) = in
    (b._1 + math.round(v * Scale) * math.round(w), b._2 + math.round(w))
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN else b._1.toDouble / Scale / b._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
