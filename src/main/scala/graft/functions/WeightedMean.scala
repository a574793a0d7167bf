package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Aggregator surface (the third custom-extension tier after native
  * `Expression`s and the injected check rule): an exact weighted mean
  * `Σ(v·w) / Σw` whose partial states are DECIMAL sums — merge-order
  * independent, so the result is identical under any partitioning, AQE
  * re-plan, or retry, and identical to a SQL oracle computing
  * `CAST(SUM(CAST(v*w AS DECIMAL(38,6))) AS DOUBLE) /
  *  CAST(SUM(CAST(w   AS DECIMAL(38,6))) AS DOUBLE)`.
  *
  * Quantization mirrors Catalyst's double→DECIMAL(38,6) cast exactly:
  * `BigDecimal.valueOf(double)` (shortest-decimal) then HALF_UP at scale 6
  * — the same arithmetic `dsum` relies on engine-wide, done by hand here
  * because inside an Aggregator WE are the accumulator.  The buffer
  * encodes as two DecimalType(38,18) fields: scale-6 values survive the
  * round-trip exactly.
  *
  * NULL-weight/value rows are the CALLER's contract to filter: a typed
  * Aggregator sees primitives, and a silent null→0.0 would skew the mean.
  */
class WeightedMean extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def q6(d: Double): BigDecimal =
    new BigDecimal(JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP))

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + q6(a._1 * a._2), b._2 + q6(a._2))

  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN else r._1.toDouble / r._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
