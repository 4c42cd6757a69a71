package graft.engine.udf

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-extension surface (SURVEY.md §2.9): a scalar UDF and a typed
  * Aggregator UDAF. These prove the extension points; the engine's own
  * operators stay on builtin (codegen'd) expressions — a UDF is an
  * opaque black box to Catalyst (no pushdown through it, breaks
  * whole-stage codegen), so this surface is for genuinely custom logic
  * only. */
object Udfs {

  /** Scalar: label a discount value into a band. */
  val discountBand: Double => String = d =>
    if (d < 0.03) "low" else if (d < 0.07) "mid" else "high"

  /** Typed UDAF: quantity-weighted average price with an exact-decimal
    * buffer — sums are order-independent (merge order across partitions
    * varies at scale; a double buffer would drift run to run). */
  object WeightedAvgPrice
      extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {

    private def dec(d: Double): JBigDecimal =
      JBigDecimal.valueOf(d) // canonical shortest-decimal of the double

    def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO, JBigDecimal.ZERO)

    def reduce(b: (JBigDecimal, JBigDecimal),
        in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
      val (price, qty) = in
      (b._1.add(dec(price).multiply(dec(qty))), b._2.add(dec(qty)))
    }

    def merge(a: (JBigDecimal, JBigDecimal),
        b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (a._1.add(b._1), a._2.add(b._2))

    def finish(r: (JBigDecimal, JBigDecimal)): Double =
      if (r._2.signum == 0) 0.0
      else JBigDecimal.valueOf(r._1.doubleValue() / r._2.doubleValue())
        .setScale(4, RoundingMode.HALF_UP).doubleValue()

    def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
