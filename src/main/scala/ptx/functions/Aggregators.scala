package ptx.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Library UDF/UDAF surface (SURVEY §2 G8 note): the declared queries use
  * only Catalyst built-ins (codegen + pushdown preserved), but the engine
  * ships one typed Aggregator for users who need black-box aggregation.
  *
  * Scale note: Aggregator is mergeable (partial aggregation map-side), so it
  * shuffles one (sum, weight) pair per group per partition — the same
  * two-phase shape as built-in aggregates.
  */
object Aggregators {

  /** Weighted mean: value-weight pairs → Σwx / Σw (null on zero weight). */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Untyped Column form usable in DataFrame aggs:
    * `df.agg(weighted_mean(col("x"), col("w")))`. */
  def weighted_mean(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)
}
