package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` surface (SURVEY.md §2.10): the engine's UDAF
  * extension point, demonstrated with a weighted mean. Buffers are tiny
  * case classes; Spark plans partial (map-side) + final aggregation like
  * any built-in, so the shuffle carries (sum, weight) pairs — scale-safe.
  */
object TypedAggs {

  final case class WSum(sum: Double, weight: Double)

  /** Weighted mean of (value, weight); null result on zero total weight. */
  val weightedMean: Aggregator[(Double, Double), WSum, java.lang.Double] =
    new Aggregator[(Double, Double), WSum, java.lang.Double] {
      override def zero: WSum = WSum(0.0, 0.0)
      override def reduce(b: WSum, a: (Double, Double)): WSum =
        WSum(b.sum + a._1 * a._2, b.weight + a._2)
      override def merge(b1: WSum, b2: WSum): WSum =
        WSum(b1.sum + b2.sum, b1.weight + b2.weight)
      override def finish(r: WSum): java.lang.Double =
        if (r.weight == 0.0) null else java.lang.Double.valueOf(r.sum / r.weight)
      override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
      override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Column-API form: weighted_mean(value, weight). */
  def weightedMeanUdaf(value: Column, weight: Column): Column =
    udaf(weightedMean).apply(value, weight)
}
