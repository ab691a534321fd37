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

  /** Bounded top-k as a typed Aggregator — the scalable form of
    * "ORDER BY ... LIMIT k per group". A window row_number() sorts the
    * ENTIRE group on one task (at 100 TB: the whole table shuffles and
    * the biggest group becomes the straggler); this aggregator keeps a
    * k-element sorted buffer per partition and the shuffle carries at
    * most k rows per (partition, group) — partial aggregation does the
    * pruning map-side, like any built-in agg.
    *
    * The buffer stays sorted (best first by `ord`); the common-case
    * reduce — row worse than the current k-th — is a single compare.
    */
  def topK[T](k: Int)(implicit ord: Ordering[T],
                      seqEnc: Encoder[Seq[T]]): Aggregator[T, Seq[T], Seq[T]] = {
    require(k > 0, s"topK needs k > 0, got $k")
    new Aggregator[T, Seq[T], Seq[T]] {
      override def zero: Seq[T] = Vector.empty
      override def reduce(b: Seq[T], a: T): Seq[T] =
        if (b.length >= k && ord.compare(a, b.last) >= 0) b
        else ((b :+ a).sorted(ord)).take(k)
      override def merge(b1: Seq[T], b2: Seq[T]): Seq[T] =
        if (b2.isEmpty) b1
        else if (b1.isEmpty) b2
        else (b1 ++ b2).sorted(ord).take(k)
      override def finish(r: Seq[T]): Seq[T] = r
      override def bufferEncoder: Encoder[Seq[T]] = seqEnc
      override def outputEncoder: Encoder[Seq[T]] = seqEnc
    }
  }
}
