package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregations (`Aggregator[IN, BUF, OUT]`) — the one
  * extension surface beside native `Expression`s this engine exposes
  * for user-defined aggregation. An Aggregator participates in
  * partial aggregation like any built-in (map-side reduce + merge),
  * which is what makes it viable at 100 TB: state is O(1) per group
  * per partition, shuffled once.
  *
  * Deliberately NOT used where a built-in composition works (the
  * no-UDF rule): these exist for genuinely stateful one-pass shapes.
  */
object Aggregators {

  /** Weighted mean: Σ(w·v) / Σ(w). One O(1) buffer; merge is
    * associative+commutative, so partial aggregation applies. Double
    * accumulation order varies across partitions — callers gate at a
    * rounding level (≤ 6 significant digits here) where reorder noise
    * (~1 ulp per add) cannot surface, same contract as the stats
    * aggregates. */
  case class WMBuf(var sum: Double, var wsum: Double)

  object WeightedMeanAgg extends Aggregator[(Double, Double), WMBuf, Double] {
    override def zero: WMBuf = WMBuf(0.0, 0.0)
    override def reduce(b: WMBuf, in: (Double, Double)): WMBuf = {
      b.sum += in._1 * in._2; b.wsum += in._2; b
    }
    override def merge(a: WMBuf, b: WMBuf): WMBuf = {
      a.sum += b.sum; a.wsum += b.wsum; a
    }
    override def finish(b: WMBuf): Double =
      if (b.wsum == 0.0) 0.0 else b.sum / b.wsum
    override def bufferEncoder: Encoder[WMBuf] = Encoders.product[WMBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column face: weighted_mean(value, weight). */
  def weightedMean(value: Column, weight: Column): Column =
    udaf(WeightedMeanAgg).apply(value, weight)
}
