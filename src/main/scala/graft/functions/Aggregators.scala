package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate functions (the `Aggregator` extension surface —
  * what a user reaches for when the built-in aggregates genuinely can't
  * express the semantics).
  *
  * [[WeightedMean]] follows the engine-wide exact-decimal discipline: both
  * running sums are decimals built from scale-2-cast bases multiplied IN
  * decimal (never a double product cast late — that rounds below the
  * double's ulp and diverges across engines), so `merge` is associative
  * and the aggregate is deterministic under any partition order. The final
  * division happens in double like every other engine statistic.
  */
object Aggregators {

  private val S2 = java.math.BigDecimal.valueOf(100L)

  /** `value` cast onto the exact scale-2 grid, mirroring
    * `CAST(x AS DECIMAL(18,2))`. Spark's double→decimal cast goes through
    * the double's SHORTEST decimal string (`BigDecimal.valueOf`), not its
    * full binary expansion — the two diverge on half-way values (2.675
    * rounds to 2.68 via valueOf but 2.67 via the binary expansion), so
    * `valueOf` is required for the cast-mirroring claim to hold.
    */
  private def dec2(d: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(2, java.math.RoundingMode.HALF_UP)

  /** Weighted arithmetic mean: Σ dec2(x)·dec2(w) / Σ dec2(w), as double. */
  object WeightedMean
      extends Aggregator[(Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
    override def zero: (java.math.BigDecimal, java.math.BigDecimal) =
      (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)
    override def reduce(
        b: (java.math.BigDecimal, java.math.BigDecimal),
        a: (Double, Double)): (java.math.BigDecimal, java.math.BigDecimal) = {
      val (x, w) = a
      (b._1.add(dec2(x).multiply(dec2(w))), b._2.add(dec2(w)))
    }
    override def merge(
        a: (java.math.BigDecimal, java.math.BigDecimal),
        b: (java.math.BigDecimal, java.math.BigDecimal)): (java.math.BigDecimal, java.math.BigDecimal) =
      (a._1.add(b._1), a._2.add(b._2))
    override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
      if (r._2.signum() == 0) Double.NaN
      else r._1.doubleValue() / r._2.doubleValue()
    override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `weightedMean(value, weight)`. */
  def weightedMean(value: Column, weight: Column): Column =
    udaf(WeightedMean).apply(value, weight)

  /** Bounded per-group TOP-K as a typed Aggregator: the buffer never
    * holds more than `k` (value, id) pairs, so the ranking happens in
    * the PARTIAL (map-side) aggregation — each partition ships at most
    * k rows per group into the shuffle. The window-function formulation
    * (`row_number() <= k`) must shuffle and sort EVERY row of every
    * group; for `k ≪ group size` this aggregator moves a constant
    * per group instead, which is the difference at 100 TB between a
    * top-3 costing a full sort and costing a scan. Deterministic total
    * order: value descending, id ascending on ties.
    */
  class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1)
    private def prune(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, id) => (-v, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      prune(b :+ a)
    override def merge(
        a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(a ++ b)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = prune(r)
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Column form: array<struct<_1: value, _2: id>> of the group's top k. */
  def topK(k: Int)(value: Column, id: Column): Column =
    udaf(new TopK(k)).apply(value, id)
}
