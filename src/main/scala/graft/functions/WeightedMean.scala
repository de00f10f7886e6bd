package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Input row for the weighted-mean aggregate: a measure and its weight. */
final case class WeightedIn(measure: Double, weight: Double)

/** Custom typed aggregate (SURVEY.md §2 Q37/Q81): weighted mean.
  *
  * Accumulates in exact integer arithmetic (measure in 1e-2 "cents", weight
  * rounded to a long) so the result is independent of partition/merge order —
  * a plain double accumulator would drift vs the DuckDB oracle. Suitable for
  * TPC-H-style 2-decimal money columns and integral weights; the driver data
  * (lineitem price/quantity) satisfies both.
  *
  * Buffer is (weighted sum in cents, total weight); merge is associative and
  * commutative, so Spark's partial aggregation (map-side combine) is safe.
  *
  * All buffer arithmetic is `Math.addExact`/`multiplyExact`: ~9.2e18 of
  * headroom (≈ 1e12 rows of price*qty at TPC-H magnitudes) and a loud
  * ArithmeticException — never a silent wrap — beyond it. Assumes
  * non-negative measures: `Math.round` rounds half toward +inf while the
  * DuckDB oracle rounds half away from zero, which only diverges for
  * negative inputs at exact .5 cents (the driver data is all-positive).
  */
object WeightedMeanCents
    extends Aggregator[WeightedIn, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: WeightedIn): (Long, Long) = {
    val w = math.round(a.weight)
    (Math.addExact(b._1, Math.multiplyExact(math.round(a.measure * 100), w)),
      Math.addExact(b._2, w))
  }
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (Math.addExact(x._1, y._1), Math.addExact(x._2, y._2))
  override def finish(r: (Long, Long)): Double =
    (r._1.toDouble / 100.0) / r._2.toDouble
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `weightedMean($"price", $"qty")`. */
  def column(measure: Column, weight: Column): Column =
    udaf(this, Encoders.product[WeightedIn]).apply(measure, weight)

  /** The DuckDB SQL that reproduces the exact arithmetic sequence. */
  def oracleSql(measure: String, weight: String): String =
    s"(CAST(sum(CAST(round(($measure) * 100) AS BIGINT) * " +
      s"CAST(round($weight) AS BIGINT)) AS DOUBLE) / 100.0) / " +
      s"CAST(sum(CAST(round($weight) AS BIGINT)) AS DOUBLE)"
}
