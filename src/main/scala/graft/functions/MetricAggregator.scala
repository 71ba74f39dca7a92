package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.Schemas.RemittanceTransaction

/** The W2 window aggregate as a typed `Aggregator` — the engine's UDAF
  * extension point (SURVEY.md §7 phase 3: the reference exposes no
  * UDF/UDAF surface; this demonstrates ours on the typed Dataset path).
  *
  * Semantics mirror WindowMetrics.tumbling (success = exchangeRate != 0,
  * averages over successes, min/max over successes with 0-defaults). The
  * expression-based WindowMetrics is the production path (codegen'd,
  * decimal-exact); this typed form is for users who need arbitrary JVM
  * state per group — the `TypedImperativeAggregate` pattern at API level.
  */
case class MetricBuf(cnt: Long, success: Long, failure: Long,
                     sumAmount: Double, sumRate: Double,
                     minAmount: Double, maxAmount: Double)

case class MetricOut(cnt: Long, successCount: Long, failureCount: Long,
                     avgAmount: Double, avgRate: Double,
                     minAmount: Double, maxAmount: Double)

object MetricAggregator
    extends Aggregator[RemittanceTransaction, MetricBuf, MetricOut] {
  type Buf = MetricBuf
  type Out = MetricOut

  def zero: MetricBuf = MetricBuf(0L, 0L, 0L, 0.0, 0.0, Double.PositiveInfinity,
    Double.NegativeInfinity)

  def reduce(b: MetricBuf, t: RemittanceTransaction): MetricBuf =
    if (t.exchangeRate != 0.0)
      MetricBuf(b.cnt + 1, b.success + 1, b.failure,
        b.sumAmount + t.amount, b.sumRate + t.exchangeRate,
        math.min(b.minAmount, t.amount), math.max(b.maxAmount, t.amount))
    else MetricBuf(b.cnt + 1, b.success, b.failure + 1,
      b.sumAmount, b.sumRate, b.minAmount, b.maxAmount)

  def merge(a: MetricBuf, b: MetricBuf): MetricBuf =
    MetricBuf(a.cnt + b.cnt, a.success + b.success, a.failure + b.failure,
      a.sumAmount + b.sumAmount, a.sumRate + b.sumRate,
      math.min(a.minAmount, b.minAmount), math.max(a.maxAmount, b.maxAmount))

  def finish(b: MetricBuf): MetricOut = {
    val avgA = if (b.success > 0) b.sumAmount / b.success else 0.0
    val avgR = if (b.success > 0) b.sumRate / b.success else 0.0
    MetricOut(b.cnt, b.success, b.failure, avgA, avgR,
      if (b.success > 0) b.minAmount else 0.0,
      if (b.success > 0) b.maxAmount else 0.0)
  }

  def bufferEncoder: Encoder[MetricBuf] = Encoders.product[MetricBuf]
  def outputEncoder: Encoder[MetricOut] = Encoders.product[MetricOut]
}
