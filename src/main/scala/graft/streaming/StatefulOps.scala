package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.Schemas.RemittanceTransaction

/** Custom keyed state via flatMapGroupsWithState — the Structured
  * Streaming analog of Flink's keyed ProcessFunction (which the reference
  * never uses: `keyBy` does not appear in StreamJob.java — SURVEY.md §2.7).
  * Provided as the engine's custom-state extension surface, with a
  * concrete operator: per-sender running totals with a large-transfer
  * alert once the cumulative amount crosses a threshold.
  *
  * Scale: state is partitioned by key in the state store (RocksDB/HDFS
  * backed on a real cluster), so per-key state size — not key count —
  * bounds memory.
  */
object StatefulOps {

  case class SenderStats(senderId: String, totalAmount: Double, txCount: Long,
                         alert: Boolean)

  def senderRunningTotals(spark: SparkSession,
                          txs: Dataset[RemittanceTransaction],
                          alertThreshold: Double): Dataset[SenderStats] = {
    import spark.implicits._
    txs.groupByKey(_.senderId)
      .flatMapGroupsWithState[(Double, Long), SenderStats](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (sender, rows, state: GroupState[(Double, Long)]) =>
          val (prevAmt, prevCnt) = state.getOption.getOrElse((0.0, 0L))
          var amt = prevAmt
          var cnt = prevCnt
          val out = rows.map { t =>
            amt += t.amount
            cnt += 1
            SenderStats(sender, amt, cnt, alert = amt > alertThreshold)
          }.toList
          state.update((amt, cnt))
          out.iterator
      }
  }
}
