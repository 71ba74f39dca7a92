package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
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

  /** A closed per-key session, emitted by event-time timeout. */
  case class SessionSummary(key: String, n: Long, total: Double,
                            last_ms: Long, closed_by_timeout: Boolean)

  /** Timer-driven session close via `EventTimeTimeout` — the Structured
    * Streaming analog of a Flink keyed ProcessFunction registering an
    * event-time timer: rows accumulate silently per key; when the
    * watermark passes lastEventTime + gap with no new rows, the timeout
    * fires and the closed session is emitted and its state dropped.
    *
    * Input: a DataFrame with (key STRING, ts TIMESTAMP, value DOUBLE),
    * already watermarked (the timeout clock IS the watermark).
    * Scale: state per active key only; timeout eviction bounds it to the
    * active-session working set. */
  def sessionsWithTimeout(spark: SparkSession, events: DataFrame,
                          gapMs: Long): Dataset[SessionSummary] = {
    import spark.implicits._
    // plain column selection only: re-casting `ts` would mint a fresh
    // attribute and silently drop the watermark tag the timeout needs
    events.select("key", "ts", "value")
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Long), SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[(Long, Double, Long)]) =>
          if (state.hasTimedOut) {
            val (n, total, last) = state.get
            state.remove()
            Iterator.single(SessionSummary(key, n, total, last,
              closed_by_timeout = true))
          } else {
            var (n, total, last) = state.getOption.getOrElse((0L, 0.0, 0L))
            rows.foreach { case (_, ts, v) =>
              n += 1; total += v; last = math.max(last, ts.getTime)
            }
            state.update((n, total, last))
            state.setTimeoutTimestamp(last + gapMs)
            Iterator.empty
          }
      }
  }

  /** Per-key running max on the `transformWithState` arbitrary-state API
    * (Spark 4): typed `ValueState` handles, explicit TTL surface, timer
    * registration — the successor to flatMapGroupsWithState, and the API a
    * new stateful operator should target. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`), which is
    * also the provider a 100 TB deployment runs: state lives off-heap /
    * on-disk per partition, so executor memory bounds the working set,
    * not total state size. */
  class RunningMaxProcessor
      extends StatefulProcessor[String, (String, Double), (String, Double)] {
    @transient private var mx: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mx = getHandle.getValueState[Double]("mx", Encoders.scalaDouble,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                                 timers: TimerValues): Iterator[(String, Double)] = {
      var cur = if (mx.exists()) mx.get() else Double.NegativeInfinity
      rows.foreach(r => cur = math.max(cur, r._2))
      mx.update(cur)
      Iterator.single((key, cur))
    }
  }

  def runningMax(spark: SparkSession,
                 ds: Dataset[(String, Double)]): Dataset[(String, Double)] = {
    import spark.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new RunningMaxProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
