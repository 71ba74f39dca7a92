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

  /** Funnel state: min view, max seen ts, pruned click/purchase sets. */
  case class FunnelState(vMin: Long, maxTs: Long, clicks: Seq[Long],
                         purchases: Seq[Long])

  /** A finalized per-user funnel row (epoch-ms stage timestamps). */
  case class FunnelResult(user_id: Long, t_view_ms: Option[Long],
                          t_click_ms: Option[Long],
                          t_purchase_ms: Option[Long], stage: Int)

  /** Streaming twin of q63's funnel (first view → first click strictly
    * after it → first purchase strictly after that), CORRECT under
    * out-of-order arrival: per-user state buffers the minimal sufficient
    * statistics and the funnel is finalized only when the event-time
    * timeout fires (watermark past last event + horizon), exactly like a
    * batch pass over the user's history.
    *
    * Why the state stays small — pruning with a proof obligation:
    *  - views: only the MINIMUM view time can matter; one long.
    *  - clicks: the current click answer b = min{c > vMin} only ever
    *    DECREASES (later batches can only lower vMin or add smaller
    *    clicks), so clicks > b can never become the answer — pruned.
    *    Kept clicks are those ≤ b (each is the answer for some final
    *    vMin below it). With no view yet, every distinct click is a
    *    candidate — the unpruned worst case is the user's distinct click
    *    times inside the watermark horizon, the irreducible cost of
    *    order-insensitive sequence matching.
    *  - purchases: same argument against the (also monotone) click
    *    answer.
    *
    * Input: (user_id LONG, event_type STRING, ts TIMESTAMP), watermarked
    * — the timeout clock is the watermark, as in [[sessionsWithTimeout]]. */
  def funnelStages(spark: SparkSession, events: DataFrame,
                   horizonMs: Long): Dataset[FunnelResult] = {
    import spark.implicits._
    val NoV = Long.MaxValue
    events.select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val FunnelState(vMin, _, clicks, purchases) = state.get
            state.remove()
            val tView = if (vMin == NoV) None else Some(vMin)
            val tClick = tView.flatMap(v =>
              clicks.filter(_ > v).sorted.headOption)
            val tPurch = tClick.flatMap(c =>
              purchases.filter(_ > c).sorted.headOption)
            val stage = Seq(tView, tClick, tPurch).takeWhile(_.isDefined).size
            Iterator.single(FunnelResult(user, tView, tClick, tPurch, stage))
          } else {
            val st = state.getOption.getOrElse(
              FunnelState(NoV, 0L, Seq.empty, Seq.empty))
            var (vMin, maxTs) = (st.vMin, st.maxTs)
            var clicks = st.clicks
            var purchases = st.purchases
            rows.foreach { case (_, typ, ts) =>
              val ms = ts.getTime
              maxTs = math.max(maxTs, ms)
              typ match {
                case "view"     => vMin = math.min(vMin, ms)
                case "click"    => clicks = clicks :+ ms
                case "purchase" => purchases = purchases :+ ms
                case _          => ()
              }
            }
            clicks = clicks.distinct.sorted
            val b = clicks.find(_ > vMin)
            clicks = b.fold(clicks)(x => clicks.filter(_ <= x))
            purchases = purchases.distinct.sorted
            val b2 = b.flatMap(x => purchases.find(_ > x))
            purchases = b2.fold(purchases)(x => purchases.filter(_ <= x))
            state.update(FunnelState(vMin, maxTs, clicks, purchases))
            state.setTimeoutTimestamp(maxTs + horizonMs)
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

  /** q67's per-user running moments: event count + decimal-exact Σv and
    * Σv² of everything seen so far (scale 6/12 — the same quantization
    * as the batch query's DECIMAL(14,6) casts, so the stream and batch
    * scores are bit-identical, not approximately equal). */
  case class AnomalyState(n: Long, s: BigDecimal, s2: BigDecimal)

  /** A flagged event — same columns as q67's batch output. */
  case class AnomalyFlag(user_id: Long, event_id: Long, value: Double,
                         n_prior: Long, mean_prior: Double, z: Double)

  /** Streaming twin of q67_user_anomaly: each event is z-scored against
    * its own user's running history the moment it arrives — the online
    * fraud-detector shape the batch query replays offline (the
    * reference's static risk threshold, StreamJob.java:92-100, upgraded
    * to an adaptive per-key baseline). State per user is THREE numbers
    * (count, Σv, Σv² as exact decimals), so state size is O(users),
    * independent of stream length — no event history is retained.
    *
    * Parity contract: within a micro-batch rows are re-ordered by
    * (ts_ms, event_id) before folding, so when arrival order respects
    * event time across batches (the in-order ingest case; StreamingSpec
    * pins it) the flagged set EQUALS the batch query's, bit-for-bit.
    * Under out-of-order arrival the online score intentionally differs:
    * a late event scores against the history at ARRIVAL — that is the
    * real-time semantic; the batch query is the retrospective one. */
  class AnomalyProcessor(warmup: Long, zThreshold: Double)
      extends StatefulProcessor[Long, (Long, Long, Long, Double), AnomalyFlag] {
    @transient private var st: ValueState[AnomalyState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AnomalyState]("moments",
        Encoders.product[AnomalyState], TTLConfig.NONE)
    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Long, Long, Double)],
                                 timers: TimerValues): Iterator[AnomalyFlag] = {
      var cur = if (st.exists()) st.get() else AnomalyState(0L, 0, 0)
      val out = Seq.newBuilder[AnomalyFlag]
      // batch-order parity within the micro-batch: (ts, event_id)
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach {
        case (_, eventId, _, v) =>
          if (cur.n >= warmup) {
            // the same double AST as q67: decimal sums cast to double,
            // then IEEE mean/var/z on identical operands
            val s = cur.s.toDouble
            val s2 = cur.s2.toDouble
            val mean = s / cur.n
            val varPrior = (s2 - s * s / cur.n) / (cur.n - 1)
            val z = (v - mean) / math.sqrt(varPrior)
            if (varPrior > 0.0 && math.abs(z) > zThreshold)
              out += AnomalyFlag(user, eventId, v, cur.n, mean, z)
          }
          val dec = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          cur = AnomalyState(cur.n + 1, cur.s + dec, cur.s2 + dec * dec)
      }
      st.update(cur)
      out.result().iterator
    }
  }

  /** Input: (user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE). */
  def userAnomalies(spark: SparkSession, events: DataFrame,
                    warmup: Long = 10L,
                    zThreshold: Double = 3.0): Dataset[AnomalyFlag] = {
    import spark.implicits._
    events.select("user_id", "event_id", "ts", "value")
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .map(r => (r._1, r._2, r._3.getTime, r._4))
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(warmup, zThreshold),
        TimeMode.None(), OutputMode.Append())
  }

  case class MktState(mts: Long, mtype: String)
  case class AttributedPurchase(user_id: Long, event_id: Long,
                                attr: String, value: Double)

  /** Streaming twin of q80_attribution: purchases are credited ONLINE at
    * arrival to the user's most recent preceding click/view within the
    * lookback — the state is ONE carried (ts, type) pair per user, never
    * an event history. Under in-order ingest the per-purchase attribution
    * EQUALS the batch query's (same (ts, event_id) order, same lookback
    * arithmetic; StreamingSpec pins it across a mid-stream micro-batch
    * split). A late marketing event cannot retroactively re-credit an
    * already-emitted purchase — that is the online semantic; the batch
    * query is the retrospective one. */
  class AttributionProcessor(lookbackSec: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, String, Double),
        AttributedPurchase] {
    @transient private var st: ValueState[MktState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MktState]("lastmkt",
        Encoders.product[MktState], TTLConfig.NONE)
    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Long, Long, String, Double)],
                                 timers: TimerValues): Iterator[AttributedPurchase] = {
      var cur = if (st.exists()) st.get() else null
      val out = Seq.newBuilder[AttributedPurchase]
      // batch-order parity within the micro-batch: (ts, event_id)
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach {
        case (_, eventId, tsS, etype, v) => etype match {
          case "click" | "view" => cur = MktState(tsS, etype)
          case "purchase" =>
            val attr =
              if (cur == null || tsS - cur.mts > lookbackSec) "direct"
              else cur.mtype
            out += AttributedPurchase(user, eventId, attr, v)
          case _ => ()
        }
      }
      if (cur != null) st.update(cur)
      out.result().iterator
    }
  }

  /** Input: (user_id LONG, event_id LONG, ts TIMESTAMP,
    * event_type STRING, value DOUBLE). */
  def attributePurchases(spark: SparkSession, events: DataFrame,
                         lookbackSec: Long = 3600L): Dataset[AttributedPurchase] = {
    import spark.implicits._
    events.select("user_id", "event_id", "ts", "event_type", "value")
      .as[(Long, Long, java.sql.Timestamp, String, Double)]
      .map(r => (r._1, r._2, r._3.getTime / 1000L, r._4, r._5))
      .groupByKey(_._1)
      .transformWithState(new AttributionProcessor(lookbackSec),
        TimeMode.None(), OutputMode.Append())
  }
}
