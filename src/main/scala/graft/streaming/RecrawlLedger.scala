package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The LIVE recrawl-delta ledger (VERDICT r13 #4) — the streaming twin
  * of the batch `pl29_recrawl_delta` classification
  * ([[graft.queries.RecrawlBase.classified]]): a crawler's fetch stream
  * is classified per CANONICAL page as new / changed / unchanged
  * against the page's previous OBSERVED fetch, online, and the
  * classification converges to the batch lag-window ledger even under
  * OUT-OF-ORDER arrival.
  *
  * Why arrival-time classification is not enough: the batch ledger
  * compares each fetch with the previous fetch BY ROUND; if round 5
  * arrives before round 4, classifying at arrival compares 4 against 5
  * — wrong in both rows. Order-insensitivity needs the q63-funnel
  * argument: a fetch is classifiable only when no earlier-round fetch
  * of its page can still arrive, i.e. when the WATERMARK passes its
  * event time.
  *
  * Mechanics (transformWithState, event-time timers): per page the
  * state is ONE carried (last round, last content key) pair — q80's
  * attribution shape — plus the OPEN fetches still inside the watermark
  * horizon. Arrivals buffer and arm a timer at the earliest open
  * fetch's time; on expiry the watermark-closed prefix is classified in
  * round order against the carried pair, emitted, and dropped from
  * state; a timer re-arms for any still-open rows. State per page is
  * bounded by the watermark horizon (the irreducible buffer of
  * order-insensitive sequence classification), and the horizon is the
  * operator's ONE semantic knob: a fetch later than it classifies on
  * whatever prefix has already closed — the online semantic, exactly
  * like a batch ledger run before a straggler landed.
  *
  * Scale: state is keyed by canonical_url in the state store
  * (RocksDB-backed on a real cluster); per-page state is the carried
  * pair + O(horizon/recrawl-interval) open fetches, independent of
  * stream length.
  */
object RecrawlLedger {

  /** A fetch classified against its page's previous observed fetch —
    * the row the batch ledger's lag window produces. */
  case class ClassifiedFetch(canonical_url: String, r: Long, period: Long,
                             chg: String)

  /** Carried pair: the page's last CLOSED (round, content key). */
  private[streaming] case class PageState(lastR: Long, lastCk: Long)

  /** An open (not yet watermark-closed) fetch. */
  private[streaming] case class OpenFetch(r: Long, period: Long, ck: Long,
                                          tsMs: Long)

  private[streaming] class LedgerProcessor
      extends StatefulProcessor[String, (String, Long, Long, Long, Long),
        ClassifiedFetch] {
    @transient private var carried: ValueState[PageState] = _
    @transient private var open: ListState[OpenFetch] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      carried = getHandle.getValueState[PageState]("carried",
        Encoders.product[PageState], TTLConfig.NONE)
      open = getHandle.getListState[OpenFetch]("open",
        Encoders.product[OpenFetch], TTLConfig.NONE)
    }

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Long, Long, Long)],
        timers: TimerValues): Iterator[ClassifiedFetch] = {
      var minTs = Long.MaxValue
      rows.foreach { case (_, r, period, ck, tsMs) =>
        open.appendValue(OpenFetch(r, period, ck, tsMs))
        if (tsMs < minTs) minTs = tsMs
      }
      // arm at the earliest NEW fetch's time: the timer fires once the
      // watermark passes it, closing the prefix. Duplicate timers from
      // re-arming are harmless — expiry recomputes the closed set from
      // state, and an empty close emits nothing.
      if (minTs != Long.MaxValue) getHandle.registerTimer(minTs + 1L)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClassifiedFetch] = {
      val wm = timers.getCurrentWatermarkInMs()
      val buf = open.get().toSeq
      val (closed, still) = buf.partition(_.tsMs <= wm)
      if (still.nonEmpty)
        getHandle.registerTimer(still.map(_.tsMs).min + 1L)
      if (closed.isEmpty) return Iterator.empty
      var st = if (carried.exists()) Option(carried.get()) else None
      val out = closed.sortBy(_.r).map { f =>
        st match {
          // (ts, r) contract violation (ADVICE r14): this fetch's round
          // precedes (or duplicates) the carried round, i.e. a
          // smaller-r fetch closed AFTER a larger-r fetch was already
          // classified — only possible when event time is NOT monotone
          // in round for this page (see [[classify]]'s precondition).
          // The batch answer is unrecoverable here (the carried fetch
          // was classified against a prefix missing this row), so the
          // row is FLAGGED as "late" rather than silently regressing
          // the carried (lastR, lastCk) pair and corrupting every
          // subsequent classification.
          case Some(p) if f.r <= p.lastR =>
            ClassifiedFetch(key, f.r, f.period, "late")
          case None =>
            st = Some(PageState(f.r, f.ck))
            ClassifiedFetch(key, f.r, f.period, "new")
          case Some(p) =>
            val chg = if (f.ck != p.lastCk) "changed" else "unchanged"
            st = Some(PageState(f.r, f.ck))
            ClassifiedFetch(key, f.r, f.period, chg)
        }
      }
      st.foreach(carried.update)
      open.clear()
      still.foreach(open.appendValue)
      out.iterator
    }
  }

  /** Wire a fetch stream into the ledger. Input columns:
    * (canonical_url STRING, ts TIMESTAMP, r LONG, period LONG, ck LONG);
    * `delay` is the out-of-order horizon (the watermark delay).
    *
    * PRECONDITION — ts monotone in r per page: convergence to the
    * batch lag-by-round ledger requires that for one canonical_url,
    * r1 < r2 ⇒ ts(r1) < ts(r2) (a crawler's fetch timestamps satisfy
    * this by construction: round r's fetch HAPPENS before round
    * r+1's). ARRIVAL order is free — that is the whole point — but the
    * event times themselves must order like the rounds, because the
    * watermark closes prefixes by ts while the ledger compares by r.
    * A violating fetch (its round ≤ the carried round at close time)
    * is emitted with chg = "late" and does NOT regress the carried
    * state: the batch answer is already unrecoverable for that row,
    * and the flag makes the divergence observable instead of silently
    * corrupting every later classification of the page
    * (RecrawlLedgerSpec pins both halves). */
  def classify(spark: SparkSession, fetches: DataFrame,
               delay: String = "2 minutes"): Dataset[ClassifiedFetch] = {
    import spark.implicits._
    fetches.select("canonical_url", "ts", "r", "period", "ck")
      .withWatermark("ts", delay)
      .as[(String, java.sql.Timestamp, Long, Long, Long)]
      .map(x => (x._1, x._3, x._4, x._5, x._2.getTime))
      .groupByKey(_._1)
      .transformWithState(new LedgerProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** (round × period) cell counts over the classified stream — the
    * batch ledger's seen-cells as a continuously maintained aggregate.
    * Classification is watermark-final, so the counts are monotone and
    * converge to `pl29_recrawl_delta`'s n_seen/n_new/n_changed/
    * n_unchanged; run in Update output mode (cells revise as their
    * rounds close). */
  def cellUpdates(classified: Dataset[ClassifiedFetch]): DataFrame =
    classified.groupBy(col("r").as("round"), col("period"))
      .agg(count(lit(1)).as("n_seen"),
        sum(when(col("chg") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("chg") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("chg") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
}
