package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters over an unbounded token stream — the
  * streaming twin of tx17's Count-Min pass: which tokens dominate the
  * ingest RIGHT NOW, maintained incrementally across micro-batches
  * (vocabulary drift, spam-token surges, boilerplate floods).
  *
  * Algorithm: Misra–Gries summaries (Misra & Gries 1982), the
  * deterministic counter-based top-k sketch, SHARDED for parallelism:
  * tokens hash into `groups` independent shards, each shard's keyed
  * state holds a ≤ `capacity`-entry (token → count) [[MapState]] with
  * the classic decrement-on-overflow rule. Soundness per shard:
  * est ≤ true_count ≤ est + decrements, and `decrements ≤
  * shard_items / capacity` — the per-shard error bound rides along in
  * every emitted row (`err`), so downstream consumers get
  * [est, est + err] interval counts, not point guesses. A shard's
  * state is O(capacity) regardless of stream length; TTL additionally
  * ages the summary toward the recent window.
  *
  * Emission: after each micro-batch, a shard re-emits its current
  * candidates with est ≥ `emitThreshold` (Append mode — downstream
  * takes max(est) per token, or the latest batch's rows). Global top-k
  * = merge of the shard summaries (errors add across shards a token
  * hashes to exactly one of, so no cross-shard addition is needed —
  * sharding by token makes each token's count whole in one shard).
  *
  * At 100 TB-scale ingest this is the shape that works: per-token
  * exact counting needs unbounded state; a single global summary
  * serializes; hash-sharded Misra–Gries keeps state constant,
  * parallelism = `groups`, and the error bound explicit.
  */
object StreamingHeavyHitters {

  /** One shard candidate: est ≤ true ≤ est + err (err = the shard's
    * cumulative decrement count). */
  case class HeavyHitter(group: Long, token: String, est: Long, err: Long)

  class MisraGriesProcessor(capacity: Int, emitThreshold: Long,
                            ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, String), HeavyHitter] {
    @transient private var counts: MapState[String, Long] = _
    // (decrement total, map-was-empty-at-write-back). The Boolean is
    // load-bearing: MG's decrement-all step can LEGITIMATELY empty the
    // map (capacity counters all at 1 when a new token overflows), and
    // that emptiness must not be mistaken for a TTL eviction — resetting
    // the decrement total there would UNDERstate err and break the
    // est ≤ true ≤ est + err contract even under TTLConfig.NONE.
    @transient private var decs: ValueState[(Long, Boolean)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("mg", Encoders.STRING,
        Encoders.scalaLong, ttl)
      decs = getHandle.getValueState[(Long, Boolean)]("decs",
        Encoders.product[(Long, Boolean)], ttl)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[HeavyHitter] = {
      // work on a local map (state round-trips per op are RocksDB reads)
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      counts.iterator().foreach { case (t, c) => m.put(t, c) }
      // With a TTL, counts and decs expire INDEPENDENTLY; a surviving
      // decrement total over a TTL-EVICTED counter map would overstate
      // err forever, so an eviction restarts the error bound. But an
      // empty map whose last write-back RECORDED the emptiness (the
      // Boolean) was emptied by MG decrements, not by eviction — its
      // decrement total is exactly the error bound and must survive.
      // The strict interval contract est ≤ true ≤ est + err therefore
      // holds exactly under TTLConfig.NONE (no evictions exist, every
      // legitimate emptiness is marker-recorded); with a TTL it holds
      // relative to the post-eviction window, the intended recency
      // scope.
      var d = if (!decs.exists()) 0L else {
        val (dTot, emptyLegit) = decs.get()
        if (m.nonEmpty || emptyLegit) dTot else 0L
      }
      rows.foreach { case (_, tok) =>
        m.get(tok) match {
          case Some(c) => m.update(tok, c + 1)
          case None if m.size < capacity => m.put(tok, 1L)
          case None =>
            // decrement-all; drop zeros (the MG eviction step). One
            // global decrement per overflow item — d IS the error bound.
            d += 1
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.keysIterator.foreach { t =>
              val c = m(t) - 1
              if (c == 0L) dead += t else m.update(t, c)
            }
            dead.foreach(m.remove)
        }
      }
      // write back the full summary (≤ capacity entries)
      counts.clear()
      m.foreach { case (t, c) => counts.updateValue(t, c) }
      decs.update((d, m.isEmpty))
      m.iterator.filter(_._2 >= emitThreshold)
        .map { case (t, c) => HeavyHitter(key, t, c, d) }
    }
  }

  /** Token stream → sharded heavy-hitter candidates. `docs` is a
    * streaming DataFrame with a text column; tokens shard by portable
    * hash into `groups` keys. */
  def heavyHitters(spark: SparkSession, docs: DataFrame, textCol: String,
                   groups: Int = 32, capacity: Int = 256,
                   emitThreshold: Long = 2L,
                   ttl: TTLConfig = TTLConfig.NONE): Dataset[HeavyHitter] = {
    import spark.implicits._
    require(groups >= 1 && capacity >= 1)
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("token"))
      .select((graft.functions.PortableHash.hash60(col("token"))
        % groups).as("group"), col("token"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(
        new MisraGriesProcessor(capacity, emitThreshold, ttl),
        mode, OutputMode.Append())
  }
}
