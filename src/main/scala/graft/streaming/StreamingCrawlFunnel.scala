package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** The INCREMENTAL crawl-ingest funnel (VERDICT r8 #5) — the streaming
  * twin of the batch tx29 cascade (URL dedup → exact content dedup →
  * near-dup drop, TextQueries.scala): a crawler emits pages
  * continuously, and each stage must decide KEEP/DROP on arrival against
  * everything already ingested, without re-scanning history.
  *
  * Batch tx29 proved the stages COMPOSE as one plan; the content
  * near-dup stage already streams ([[StreamingDedup.nearDupVerified]]'s
  * bucket state). What was missing is the funnel's FRONT: keyed
  * keep-first dedup state for the canonical-URL and exact-hash stages.
  * Both are instances of one processor — [[KeepFirstProcessor]], a
  * ValueState holding the key's keeper doc — under the StreamingDedup
  * state discipline:
  *
  *  - TTL eviction: an expired keeper lets its URL/content re-ingest —
  *    the recency horizon a perpetual crawler actually wants (a page
  *    re-crawled after the TTL is new content, not a duplicate). With
  *    `TTLConfig.NONE` the stage is exact keep-first forever.
  *  - state per key is ONE long (the keeper id) — no cap needed; the
  *    key-space itself is bounded by the TTL horizon. RocksDB holds it
  *    off-heap, so executor memory bounds the working set.
  *
  * Keep-decision determinism (the streaming ≡ batch contract,
  * StreamingCrawlFunnelSpec): within one micro-batch the SMALLEST doc id
  * per key wins — exactly tx29's min-over-window keeper — and across
  * micro-batches first-arrival wins, which coincides with the batch
  * decision whenever replay respects doc-id order (a crawler's natural
  * monotone ingest ids). Stages connect doc-survivors → next stage;
  * in production each hop is a Kafka topic / Delta table (the standard
  * decoupled multi-stage streaming topology — chaining three arbitrary
  * stateful operators inside ONE query is not supported by the engine,
  * and a durable bus between stages is what a 1000-executor crawl
  * pipeline deploys anyway for replay/backfill isolation).
  */
object StreamingCrawlFunnel {

  /** A document surviving a funnel stage (ntok rides along so stage
    * token accounting needs no re-tokenize). */
  case class CrawlDoc(doc_id: Long, text: String, ntok: Long)

  /** Keep-first keyed dedup: the first arrival for a key is the keeper
    * (emitted); every later arrival drops silently. Within a single
    * micro-batch the smallest doc id wins — the batch tx29 keeper rule,
    * making replayed-stream output ≡ the batch window cascade. */
  class KeepFirstProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, (String, Long, String, Long),
        CrawlDoc] {
    @transient private var keeper: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, String, Long)],
        timers: TimerValues): Iterator[CrawlDoc] = {
      if (keeper.exists()) return Iterator.empty
      // min-doc-id within the batch — one pass, no buffering of texts
      var best: (String, Long, String, Long) = null
      rows.foreach { r => if (best == null || r._2 < best._2) best = r }
      if (best == null) Iterator.empty
      else {
        keeper.update(best._2)
        Iterator.single(CrawlDoc(best._2, best._3, best._4))
      }
    }
  }

  private def keepFirst(spark: SparkSession, keyed: DataFrame,
                        ttl: TTLConfig): Dataset[CrawlDoc] = {
    import spark.implicits._
    val mode =
      if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    keyed.as[(String, Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new KeepFirstProcessor(ttl), mode,
        OutputMode.Append())
  }

  /** Stage 1 — canonical-URL dedup: key = [[graft.operators.UrlCanon]]
    * canonical form (tracking params stripped, host/scheme normalized,
    * fragment dropped), so `http://A.com/p?utm_source=x` and
    * `https://a.com/p` collapse to one keeper. Input columns:
    * (idCol, urlCol, textCol). */
  def urlDedupStream(spark: SparkSession, docs: DataFrame, idCol: String,
                     urlCol: String, textCol: String,
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[CrawlDoc] =
    keepFirst(spark, docs.select(
      graft.operators.UrlCanon.canonicalize(col(urlCol)).as("k"),
      col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
      graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long").as("ntok")), ttl)

  /** Stage 2 — exact content dedup: key = md5(text), byte-identical
    * bodies collapse (tx29's exact stage / tx5's hash-groupBy, keyed
    * statefully). Input: a [[CrawlDoc]] stream (stage-1 survivors). */
  def exactDedupStream(spark: SparkSession, docs: Dataset[CrawlDoc],
                       ttl: TTLConfig = TTLConfig.NONE): Dataset[CrawlDoc] =
    keepFirst(spark, docs.toDF().select(md5(col("text")).as("k"),
      col("doc_id"), col("text"), col("ntok")), ttl)

  /** Stage 3 — verified near-dup DECISIONS over stage-2 survivors:
    * [[StreamingDedup.nearDupVerified]] with the funnel's parameters;
    * each emitted pair's `dup_doc` is the member that arrived later —
    * the drop decision. Survivors = stage-2 output minus `dup_doc`s
    * (applied by the consumer: a stream-side anti-join against its own
    * output is not expressible in one query, and the drop set is what a
    * downstream writer actually consumes). `numHashes` must follow the
    * corpus-derived band width when batch-equivalence matters
    * (Dedup.deriveMinhashRows × bands — see the spec). */
  def nearDupStream(spark: SparkSession, docs: Dataset[CrawlDoc],
                    numHashes: Int, bands: Int = 4,
                    jaccardThreshold: Double = 0.3,
                    maxPerBucket: Int = 4096,
                    ttl: TTLConfig = TTLConfig.NONE)
      : Dataset[StreamingDedup.VerifiedPair] =
    StreamingDedup.nearDupVerified(spark,
      docs.toDF().select(col("doc_id"), col("text")), "doc_id", "text",
      shingleK = 3, numHashes = numHashes, bands = bands,
      maxPerBucket = maxPerBucket, ttl = ttl,
      jaccardThreshold = jaccardThreshold)
}
