package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.JsonCodec
import graft.operators.{RiskLabeler, WindowMetrics}

/** The reference's two dataflow pipelines (StreamJob.java:29-221),
  * re-expressed as source-agnostic `DataFrame => DataFrame` combinators —
  * the same column expressions run in batch (fixture parquet) and under
  * Structured Streaming (Kafka / MemoryStream / rate source). That single
  * definition executing in both modes is the core Spark-native design win
  * (SURVEY.md §7 phase 0.4).
  *
  * Input contract: a DataFrame with a string `value` column holding the
  * JSON wire shape (Kafka value), or already-parsed transaction columns.
  */
object Pipelines {

  /** Event-time column derived from the epoch-millis `timestamp` field. */
  val eventTime: Column = timestamp_millis(col("timestamp"))

  /** Pipeline B ("Metrics", StreamJob.java:94-218): parse → watermark →
    * 10 s tumbling window → conditional aggregate → metric JSON line.
    *
    * @param watermark allowed lateness; reference uses monotonous
    *                  timestamps ≈ "0 seconds" (SURVEY.md §2.4 T2)
    */
  def metricsPipeline(raw: DataFrame, watermark: String = "0 seconds",
                      windowDur: String = "10 seconds"): DataFrame = {
    val parsed = JsonCodec.parseTransactions(raw, col("value"))
      .filter(!col("_corrupt"))
      .withColumn("event_time", eventTime)
      .withWatermark("event_time", watermark)
    val m = WindowMetrics.tumbling(parsed, col("event_time"),
      col("exchangeRate") =!= 0.0, col("amount"), col("exchangeRate"),
      windowDur)
    m.withColumn("line", JsonCodec.metricJson(
      col("window_start"), col("window_end"), col("cnt"),
      col("success_cnt"), col("failure_cnt"), col("avg_amount"),
      col("avg_rate"), col("min_amount"), col("max_amount")))
  }

  /** Pipeline A ("Risk", StreamJob.java:55-90): parse → label → latency
    * stamp → printf line. Stateless; watermark kept for parity (T1) though
    * nothing downstream consumes it. */
  def riskPipeline(raw: DataFrame, threshold: Double = 1000.0): DataFrame = {
    val parsed = JsonCodec.parseTransactions(raw, col("value"))
      .filter(!col("_corrupt"))
    val labeled = RiskLabeler.labelWithLatency(
      parsed, col("amount"), col("timestamp"), threshold)
    RiskLabeler.formatted(labeled, col("transactionId"), col("amount"))
  }

  /** Watermarked stream-stream interval join (the reference has no joins —
    * SURVEY.md §2.7 gap analysis; this is the missing piece next to the
    * stream-static join).
    *
    * Shape: equi-key + forward time-range predicate. With watermarks on
    * BOTH sides, Spark bounds the join state — each side's buffered rows
    * are evicted once the other side's watermark passes the range bound —
    * so state stays O(key-rate × window), not O(stream length): the only
    * stream-stream join shape that survives at scale. The same combinator
    * runs in batch (withWatermark is a no-op there), which is what the
    * equivalence spec exploits.
    *
    * Caller selects from aliases `l` / `r`. */
  def intervalJoin(a: DataFrame, b: DataFrame, keyCol: String, tsCol: String,
                   watermark: String, withinSeconds: Long,
                   joinType: String = "inner"): DataFrame = {
    val l = a.withWatermark(tsCol, watermark).alias("l")
    val r = b.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$tsCol") > col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") +
          expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType)
  }

  /** The LLM-ingest pipeline (pl8's batch chain) on an UNBOUNDED stream:
    * normalize → quality filter → exact dedup on the normalized content
    * hash via `dropDuplicatesWithinWatermark` (state bounded by the
    * watermark horizon — an exact duplicate arriving within `dedupHorizon`
    * of the first copy is dropped; later than that it re-admits, the
    * standard bounded-state tradeoff) → per-doc token count, ready for
    * downstream packing/aggregation.
    *
    * Input: (idCol, textCol, tsCol event-time). Same column expressions
    * as the batch operators (tx7/tx2/tx1), so batch and stream agree on
    * every per-doc value — StreamingSpec pins the equivalence. */
  def ingestStream(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String, dedupHorizon: String = "1 hour",
                   minQuality: Double = 0.0): DataFrame = {
    import graft.functions.TextFunctions
    docs
      .withColumn("norm_text", TextFunctions.normalizeText(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("quality") > minQuality && col("norm_text") =!= "")
      .withColumn("content_hash", md5(col("norm_text")))
      .withWatermark(tsCol, dedupHorizon)
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col(idCol), col(tsCol), col("content_hash"),
        TextFunctions.tokenCount(col("norm_text")).as("n_tok"),
        col("quality"))
  }

  /** Deterministic part of pipeline A (no wall-clock columns) — used by the
    * streaming-equals-batch equivalence tests. */
  def riskPipelineDeterministic(raw: DataFrame,
                                threshold: Double = 1000.0): DataFrame = {
    val parsed = JsonCodec.parseTransactions(raw, col("value"))
      .filter(!col("_corrupt"))
    RiskLabeler.formatted(
      RiskLabeler.label(parsed, col("amount"), threshold),
      col("transactionId"), col("amount"))
      .select(col("transactionId"), col("amount"), col("risk_type"), col("line"))
  }
}
