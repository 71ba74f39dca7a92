package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P2/P3 — stateless per-event risk labeling + latency stamping + printf
  * formatting (StreamJob.java:67-89).
  *
  * Reference semantics: riskType = amount > threshold ? "RISK" : "SAFE"
  * (threshold hard-coded 1000, StreamJob.java:76 — kept configurable here,
  * since the live generator's amounts ∈ [0,1) make every event SAFE);
  * processingTime = wall-clock millis; latency = processingTime - event ts.
  *
  * Unlike the reference (which leaves transactionId/amount unset in the
  * output POJO — RiskLabel.java quirk, SURVEY.md §1.2) we carry the full
  * input row. Wall-clock columns are nondeterministic by nature and are
  * excluded from oracle hash-matching (structural tests assert latency ≥ 0).
  */
object RiskLabeler {
  val DefaultThreshold = 1000.0

  /** Deterministic part: the label. */
  def label(df: DataFrame, amount: Column, threshold: Double = DefaultThreshold): DataFrame =
    df.withColumn("risk_type",
      when(amount > threshold, "RISK").otherwise("SAFE"))

  /** Full reference-parity enrichment incl. wall-clock latency stamping. */
  def labelWithLatency(df: DataFrame, amount: Column, eventTimeMillis: Column,
                       threshold: Double = DefaultThreshold): DataFrame = {
    val nowMs = unix_millis(current_timestamp())
    label(df, amount, threshold)
      .withColumn("processing_time", nowMs.cast("string"))
      .withColumn("latency", (nowMs - eventTimeMillis).cast("string"))
  }

  /** P3 — the console line format (StreamJob.java:82-89). */
  def formatted(df: DataFrame, txId: Column, amount: Column): DataFrame =
    df.withColumn("line", format_string(
      "TxId=%s, Amount=%.2f, Risk=%s",
      txId, amount, col("risk_type")))
}
