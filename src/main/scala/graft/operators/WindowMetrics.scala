package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactNum._

/** W2 — the analytical core of the reference: a tumbling event-time window
  * aggregate with a success/failure split.
  *
  * Reference semantics (StreamJob.java:112-173, SURVEY.md §2.3):
  *   - failure  ⇔ exchangeRate == 0 (the CNY poison value)
  *   - count    = successCount + failureCount
  *   - averages = Σ(success amount|rate) / successCount, 0 when no successes
  *   - min/max  over success rows only; 0 when no successes (our documented
  *     fix of the reference's Double.MAX_VALUE/MIN_VALUE sentinel)
  *
  * Design: one set of column expressions, usable identically in batch and
  * Structured Streaming (`groupBy(window(...))` is the same logical plan in
  * both modes). The reference's `windowAll` is non-keyed (parallelism 1);
  * `keys` generalizes it — pass grouping columns and the same aggregate runs
  * keyed, which is the 100 TB-scale shape (shuffle by (key, window), partial
  * aggregation map-side, no global bottleneck).
  */
object WindowMetrics {

  /** Core combinator: tumbling window metrics over any event DataFrame.
    *
    * @param ts      event-time column (TimestampType)
    * @param ok      success predicate (reference: exchangeRate =!= 0)
    * @param amount  the measured value (reference: amount)
    * @param rate    the secondary averaged value (reference: exchangeRate)
    * @param dur     window duration, e.g. "10 seconds"
    * @param keys    optional grouping keys (empty = reference's windowAll)
    */
  def tumbling(df: DataFrame, ts: Column, ok: Column, amount: Column,
               rate: Column, dur: String, keys: Seq[Column] = Nil): DataFrame = {
    val w = window(ts, dur)
    val okAmount = when(ok, amount)
    val okRate = when(ok, rate)
    val success = sum(when(ok, 1L).otherwise(0L))
    df.groupBy((w +: keys): _*)
      .agg(
        count(lit(1)).as("cnt"),
        coalesce(sumExact(okAmount) / nullif(success, lit(0L)), lit(0.0))
          .as("avg_amount"),
        coalesce(sumExact(okRate) / nullif(success, lit(0L)), lit(0.0))
          .as("avg_rate"),
        coalesce(min(okAmount), lit(0.0)).as("min_amount"),
        coalesce(max(okAmount), lit(0.0)).as("max_amount"),
        success.as("success_cnt"),
        sum(when(!ok, 1L).otherwise(0L)).as("failure_cnt"))
      .withColumn("window_start", unix_millis(col("window.start")))
      .withColumn("window_end", unix_millis(col("window.end")))
      .drop("window")
  }

  /** The DuckDB-oracle SQL twin of [[tumbling]] for a given table/columns.
    * Window bounds are epoch millis (matches Metric.windowStart/windowEnd,
    * StreamJob.java:160-161). */
  def tumblingSql(table: String, tsCol: String, okPred: String,
                  amountCol: String, rateCol: String, durMs: Long,
                  keys: Seq[String] = Nil): String = {
    val keySel = if (keys.isEmpty) "" else keys.mkString(", ", ", ", "")
    val keyGrp = if (keys.isEmpty) "" else keys.mkString(", ", ", ", "")
    val okAmt = s"CASE WHEN $okPred THEN $amountCol END"
    val okRate = s"CASE WHEN $okPred THEN $rateCol END"
    s"""SELECT
       |  (epoch_ms($tsCol) // $durMs) * $durMs AS window_start,
       |  (epoch_ms($tsCol) // $durMs) * $durMs + $durMs AS window_end$keySel,
       |  count(*) AS cnt,
       |  COALESCE(${sumExactSql(okAmt)} / NULLIF(sum(CASE WHEN $okPred THEN 1 ELSE 0 END), 0), CAST(0 AS DOUBLE)) AS avg_amount,
       |  COALESCE(${sumExactSql(okRate)} / NULLIF(sum(CASE WHEN $okPred THEN 1 ELSE 0 END), 0), CAST(0 AS DOUBLE)) AS avg_rate,
       |  COALESCE(min($okAmt), CAST(0 AS DOUBLE)) AS min_amount,
       |  COALESCE(max($okAmt), CAST(0 AS DOUBLE)) AS max_amount,
       |  CAST(sum(CASE WHEN $okPred THEN 1 ELSE 0 END) AS BIGINT) AS success_cnt,
       |  CAST(sum(CASE WHEN NOT ($okPred) THEN 1 ELSE 0 END) AS BIGINT) AS failure_cnt
       |FROM $table
       |GROUP BY 1, 2$keyGrp""".stripMargin
  }
}
