package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous referential-integrity monitoring — q79's streaming twin:
  * every ingested fact micro-batch is anti-joined against the (static,
  * broadcast) parent dimension, and surviving orphans aggregate into
  * watermark-closed event-time windows, per offending key. One
  * stateful aggregation (window × key counts, watermark-bounded), so
  * the query stays in append mode and state is O(active windows ×
  * offending keys) — orphan keys are FEW by construction in a healthy
  * pipeline, and a flood of them is exactly the signal.
  *
  * Emitted rows (window_start, window_end, key, n_orphan_rows) land
  * only after the watermark closes the window — each window exactly
  * once, the DriftMonitor contract.
  */
object QualityMonitor {

  def orphanMonitor(facts: DataFrame, tsCol: String, keyCol: String,
                    parent: DataFrame, parentKeyCol: String,
                    windowLen: String = "10 seconds",
                    watermarkDelay: String = "5 seconds"): DataFrame =
    facts
      .withWatermark(tsCol, watermarkDelay)
      .join(broadcast(parent.select(col(parentKeyCol).as(keyCol))
        .distinct()), Seq(keyCol), "left_anti")
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n_orphan_rows"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("n_orphan_rows"))
}
