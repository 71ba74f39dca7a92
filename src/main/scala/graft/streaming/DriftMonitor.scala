package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming source-distribution drift monitor — the production twin of
  * the batch `pl18_source_drift` query: each arriving document lands in a
  * (window, source, bucket) cell, and completed windows are scored with a
  * Pearson χ² against a REFERENCE bucket distribution (learned offline
  * from the trained corpus — pl18 derives it from the same batch; a
  * monitor must compare against history, not itself).
  *
  * Topology: ONE windowed streaming aggregation (watermark-bounded state,
  * append output on window close) produces the cell counts; the χ² fold
  * runs per micro-batch in `foreachBatch` over ONLY the newly closed
  * windows' cells joined with the broadcast reference — Spark's
  * single-stateful-aggregation constraint never binds, and the second
  * (grid-sized) aggregation is batch-land where chained aggs are free.
  *
  * Scale: streaming state is O(active windows × sources × buckets) narrow
  * count rows; the reference frame is buckets-sized and broadcast; each
  * foreachBatch invocation touches only that batch's closed windows.
  */
object DriftMonitor {

  /** Windowed (window, source, bucket) counts — the streaming stateful
    * stage. `docs` must carry an event-time column `tsCol`. */
  def windowedCells(docs: DataFrame, tsCol: String, sourceCol: String,
      bucketCol: String, windowLen: String,
      watermark: String = "0 seconds"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("win"),
        col(sourceCol).as("source"), col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("obs"))

  /** χ² of each (window, source)'s bucket mix against `reference`
    * (bucket, p) with Σp = 1. Pure batch arithmetic — usable directly on
    * a batch cell table (the spec's stream ≡ batch pin) and inside
    * [[driftSink]]'s foreachBatch. The grid completes against ALL
    * reference buckets: a source missing a bucket contributes the full
    * n_s·p expectation term, exactly like pl18's zero cells.
    */
  def chiSquare(cells: DataFrame, reference: DataFrame): DataFrame = {
    val perSrc = cells.groupBy(col("win"), col("source"))
      .agg(sum(col("obs")).as("n_s"))
    // (window, source) × reference-bucket grid, left-filled with obs
    val grid = perSrc.crossJoin(broadcast(reference))
    val filled = grid.join(cells, Seq("win", "source", "bucket"),
        "left_outer")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
    val exp = col("n_s").cast("double") * col("p")
    filled
      .withColumn("term",
        (col("obs").cast("double") - exp) * (col("obs").cast("double") - exp)
          / exp)
      .groupBy(col("win"), col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        graft.functions.ExactNum.sumExact(col("term")).as("chi2"))
  }

  /** End-to-end monitor: windowed cells → per-batch χ² vs `reference` →
    * `sink(chi2Batch, batchId)` (append-mode: each closed window arrives
    * exactly once). */
  def driftSink(docs: DataFrame, reference: DataFrame, tsCol: String,
      sourceCol: String, bucketCol: String, windowLen: String,
      watermark: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    windowedCells(docs, tsCol, sourceCol, bucketCol, windowLen, watermark)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (cells: DataFrame, batchId: Long) =>
        sink(chiSquare(cells, reference), batchId)
      }.start()
}
