package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (see /root/repo/TESTDATA.md).
  *
  * One parquet file per table. At 100 TB these would be partitioned/bucketed
  * datasets; the loader is the single place where a production deployment
  * would swap in a catalog table or a bucketed layout, so every operator
  * downstream is storage-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
      // (µs) rejects outright; read the raw nanos as long and truncate to
      // µs — exactly what DuckDB/pyarrow do when downcasting ns → µs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all fixture tables as temp views (for spark.sql use). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Round-robin repartition to the session's shuffle parallelism, placed
    * before per-row-CPU-heavy stages (decimal folds, regex, HOFs).
    *
    * Why: a single-row-group parquet file scans as ONE task, so everything
    * narrow above it runs single-threaded regardless of core count. On a
    * real cluster the scan is already parallel (many files/row groups) and
    * callers there would drop this exchange; results are unaffected either
    * way — every aggregate downstream is partitioning-invariant by the
    * ExactNum contract. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
