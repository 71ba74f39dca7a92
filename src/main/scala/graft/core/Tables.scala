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

  /** Per-(session, dir, table) frame memo: `spark.read.parquet` runs a
    * footer schema-inference JOB on every call, so an un-memoized load
    * taxed every DataFrame construction (one job per table reference —
    * visible in PlanQualitySpec's construction-laziness pin). The frame
    * is lazy and immutable: DATA always comes from the files at
    * execution time; only the inferred schema is pinned, and the
    * fixture dirs are static for a JVM's lifetime (artifact staleness
    * is FixtureCache's fingerprint job, not this memo's). Sessions key
    * by identity; the memo holds ≤ sessions × tables lazy frames. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, dir, name),
      _ => load0(spark, dir, name))

  private def load0(spark: SparkSession, dir: String,
                    name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
      // generations and TIMESTAMP(MICROS) in others. Adapt to whatever the
      // file actually stores: with nanosAsLong set (a no-op for micros
      // files) a nanos column scans as LongType, which we truncate to µs —
      // exactly what DuckDB/pyarrow do when downcasting ns → µs; a native
      // timestamp column passes through (NTZ casts to LTZ identically under
      // the UTC session the harness pins).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
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
