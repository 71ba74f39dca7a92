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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    sweepStopped()
    memo.computeIfAbsent((spark, dir, name),
      _ => load0(spark, dir, name))
  }

  /** Evict entries whose session's context is STOPPED (ADVICE r14: a
    * strong key pinned a dead session's analyzed plans and session
    * state for the JVM lifetime). Runs on every load — the map holds
    * ≤ sessions × tables entries, so the sweep is a few dozen
    * `isStopped` flag reads, trivial next to the lookup it fronts.
    * (A WeakHashMap key would not work here: each memoized DataFrame
    * strongly references its session, so the value would pin the weak
    * key forever — the documented WeakHashMap value→key leak.) */
  private def sweepStopped(): Unit = sweepWhere(_.sparkContext.isStopped)

  /** The sweep's eviction core, predicate-injectable so a spec can
    * exercise it without stopping the suite-shared SparkContext (the
    * production predicate above is the one-line `isStopped` read). */
  private[graft] def sweepWhere(pred: SparkSession => Boolean): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (pred(it.next()._1)) it.remove()
  }

  /** Drop every session's pinned frames under `dir` — the hook for a
    * fixture dir REGENERATED IN PLACE mid-JVM (ADVICE r14: the memo
    * pins the inferred schema, so an in-place regeneration that changes
    * it — e.g. an events ts physical-type flip — would otherwise serve
    * a stale schema until JVM exit). Artifact staleness for DERIVED
    * tables remains FixtureCache's fingerprint job; this hook covers
    * the raw fixture frames the memo itself pins. */
  def invalidate(dir: String): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) if (it.next()._2 == dir) it.remove()
  }

  /** Test hook: the live memo keys. */
  private[graft] def memoKeys: Set[(SparkSession, String, String)] = {
    val b = Set.newBuilder[(SparkSession, String, String)]
    memo.keySet().forEach(k => b += k)
    b.result()
  }

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
