package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs (graft.queries.*); each pack pairs
  * Spark implementations with DuckDB oracle SQL over the same parquet
  * fixtures. Keys present in `queries` but absent from `oracleSql` get the
  * driver's weaker rows-only check (reserved for non-SQL-expressible ops).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    ReferenceQueries,
    RelationalQueries,
    ExtendedQueries,
    TextQueries,
    SimilarityQueries,
    PipelineQueries,
    GraphQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's analytical core (W2 10 s tumbling window metrics). */
  def entry(spark: SparkSession): DataFrame =
    queries("w2_metrics_10s")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap

  /** Exact-value twins + relative error bounds for the spec-approximate
    * sketch queries (see [[graft.queries.QueryPack.boundedOracles]]) —
    * consumed by tools/check.py as a bounded-error gate where the hash
    * compare is impossible by design. */
  def boundedOracles: Map[String, (String, Double, Seq[String], Seq[String])] =
    packs.flatMap(_.boundedOracles).toMap

  /** Materialize shared per-fixture artifacts (shingle base, dedup
    * index) outside any timed region — Bench calls this during warmup so
    * per-query timings are order-independent. */
  def prewarm(spark: SparkSession, dir: String): Unit =
    packs.foreach(_.prewarm(spark, dir))
}
