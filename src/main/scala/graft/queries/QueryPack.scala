package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of oracle-checked queries.
  *
  * Each entry in [[queries]] is a `(SparkSession, sfDir) => DataFrame`; the
  * matching entry in [[oracles]] (same key) is ANSI SQL that DuckDB runs on
  * the same parquet tables and must produce value-identical output (the
  * driver sorts columns by name and hash-compares). Keys without an oracle
  * get a weaker rows-only check — reserved for genuinely non-SQL-expressible
  * operators.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
