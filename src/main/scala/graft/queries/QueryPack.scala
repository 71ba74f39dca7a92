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

  /** For queries that are APPROXIMATE BY SPEC (sketches — HLL, GK).
    *
    * Each entry: (exact-value DuckDB twin, relative error bound the
    * sketch guarantees, row-identifying key columns, exactly-compared
    * columns). The harness (tools/check.py) aligns rows on the keys
    * (approximate cells can't participate in row ordering), compares the
    * `exactCols` — the deliberate exact-aggregate controls in the query,
    * which must not inherit the sketch's slack — cell-identical, and
    * every other numeric cell within rtol. A real check where a hash
    * compare is impossible by design and rows-only says nothing. Column
    * names must match the Spark output. */
  def boundedOracles
      : Map[String, (String, Double, Seq[String], Seq[String])] = Map.empty

  /** Materialize any shared per-fixture artifacts OUTSIDE a timed region
    * (Bench calls this in its warmup): packs whose queries share a
    * memoized on-disk base override this so per-query timings don't
    * depend on query order. Correctness is unaffected either way — the
    * memo builds lazily on first use. */
  def prewarm(s: SparkSession, dir: String): Unit = ()
}
