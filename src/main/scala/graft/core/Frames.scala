package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Per-(session, path) frame memo for ARTIFACT parquet/orc reads — the
  * [[Tables]] memo generalized (optimization r15, guide §1/§7.3):
  * `spark.read.parquet` runs a footer schema-inference JOB on every
  * call, and artifact-served queries construct several artifact frames
  * per run (index tables, meta rows, served bases), so each Bench
  * best-of-2 pair paid 2× a chain of ~30-80 ms driver barriers per
  * artifact before any real work (JobProbe: ~0.6 s of dd12's 2.4 s).
  * Only the inferred schema is pinned — data always comes from the
  * files at execution time.
  *
  * Staleness: FixtureCache generation dirs are content-addressed
  * (fingerprint in the path), so their entries can never go stale.
  * MUTABLE index roots (DedupIndex/TextIndex/VectorIndex append/
  * compact/delete) must call [[invalidate]](root) after every write —
  * all in-repo mutators do; a new mutator that forgets the hook serves
  * a stale schema/partition listing, which is why the hook sits inside
  * the operators' write methods, not at call sites. Stopped sessions
  * are swept on every lookup (the Tables/ADVICE-r14 discipline).
  *
  * [[headRow]] additionally memoizes single-row meta tables (index
  * metadata), replacing a per-call collect JOB with a map read — same
  * invalidation rules.
  */
object Frames {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()
  private val rowMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Row]()

  def parquet(spark: SparkSession, path: String): DataFrame = {
    sweepStopped()
    memo.computeIfAbsent((spark, "p:" + path),
      _ => spark.read.parquet(path))
  }

  def orc(spark: SparkSession, path: String): DataFrame = {
    sweepStopped()
    memo.computeIfAbsent((spark, "o:" + path),
      _ => spark.read.orc(path))
  }

  /** First row of a (single-row) parquet meta table, memoized. */
  def headRow(spark: SparkSession, path: String): Row = {
    sweepStopped()
    rowMemo.computeIfAbsent((spark, "p:" + path),
      _ => parquet(spark, path).collect().head)
  }

  /** Drop every session's entries under `pathPrefix` — REQUIRED after
    * any in-place mutation of an index root (append/compact/delete/
    * swap/recover). Prefix semantics so one call covers a root's
    * sub-tables. */
  def invalidate(pathPrefix: String): Unit = {
    def sweep[A](m: java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String), A]): Unit = {
      val it = m.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k._2.stripPrefix("p:").stripPrefix("o:")
            .startsWith(pathPrefix)) it.remove()
      }
    }
    sweep(memo); sweep(rowMemo)
  }

  private def sweepStopped(): Unit = {
    def sweep[A](m: java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String), A]): Unit = {
      val it = m.keySet().iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    }
    sweep(memo); sweep(rowMemo)
  }

  /** Test hook: live memo size. */
  private[graft] def memoSize: Int = memo.size() + rowMemo.size()
}
