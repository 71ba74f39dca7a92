package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Lifecycle pins for the Tables.load frame memo (ADVICE r14): the
  * memo must not pin a STOPPED session's analyzed plans for the JVM
  * lifetime, and an in-place fixture regeneration must have an
  * invalidation hook. The eviction core is exercised through the
  * predicate seam (sweepWhere) because the suite JVM shares ONE
  * SparkContext — actually stopping it would kill every other suite;
  * the production predicate on top of the seam is the one-line
  * `sparkContext.isStopped` read. Collectability follows the
  * ManagedPersistSpec pattern: weak ref + advisory GC retries.
  */
class TablesMemoSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val dirA = "/root/testdata/sf0.001"
  private val dirB = "/root/testdata/sf0.01"

  test("load memoizes per (session, dir, table) and serves the same " +
      "lazy frame") {
    val a = Tables.load(spark, dirA, "region")
    val b = Tables.load(spark, dirA, "region")
    assert(a eq b, "second load rebuilt the frame instead of memo-hit")
    assert(Tables.load(spark, dirB, "region") ne a,
      "frames for different fixture dirs must not share a memo entry")
  }

  test("invalidate(dir) drops exactly that dir's entries (the in-JVM " +
      "fixture-regeneration hook)") {
    val a = Tables.load(spark, dirA, "nation")
    Tables.load(spark, dirB, "nation")
    Tables.invalidate(dirA)
    val keys = Tables.memoKeys
    assert(!keys.exists(_._2 == dirA), "dirA entries survived invalidate")
    assert(keys.exists(_._2 == dirB), "invalidate evicted the OTHER dir")
    assert(Tables.load(spark, dirA, "nation") ne a,
      "post-invalidate load must rebuild, not serve the dropped frame")
  }

  /** Build the doomed session + its memo entries in a helper frame so
    * no local survives on this test's stack. */
  private def doomedSession(): java.lang.ref.WeakReference[AnyRef] = {
    val s2 = spark.newSession()
    Tables.load(s2, dirA, "region")
    Tables.load(s2, dirB, "supplier")
    assert(Tables.memoKeys.exists(_._1 eq s2))
    val ref = new java.lang.ref.WeakReference[AnyRef](s2)
    // the predicate stands in for `isStopped` (see class scaladoc)
    Tables.sweepWhere(_ eq s2)
    ref
  }

  test("sweep evicts a dead session's entries and releases the session " +
      "itself (ADVICE r14)") {
    val before = Tables.memoKeys.size
    val ref = doomedSession()
    assert(Tables.memoKeys.size == before,
      "sweep left (or over-evicted) entries for the dead session")
    var tries = 0
    while (ref.get() != null && tries < 40) {
      System.gc(); Thread.sleep(50); tries += 1
    }
    assert(ref.get() == null,
      "the swept session is still strongly reachable — the memo (or a " +
        "memoized frame) is pinning it")
  }
}
