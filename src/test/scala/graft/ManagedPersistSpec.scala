package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for graft.core.ManagedPersist's two MEASURED traps
  * (PLANS_r13 item 2): (1) a dead entry must not evict a live
  * identical-plan sibling's cache blocks — the Dataset cache is keyed
  * by canonical plan and Bench's best-of-2 shares one entry across its
  * two constructions; (2) once every same-plan registrant is dead, the
  * sweep releases the entry. GC is advisory — assertions retry a few
  * collection cycles; registrant locals live in helper-method frames so
  * they are genuinely unreachable after return. */
class ManagedPersistSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // the shared plan shape; UNPERSISTED here — registrants persist their
  // own copy (same canonical plan ⇒ one shared cache entry)
  private def shape(): DataFrame =
    spark.range(0, 1000).toDF("id").withColumn("v", col("id") % 7)

  // strong refs for the "live sibling" — nulled to kill it
  private var liveHandle: AnyRef = _

  /** Build+persist+register one registrant in ITS OWN stack frame; keep
    * a strong ref only when `keep`. */
  private def registrant(keep: Boolean): Unit = {
    val h = shape()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = h.groupBy(col("v")).count()
    out.collect()
    graft.core.ManagedPersist.register(h, out)
    if (keep) liveHandle = out
  }

  private def cached(df: DataFrame): Boolean =
    spark.sharedState.cacheManager.lookupCachedData(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isDefined

  private def gcSweep(): Unit = {
    System.gc()
    Thread.sleep(50)
    graft.core.ManagedPersist.sweep()
  }

  test("dead entry does not evict a live identical-plan sibling; " +
      "release happens once all registrants are dead") {
    spark.catalog.clearCache()
    registrant(keep = false) // dies at return
    registrant(keep = true)  // liveHandle holds it
    val probe = shape()
    (1 to 10).foreach(_ => gcSweep())
    assert(cached(probe),
      "sweep evicted a cache entry with a live same-plan registrant")
    liveHandle = null
    var tries = 0
    while (cached(probe) && tries < 40) { gcSweep(); tries += 1 }
    assert(!cached(probe),
      "sweep failed to release the entry after all registrants died")
    spark.catalog.clearCache()
  }

  /** Register in a helper frame, extending handles to a DERIVED frame
    * the "caller" keeps — the multi-stage-caller shape ADVICE r13
    * flagged: without the extension the helper's own handles are dead
    * as soon as it returns. */
  private def extendedRegistrant(): DataFrame = {
    val h = shape()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = h.groupBy(col("v")).count()
    out.collect()
    graft.core.ManagedPersist.register(h, out)
    val finalFrame = out.filter(col("count") > 0)
    graft.core.ManagedPersist.extendHandles(out, finalFrame)
    finalFrame
  }

  test("extendHandles ties the persist to the caller's derived frame " +
      "(ADVICE r13)") {
    spark.catalog.clearCache()
    var kept: AnyRef = extendedRegistrant()
    val probe = shape()
    (1 to 10).foreach(_ => gcSweep())
    assert(cached(probe),
      "persist released while the extended (derived) handle was live")
    kept = null
    var tries = 0
    while (cached(probe) && tries < 40) { gcSweep(); tries += 1 }
    assert(!cached(probe),
      "sweep failed to release after the extended handle died")
    spark.catalog.clearCache()
  }
}
