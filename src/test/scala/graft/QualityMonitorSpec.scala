package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.QualityMonitor

/** Streaming FK-orphan monitor (q79's streaming twin): planted orphans
  * surface per closed window with exact per-key counts; intact facts
  * never emit; late-but-in-watermark orphans land in their OWN
  * event-time window.
  */
class QualityMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  test("planted orphans aggregate per window x key; intact rows stay silent") {
    implicit val sc = spark.sqlContext
    val parent = Seq(1L, 2L, 3L).toDF("c_custkey")
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = QualityMonitor.orphanMonitor(
        mem.toDS().toDF("ts", "cust"), "ts", "cust", parent, "c_custkey")
      .writeStream.outputMode("append").format("memory")
      .queryName("orphan_q").start()
    try {
      // window [0,10): orphans key 99 ×2, key 7 ×1; intact keys 1-3
      mem.addData(Seq((ts(1), 1L), (ts(2), 99L), (ts(3), 99L),
        (ts(4), 7L), (ts(5), 2L), (ts(6), 3L)))
      q.processAllAvailable()
      // advance the watermark past window end (event 25s → wm 20s)
      mem.addData(Seq((ts(25), 1L)))
      q.processAllAvailable()
      mem.addData(Seq((ts(40), 1L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("orphan_q").collect().map(r =>
      (r.getAs[java.sql.Timestamp]("window_start").getTime / 1000L,
        r.getAs[Long]("cust"), r.getAs[Long]("n_orphan_rows"))).toSet
    assert(got == Set((0L, 99L, 2L), (0L, 7L, 1L)),
      s"got $got")
  }
}
