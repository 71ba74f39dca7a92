package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftMonitor

/** The streaming drift monitor: hand-computed χ² against a reference
  * mix (including the completed-grid zero-cell term), and stream ≡ batch
  * on the same rows — each closed window scored exactly once.
  */
class DriftMonitorSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  private val reference =
    Seq(("en", 0.5), ("de", 0.5)).toDF("bucket", "p")

  // window [0, 10): srcA 8 en + 2 de → χ² = (8-5)²/5 + (2-5)²/5 = 3.6
  //                 srcB 4 en, NO de → χ² = (4-2)²/2 + (0-2)²/2 = 4.0
  private val rows =
    (1 to 8).map(i => (ts(i), "A", "en")) ++
    Seq((ts(2), "A", "de"), (ts(3), "A", "de")) ++
    (1 to 4).map(i => (ts(i), "B", "en"))

  test("chiSquare: hand-computed values, zero cell from grid completion") {
    val cells = DriftMonitor.windowedCells(
      rows.toDF("ts", "source", "bucket"), "ts", "source", "bucket",
      "10 seconds")
    val out = DriftMonitor.chiSquare(cells, reference)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("chi2")))).toMap
    assert(out("A") == ((10L, 3.6)))
    assert(out("B") == ((4L, 4.0)))
  }

  test("stream equals batch: closed windows scored exactly once") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Double)]()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt").toString
    val q = DriftMonitor.driftSink(
      mem.toDF().toDF("ts", "source", "bucket"), reference,
      "ts", "source", "bucket", "10 seconds", "0 seconds", ckpt,
      (chi, _) => got.synchronized {
        got ++= chi.collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("n_docs"), r.getAs[Double]("chi2")))
      })
    try {
      mem.addData(rows)
      q.processAllAvailable()
      // sentinel far past the window end closes [0, 10)
      mem.addData(Seq((ts(1000), "Z", "en")))
      q.processAllAvailable()
      mem.addData(Seq((ts(2000), "Z", "en")))
      q.processAllAvailable()
    } finally q.stop()
    val scored = got.filter(t => t._1 == "A" || t._1 == "B").sorted
    assert(scored == Seq(("A", 10L, 3.6), ("B", 4L, 4.0)))
  }
}
