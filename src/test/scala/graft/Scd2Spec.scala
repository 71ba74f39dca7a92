package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  // history: key 1 current(v=10) + closed(v=9); key 2 current(v=20);
  // key 3 current(v=30)
  private def hist = Seq(
    (1L, 10.0, ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
    (1L, 9.0, ts("2023-01-01"), ts("2024-01-01"), false),
    (2L, 20.0, ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
    (3L, 30.0, ts("2024-01-01"), null.asInstanceOf[Timestamp], true)
  ).toDF("k", "v", "valid_from", "valid_to", "is_current")

  // batch: key 1 changes, key 2 no-op, key 4 new
  private def batch = Seq(
    (1L, 11.0, ts("2024-06-01")),
    (2L, 20.0, ts("2024-06-01")),
    (4L, 40.0, ts("2024-06-01"))
  ).toDF("k", "v", "eff")

  test("close+open on change, no-op skipped, new key inserted, closed rows pass through") {
    val out = Scd2.merge(hist, batch, Seq("k"), Seq("v"), "eff")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getTimestamp(2), r.getTimestamp(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 9.0, ts("2023-01-01"), ts("2024-01-01"), false),  // untouched
      (1L, 10.0, ts("2024-01-01"), ts("2024-06-01"), false), // closed now
      (1L, 11.0, ts("2024-06-01"), null, true),              // opened
      (2L, 20.0, ts("2024-01-01"), null, true),              // no-op
      (3L, 30.0, ts("2024-01-01"), null, true),              // not in batch
      (4L, 40.0, ts("2024-06-01"), null, true)               // new key
    ))
  }

  test("replaying the same batch is a no-op (idempotent merge)") {
    val once = Scd2.merge(hist, batch, Seq("k"), Seq("v"), "eff")
    val twice = Scd2.merge(once, batch, Seq("k"), Seq("v"), "eff")
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).count() == 0)
  }

  test("empty batch passes history through unchanged") {
    val out = Scd2.merge(hist, batch.limit(0), Seq("k"), Seq("v"), "eff")
    assert(out.exceptAll(hist.select("k", "v", "valid_from", "valid_to",
      "is_current")).count() == 0)
    assert(out.count() == 4)
  }
}
