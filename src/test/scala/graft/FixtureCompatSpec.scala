package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Regression guard for the round-6 breakage class: the driver has
  * shipped `events.ts` as parquet TIMESTAMP(NANOS)→INT64 in some fixture
  * generations and TIMESTAMP(MICROS) in others, and `Tables.load` must
  * produce the SAME timestamps from either encoding — every
  * events-reading query (the whole reference surface) dies otherwise.
  */
class FixtureCompatSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("Tables.load yields identical events from nanos-INT64 and micros") {
    val microsDir = tmp("graft-ev-us")
    val nanosDir = tmp("graft-ev-ns")
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    val rows = Seq((1L, baseUs, 10L, "view", 1.5, "{}"),
      (2L, baseUs + 1500000L, 10L, "click", 2.5, "{}"))
    // micros generation: a real TimestampType column
    rows.map { case (id, us, u, t, v, p) =>
      (id, new java.sql.Timestamp(us / 1000), u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$microsDir/events.parquet")
    // nanos generation: ts as a raw INT64 nanos column (what the scan
    // yields under spark.sql.legacy.parquet.nanosAsLong)
    rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$nanosDir/events.parquet")
    val a = graft.core.Tables.load(spark, microsDir, "events")
      .select($"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.core.Tables.load(spark, nanosDir, "events")
      .select($"event_id", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a == Set((1L, 1704067200000000L),
      (2L, 1704067201500000L)))
    // and the reference flagship runs on BOTH encodings
    Seq(microsDir, nanosDir).foreach { d =>
      val out = SparkEntry.queries("w2_metrics_10s")(spark, d).collect()
      assert(out.nonEmpty)
    }
  }
}
