package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2
import graft.streaming.Scd2Stream

/** Streaming SCD2 / CDC apply (the pl13 twin): replayed micro-batches
  * leave history identical, out-of-order/late updates converge to the
  * batch-merge result, within-batch duplicates collapse to the latest. */
class Scd2StreamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val keyCols = Seq("k")
  private val attrCols = Seq("attr")

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def init: DataFrame =
    Seq((1L, "A", ts(100)), (2L, "A", ts(100)), (3L, "A", ts(100)))
      .toDF("k", "attr", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))

  private def upd(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("k", "attr", "eff_s")
      .withColumn("eff", timestamp_seconds($"eff_s")).drop("eff_s")

  private def histSet(df: DataFrame): Set[(Long, String, Long, Long, Boolean)] =
    df.select($"k", $"attr", unix_timestamp($"valid_from"),
        coalesce(unix_timestamp($"valid_to"), lit(-1L)), $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("replayed micro-batch leaves history identical (idempotent by batchId," +
      " and by change detection under a fresh id)") {
    val dim = tmp("graft-scd2s-replay")
    val b = upd((1L, "B", 200L), (4L, "N", 200L))
    Scd2Stream.applyBatch(b, 0L, dim, init, keyCols, attrCols, "eff")
    val h0 = histSet(Scd2Stream.currentDim(spark, dim, init))
    // replay under the SAME id: version exists -> untouched
    Scd2Stream.applyBatch(b, 0L, dim, init, keyCols, attrCols, "eff")
    assert(Scd2Stream.latestVersion(spark, dim).exists(_.endsWith("v0")))
    assert(histSet(Scd2Stream.currentDim(spark, dim, init)) == h0)
    // duplicate delivery under a NEW id: change detection no-ops every row
    Scd2Stream.applyBatch(b, 1L, dim, init, keyCols, attrCols, "eff")
    assert(Scd2Stream.latestVersion(spark, dim).exists(_.endsWith("v1")))
    assert(histSet(Scd2Stream.currentDim(spark, dim, init)) == h0)
  }

  test("out-of-order + duplicate-keyed stream converges to the batch merge" +
      " of the winning updates") {
    val dim = tmp("graft-scd2s-ooo")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val updates = mem.toDF().toDF("k", "attr", "eff_s")
      .withColumn("eff", timestamp_seconds($"eff_s")).drop("eff_s")
    val q = Scd2Stream.sink(updates, dim, init, keyCols, attrCols, "eff",
        tmp("graft-scd2s-ckpt"))
      .start()
    try {
      // batch 1: k=1 -> C @300; k=5 twice IN one batch (150 then 250 —
      // the 250 must win); k=4 brand-new
      mem.addData(Seq((1L, "C", 300L), (5L, "X", 150L), (5L, "Y", 250L),
        (4L, "N", 200L)))
      q.processAllAvailable()
      // batch 2 arrives LATER but carries an OLDER k=1 update (eff 180 <
      // current valid_from 300 — stale, must drop) plus a real k=2 change
      mem.addData(Seq((1L, "B", 180L), (2L, "D", 400L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = histSet(Scd2Stream.currentDim(spark, dim, init))
    // ONE batch merge of only the winners produces the same history
    val winners = upd((1L, "C", 300L), (5L, "Y", 250L), (4L, "N", 200L),
      (2L, "D", 400L))
    val batch = histSet(
      Scd2.merge(init, winners, keyCols, attrCols, "eff"))
    assert(streamed == batch)
    // and the late k=1 update truly vanished: no version with attr B
    assert(!streamed.exists(_._2 == "B"))
  }

  test("pruneVersions keeps the newest K versions and the read side") {
    val dim = tmp("graft-scd2s-prune")
    (0 to 3).foreach { i =>
      Scd2Stream.applyBatch(upd((1L, s"V$i", 200L + i)), i.toLong, dim,
        init, keyCols, attrCols, "eff")
    }
    val before = histSet(Scd2Stream.currentDim(spark, dim, init))
    Scd2Stream.pruneVersions(spark, dim, keep = 2)
    assert(Scd2Stream.latestVersion(spark, dim).exists(_.endsWith("v3")))
    assert(histSet(Scd2Stream.currentDim(spark, dim, init)) == before)
  }

  test("pruneVersions never counts a partial version toward keep, " +
      "and deletes only STALE partials") {
    val dim = tmp("graft-scd2s-partial")
    (0 to 1).foreach { i =>
      Scd2Stream.applyBatch(upd((1L, s"V$i", 200L + i)), i.toLong, dim,
        init, keyCols, attrCols, "eff")
    }
    val good = histSet(Scd2Stream.currentDim(spark, dim, init))
    // v2: a crash mid-write — data files but no _SUCCESS
    val v2 = new java.io.File(s"$dim/v2")
    assert(v2.mkdirs())
    java.nio.file.Files.write(v2.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    // v0 older than newest complete (v1) but v2 is newer: keep=1 must
    // retain v1 (the last good version), drop v0, and leave the
    // possibly-in-flight v2 alone
    Scd2Stream.pruneVersions(spark, dim, keep = 1)
    assert(Scd2Stream.latestVersion(spark, dim).exists(_.endsWith("v1")))
    assert(histSet(Scd2Stream.currentDim(spark, dim, init)) == good)
    assert(v2.exists(), "in-flight partial was deleted")
    assert(!new java.io.File(s"$dim/v0").exists())
    // once v3 completes, the v2 partial is stale and the vacuum removes it
    Scd2Stream.applyBatch(upd((1L, "V3", 300L)), 3L, dim,
      init, keyCols, attrCols, "eff")
    Scd2Stream.pruneVersions(spark, dim, keep = 1)
    assert(!v2.exists(), "stale partial survived the vacuum")
    assert(Scd2Stream.latestVersion(spark, dim).exists(_.endsWith("v3")))
  }

  test("pitEnrich: facts land on the version valid at THEIR event time") {
    val dim = tmp("graft-scd2s-pit")
    // dimension: k=1 is A from 100, becomes B at 300
    Scd2Stream.applyBatch(upd((1L, "B", 300L)), 0L, dim,
      init, keyCols, attrCols, "eff")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val facts = mem.toDF().toDF("k", "ts_s", "amount")
      .withColumn("ts", timestamp_seconds($"ts_s")).drop("ts_s")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = Scd2Stream.pitEnrich(facts, dim, init, keyCols, "ts",
      tmp("graft-scd2s-pit-ckpt"), (df, _) => got.synchronized {
        got ++= df.select($"k", unix_timestamp($"ts"), $"attr")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            Option(r.getString(2)).getOrElse("none")))
      })
    try {
      mem.addData(Seq(
        (1L, 200L, 1.0),   // during [100, 300) -> A (the CLOSED version)
        (1L, 350L, 2.0),   // during [300, null) -> B (current)
        (1L, 50L, 3.0),    // before any version -> none
        (9L, 200L, 4.0)))  // unknown key -> none
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == Set((1L, 200L, "A"), (1L, 350L, "B"),
      (1L, 50L, "none"), (9L, 200L, "none")))
  }
}
