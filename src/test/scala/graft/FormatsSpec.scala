package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-format + layout coverage: csv/json round-trips, partitioned
  * parquet writes with partition pruning (the mechanism that lets a
  * 100 TB table answer a one-month query by reading one month). */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows and values") {
    val src = graft.core.Tables.load(spark, dir, "nation")
    val out = tmp("graft-csv")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(out)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip preserves rows and values") {
    val src = graft.core.Tables.load(spark, dir, "region")
    val out = tmp("graft-json")
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves rows and values") {
    val src = graft.core.Tables.load(spark, dir, "supplier")
    val out = tmp("graft-orc")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.schema(src.schema).orc(out)
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
  }

  test("bucketed table write: bucket metadata recorded for co-located reads") {
    import spark.implicits._
    val name = "graft_bucketed_fmt"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    graft.core.Tables.load(spark, dir, "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable(name)
    val cat = spark.catalog
    assert(cat.tableExists(name))
    val described = spark.sql(s"DESCRIBE EXTENDED $name").collect()
      .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(described.contains("Num Buckets") && described.contains("4"))
    spark.sql(s"DROP TABLE $name")
  }

  test("partitioned parquet write + partition pruning reaches the scan") {
    val out = tmp("graft-part")
    val orders = graft.core.Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_year") === 1997)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_year"), s"no partition filter in plan:\n$scan")
    val want = orders.filter(col("o_year") === 1997).count()
    assert(pruned.count() == want && want > 0)
    // pruning must touch only the one partition directory's files
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!files.contains("o_year=1996") || files.contains("o_year=1997"))
  }

  /** Rows the parquet scan actually surfaced (post row-group/file stats
    * skipping, pre Spark-side Filter) — the physical-pruning witness. */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    scan.metrics("numOutputRows").value
  }

  test("z-order layout: single-dimension predicate skips files a linear " +
      "layout must read (min/max stats pruning observed in scan metrics)") {
    import graft.operators.ZOrder
    // 128×128 uniform grid, 16 output files ⇒ z-layout = 4×4 grid of
    // 32×32 rectangles (one row group per file, so row-group stats
    // skipping IS file skipping); linear layout = 16 x-stripes covering
    // the full y range.
    val bits = 7
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128).as("x"),
      (col("id") / 128).cast("long").as("y"))
    val outL = tmp("graft-zlin"); val outZ = tmp("graft-zord")
    grid.repartitionByRange(16, col("x"))
      .write.mode("overwrite").parquet(outL)
    ZOrder.layout(grid, Seq(col("x"), col("y")), bits, 16)
      .write.mode("overwrite").parquet(outZ)
    // predicate on y ONLY: orthogonal to the linear sort key — the case
    // z-ordering exists for
    val pred = col("y") >= 40 && col("y") <= 60
    val zq = spark.read.parquet(outZ).filter(pred)
    val lq = spark.read.parquet(outL).filter(pred)
    // the filter must reach the parquet scan for stats skipping to apply
    assert(zq.queryExecution.executedPlan.collectLeaves().head.toString
      .contains("PushedFilters: [IsNotNull(y), GreaterThanOrEqual(y,40"))
    // identical results either way
    assert(zq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      lq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val (zRows, lRows) = (scannedRows(zq), scannedRows(lq))
    // linear: every x-stripe spans all y ⇒ nothing skips (16384 rows
    // surface). z: only the y∈[32,64) band of rectangles survives the
    // min/max check ⇒ ≤ ~2 bands of 4 files = 8192 rows, in practice 1.
    assert(lRows == 128L * 128L, s"linear layout unexpectedly skipped: $lRows")
    assert(zRows * 2 <= lRows,
      s"z-order layout did not skip files: z=$zRows linear=$lRows")
  }

  test("sort-on-write layout: range-partitioned sorted files prune a " +
      "time-range scan that a hash layout must fully read") {
    // the 1-D complement of z-ordering — the standard time-series
    // layout: repartitionByRange + sortWithinPartitions on the
    // timestamp makes per-file min/max ranges DISJOINT, so a narrow
    // time predicate scans ~1/16 of the data; a hash-shuffled layout
    // spreads every time range across every file and skips nothing.
    val n = 1L << 14
    val data = spark.range(n).select(
      // decorrelate write order from ts so "unsorted" is genuinely mixed
      ((col("id") * 2654435761L) % n).as("ts_s"),
      (col("id") % 97).as("v"))
    val outH = tmp("graft-hash"); val outS = tmp("graft-sorted")
    data.repartition(16).write.mode("overwrite").parquet(outH)
    data.repartitionByRange(16, col("ts_s"))
      .sortWithinPartitions(col("ts_s"))
      .write.mode("overwrite").parquet(outS)
    val pred = col("ts_s") >= 1000 && col("ts_s") < 1500
    val sq = spark.read.parquet(outS).filter(pred)
    val hq = spark.read.parquet(outH).filter(pred)
    assert(sq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      hq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val (sRows, hRows) = (scannedRows(sq), scannedRows(hq))
    assert(hRows == n, s"hash layout unexpectedly skipped: $hRows")
    assert(sRows * 4 <= hRows,
      s"sorted layout did not prune: sorted=$sRows hash=$hRows")
  }
}
