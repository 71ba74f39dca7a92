package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Scalar reference interleave. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the scalar reference interleave") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L), (21L, 42L),
      (1048575L, 524287L))
    val out = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"), 21).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) => assert(z == zRef(x, y, 21), s"($x,$y)") }
  }

  test("top-of-z bucketing decomposes a grid into exact squares") {
    // full 64x64 grid, 6-bit dims, 16 buckets (top 4 z bits): each bucket
    // must be EXACTLY one 16x16 square — the pruning rectangle property.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val stats = ZOrder.bucketStats(grid, Seq($"x", $"y"), bits = 6,
        bucketBits = 4)
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 256)
      assert(r.getAs[Long]("max_d0") - r.getAs[Long]("min_d0") == 15)
      assert(r.getAs[Long]("max_d1") - r.getAs[Long]("min_d1") == 15)
      assert(r.getAs[Long]("min_d0") % 16 == 0 &&
        r.getAs[Long]("min_d1") % 16 == 0)
    }
  }

  test("sql twin emits the same codes") {
    val sql = ZOrder.zValueSql(Seq("x", "y"), 6)
    // evaluate the generated arithmetic via Spark SQL (same grammar for
    // shift/mask/or as DuckDB) against zValue
    val n = Seq((5L, 9L), (63L, 0L), (17L, 33L)).toDF("x", "y")
      .withColumn("a", ZOrder.zValue(Seq($"x", $"y"), 6))
      .withColumn("b", expr(sql))
      .filter($"a" =!= $"b").count()
    assert(n == 0)
  }

  test("overflowing geometry is rejected") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(lit(1L), lit(1L)), 32)
    }
  }
}
