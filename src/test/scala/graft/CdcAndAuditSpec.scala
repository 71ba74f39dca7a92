package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Planted-input semantics for the round-7 CDC/audit/link-prediction
  * queries: q79 must DETECT broken referential integrity (not just count
  * zeros on intact fixtures), pl20's change feed must classify by the
  * exact modular derivation, gr4 must predict precisely the un-linked
  * pair with a shared neighborhood, q78's distribution functions must
  * match hand-computed rank arithmetic.
  */
class CdcAndAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("q79 fk audit: planted orphans surface per edge; degraded twin fires") {
    val dir = tmp("graft-fk")
    Seq((1L, "n1")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    Seq((1L, 1L, "BUILDING"), (10L, 1L, "AUTO"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((5L, 1L)).toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.parquet(s"$dir/supplier.parquet")
    Seq(Tuple1(7L)).toDF("p_partkey")
      .coalesce(1).write.parquet(s"$dir/part.parquet")
    // one orphan order (custkey 99 has no customer); two rows on key 10
    // (degraded twin drops customer 10 → both rows orphan there)
    Seq((100L, 1L), (101L, 99L), (102L, 10L), (103L, 10L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // one lineitem orphan on part (999), all else intact
    Seq((100L, 7L, 5L), (100L, 999L, 5L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q79_fk_audit")(spark, dir)
      .collect().map(r => r.getAs[String]("fk") ->
        ((r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("n_orphan_keys"), r.getAs[Long]("n_orphan_rows"))))
      .toMap
    assert(out("orders.custkey->customer") == ((4L, 3L, 1L, 1L)))
    // degraded parent additionally loses key 10 → +1 orphan key, +2 rows
    assert(out("orders.custkey->customer[degraded]") == ((4L, 3L, 2L, 3L)))
    assert(out("lineitem.partkey->part") == ((2L, 2L, 1L, 1L)))
    assert(out("lineitem.suppkey->supplier") == ((2L, 1L, 0L, 0L)))
    assert(out("customer.nationkey->nation") == ((2L, 1L, 0L, 0L)))
  }

  test("pl20 snapshot diff: delta classified exactly by the derivation") {
    val dir = tmp("graft-cdc")
    (1L to 200L).map(k => (k, k % 7, "O", 1000.0 + k))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("pl20_snapshot_diff")(spark, dir)
      .collect().map(r => r.getAs[String]("change") ->
        r.getAs[Long]("o_orderkey"))
    val byChange = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byChange("deleted") == Set(97L, 194L))
    assert(byChange("changed") == Set(89L, 178L))
    assert(byChange("added") == Set(100000101L))
    assert(out.length == 5) // nothing else leaks into the delta
  }

  test("q84 skew profile: per-column top-5, consistent shares and salt") {
    val rows = SparkEntry.queries("q84_skew_profile")(spark,
      "/root/testdata/sf0.001").collect()
    val byCol = rows.groupBy(_.getAs[String]("key_col"))
    assert(byCol.keySet ==
      Set("l_orderkey", "l_partkey", "l_suppkey"))
    byCol.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
      // counts non-increasing in rank; share and salt consistent
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.sliding(2).forall(p =>
        p(0).getAs[Long]("cnt") >= p(1).getAs[Long]("cnt")))
      sorted.foreach { r =>
        val (cnt, n) = (r.getAs[Long]("cnt"), r.getAs[Long]("n_rows"))
        assert(r.getAs[Double]("share") == cnt.toDouble / n)
        assert(r.getAs[Long]("salt_factor") ==
          math.ceil(cnt * 32.0 / n).toLong)
        assert(r.getAs[Long]("salt_factor") >= 1L)
      }
    }
  }

  test("gr4: predicts exactly the un-linked pair with a shared neighborhood") {
    val dir = tmp("graft-gr4")
    // baskets {1,2,3} ×2 and {2,3,4} ×2 → support-2 edges
    // 1-2,1-3,2-3,2-4,3-4; the only common>=2 pairs are (1,4) (shared
    // {2,3}, NOT an edge → the prediction) and (2,3) (shared {1,4}, edge)
    val rows = for {
      (ok, parts) <- Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)),
        (3L, Seq(2L, 3L, 4L)), (4L, Seq(2L, 3L, 4L)))
      p <- parts
    } yield (ok, p)
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("gr4_neighbor_jaccard")(spark, dir)
      .collect().map(r => ((r.getAs[Long]("u"), r.getAs[Long]("v")),
        (r.getAs[Long]("common"), r.getAs[Boolean]("is_edge"),
          r.getAs[Double]("jaccard")))).toMap
    assert(out.keySet == Set((1L, 4L), (2L, 3L)))
    assert(out((1L, 4L)) == ((2L, false, 1.0))) // N(1)=N(4)={2,3}
    assert(out((2L, 3L)) == ((2L, true, 0.5)))  // {1,4} of deg-3 nodes
  }

  test("q78: ntile/percent_rank/cume_dist match hand-computed ranks") {
    val dir = tmp("graft-wd")
    (Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0), (4L, 1L, 40.0),
      (5L, 2L, 99.0)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q78_window_distribution")(spark, dir)
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("quartile"), r.getAs[Double]("pct_rank"),
          r.getAs[Double]("cdist")))).toMap
    assert(out(1L) == ((1L, 0.0, 0.25)))
    assert(out(2L) == ((2L, 1.0 / 3, 0.5)))
    assert(out(3L) == ((3L, 2.0 / 3, 0.75)))
    assert(out(4L) == ((4L, 1.0, 1.0)))
    assert(out(5L) == ((1L, 0.0, 1.0))) // singleton partition
  }
}
