package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting relational properties on the sf0.001 fixtures (the
  * per-query value correctness is the DuckDB oracle's job — these cover
  * what the oracle can't). */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k =>
      assert(qs.contains(k), s"oracle without query: $k"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, s"$name failed")
    }
  }

  // q21/q45 fold their sketch-accuracy contract into the hash-oracled
  // result as booleans; these spec twins re-derive the RAW estimates and
  // assert the tighter fixture-observed bounds directly, so a sketch
  // regression is caught even if someone loosens the in-query bound.
  test("q21: in-query HLL bound booleans true + raw estimate within 10%") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q21_approx_distinct")(spark, dir).collect()
      .foreach { r =>
        assert(r.getAs[Boolean]("parts_est_ok"), "parts_est_ok false")
        assert(r.getAs[Boolean]("orders_est_ok"), "orders_est_ok false")
      }
    graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect().foreach { r =>
        val (a, e) = (r.getAs[Long]("approx").toDouble,
          r.getAs[Long]("exact").toDouble)
        assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
      }
  }

  test("q45: in-query GK bound booleans true + raw estimate within 2%") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q45_approx_percentile")(spark, dir)
      .collect()
    out.foreach { r =>
      Seq("p25_ok", "p50_ok", "p75_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"$c false"))
    }
    val exactDisc = out.map(r => r.getAs[String]("l_returnflag") ->
      (r.getAs[Double]("p25_exact"), r.getAs[Double]("p50_exact"),
        r.getAs[Double]("p75_exact"))).toMap
    graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("a25"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.75, 10000)").as("a75"))
      .collect().foreach { r =>
        val (e25, e50, e75) = exactDisc(r.getAs[String]("l_returnflag"))
        Seq((r.getDouble(1), e25), (r.getDouble(2), e50),
            (r.getDouble(3), e75)).foreach { case (a, e) =>
          assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact-disc $e")
        }
      }
  }

  test("join hints select the requested physical join") {
    import org.apache.spark.sql.functions._
    val l = graft.core.Tables.load(spark, dir, "lineitem")
    val o = graft.core.Tables.load(spark, dir, "orders")
    def planOf(hint: String): String =
      l.hint(hint).join(o, l("l_orderkey") === o("o_orderkey"))
        .queryExecution.executedPlan.toString
    assert(planOf("SHUFFLE_HASH").contains("ShuffledHashJoin"))
    assert(planOf("MERGE").contains("SortMergeJoin"))
    assert(planOf("BROADCAST").contains("BroadcastHashJoin"))
  }

  test("queries are deterministic across two runs") {
    import org.apache.spark.sql.functions.col
    Seq("q1_pricing_summary", "w2_metrics_10s", "sim1_cosine_topk",
      "tx4_fingerprint").foreach { q =>
      val a = SparkEntry.queries(q)(spark, dir)
      val cols = a.columns.sorted.map(col).toSeq
      val r1 = a.select(cols: _*).orderBy(cols: _*).collect().toSeq
      val r2 = SparkEntry.queries(q)(spark, dir)
        .select(cols: _*).orderBy(cols: _*).collect().toSeq
      assert(r1 == r2, s"$q not deterministic")
    }
  }
}
