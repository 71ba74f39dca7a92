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

  test("approx_count_distinct within 10% of exact") {
    val rows = SparkEntry.queries("q21_approx_distinct")(spark, dir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }

  test("approx_percentile within 2% of exact percentile") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q45_approx_percentile")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val exact = graft.core.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("e25"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.75)").as("e75"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("e25"), r.getAs[Double]("e50"), r.getAs[Double]("e75"))).toMap
    exact.foreach { case (k, (e25, e50, e75)) =>
      val (a25, a50, a75) = approx(k)
      Seq((a25, e25), (a50, e50), (a75, e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.02, s"$k approx $a vs exact $e") }
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
