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
