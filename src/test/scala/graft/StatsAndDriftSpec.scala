package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Planted-input semantics for the stats/drift/curation queries added in
  * round 7b: tx20's OOV arithmetic counts occurrences (not distinct
  * tokens), pl17's winsorize bounds are exact rank order statistics read
  * off the value histogram, pl18's χ² completes the grid with
  * zero-observation cells, and q68's stats row survives NULLs.
  */
class StatsAndDriftSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("tx20 oov: occurrences counted, df>=20 vocab, 20% keep gate") {
    val dir = tmp("graft-oov")
    val base = (1L to 20L).map(i => (i, "common", "en", "s", 6L))
    val rows = base ++ Seq(
      (21L, "common rare rare rare rare rare", "en", "s", 31L),
      (22L, "common common common common rare", "en", "s", 31L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tx20_oov_rate")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("oov"),
          r.getAs[Boolean]("keep")))).toMap
    // df(common)=22 >= 20 in-vocab; df(rare)=2 out-of-vocab
    assert(out(1L) == ((1L, 0L, true)))
    assert(out(21L) == ((6L, 5L, false))) // 5*5=25 > 6 tokens
    assert(out(22L) == ((5L, 1L, true)))  // 1*5=5 <= 5 tokens
  }

  test("pl17 winsorize: histogram rank bounds, clip counts, exact sum") {
    val dir = tmp("graft-win")
    val rows = (1 to 100).map(v => ("A", v.toDouble)) ++
      (Seq.fill(9)(1.0) :+ 100.0).map(v => ("B", v))
    rows.toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("pl17_winsorize")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val a = out("A")
    // n=100: lo rank ceil(5)=5 -> p05=5; hi rank ceil(95)=95 -> p95=95
    assert(a.getAs[Double]("p05") == 5.0 && a.getAs[Double]("p95") == 95.0)
    assert(a.getAs[Long]("clipped_lo") == 4L &&
      a.getAs[Long]("clipped_hi") == 5L)
    // sum = (5+..+95) + 4*5 + 5*95
    assert(a.getAs[Double]("sum_winsorized") == (5 to 95).sum + 20 + 475.0)
    val b = out("B")
    // n=10, duplicated low value: lo rank 1 -> histogram cum(1)=9 >= 1
    assert(b.getAs[Double]("p05") == 1.0 &&
      b.getAs[Double]("p95") == 100.0)
    assert(b.getAs[Long]("clipped_lo") == 0L &&
      b.getAs[Long]("clipped_hi") == 0L)
    assert(b.getAs[Double]("sum_winsorized") == 109.0)
  }

  test("pl18 drift: chi-square with grid-completed zero cells") {
    val dir = tmp("graft-drift")
    def docs(src: String, lang: String, n: Int) =
      (1 to n).map(_ => (src, lang))
    val rows = docs("A", "en", 30) ++ docs("A", "de", 10) ++
      docs("B", "en", 10) ++ docs("B", "de", 30) ++ docs("C", "fr", 20)
    rows.zipWithIndex
      .map { case ((src, lang), i) => (i.toLong, "t", lang, src, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("pl18_source_drift")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("chi2")))).toMap
    // hand computation (N=100): A = 12.25 + 2.25 + 8 (missing fr cell)
    assert(out("A") == ((40L, 22.5)))
    assert(out("B") == ((40L, 22.5)))
    // C observed ONLY fr: zero cells contribute 8+8, fr cell 64
    assert(out("C") == ((20L, 80.0)))
  }

  test("sim13 covariance: hand-computed cov/corr, zero-mean dim") {
    val vecs = Seq(
      Array(1f, 2f, 0f), Array(2f, 4f, 1f), Array(3f, 6f, -1f))
      .toDF("embedding")
    val out = graft.operators.Similarity
      .covarianceMatrix(vecs, "embedding")
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        ((r.getAs[Double]("cov"), r.getAs[Double]("corr")))).toMap
    assert(out.size == 6) // upper triangle of d=3
    assert(out((0L, 0L)) == ((1.0, 1.0)))
    assert(out((1L, 1L)) == ((4.0, 1.0)))
    assert(out((2L, 2L)) == ((1.0, 1.0)))
    assert(out((0L, 1L)) == ((2.0, 1.0)))   // dim1 = 2·dim0 exactly
    assert(out((0L, 2L)) == ((-0.5, -0.5)))
    assert(out((1L, 2L)) == ((-1.0, -0.5)))
  }

  test("pc1: power iteration recovers the dominant direction") {
    val vecs = Seq((1L, Array(1f, 2f)), (2L, Array(2f, 4f)),
      (3L, Array(3f, 6f)), (4L, Array(-1f, -2f)))
      .toDF("vec_id", "embedding")
    val (pc, projected) = graft.operators.Similarity
      .topPrincipalComponent(vecs, "vec_id", "embedding")
    // rank-1 covariance: PC1 = (1,2)/√5 exactly
    val s5 = math.sqrt(5.0)
    assert(math.abs(pc(0) - 1.0 / s5) < 1e-12 &&
      math.abs(pc(1) - 2.0 / s5) < 1e-12)
    val scores = projected.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("pc1_score"))
      .toMap
    assert(math.abs(scores(1L) - 5.0 / s5) < 1e-9)  // (1,2)·(1,2)/√5
    assert(math.abs(scores(4L) + 5.0 / s5) < 1e-9)
  }

  test("q69 ewma: exact half-life weights by recency rank") {
    val dir = tmp("graft-ewma")
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    Seq(
      (1L, 1L, t(1), 10.0), (2L, 1L, t(2), 20.0), (3L, 1L, t(3), 40.0),
      (4L, 2L, t(9), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q69_ewma_user")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma"),
          r.getAs[Double]("last_value")))).toMap
    // user 1 by recency: 40·1 + 20·½ + 10·¼ = 52.5
    assert(out(1L) == ((3L, 52.5, 40.0)))
    assert(out(2L) == ((1L, 7.0, 7.0)))
  }

  test("q71 quantile normalize: shifted groups land on the same values") {
    val dir = tmp("graft-qnorm")
    val rows = (1 to 4).map(v => ("A", v.toDouble, v.toLong)) ++
      (1 to 4).map(v => ("B", 100.0 + v, 10L + v))
    rows.toDF("o_orderpriority", "o_totalprice", "o_orderkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q71_quantile_normalize")(spark, dir)
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("cnt"), r.getAs[Double]("sum_norm"),
          r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm")))).toMap
    // group ranks 1..4 → quantiles 0, ⅓, ⅔, 1 → global grid values
    // {1, 3, 101, 104} for BOTH groups — calibration erases the shift
    assert(out("A") == ((4L, 209.0, 1.0, 104.0)))
    assert(out("B") == out("A"))
  }

  test("q72 regression: exact slope/intercept on a planted line") {
    val dir = tmp("graft-reg")
    // absolute epoch millis (2024-01-01T00:00:00Z) — a Timestamp.valueOf
    // string would shift with the JVM default zone
    def t(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // y = 2x + 1 exactly; a second flat group y = 7
    val rows = Seq(
      (1L, 10L, t(0), 1.0, "up"), (2L, 10L, t(1), 3.0, "up"),
      (3L, 10L, t(2), 5.0, "up"),
      (4L, 11L, t(0), 7.0, "flat"), (5L, 11L, t(10), 7.0, "flat"))
    rows.toDF("event_id", "user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q72_group_regression")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("slope"),
          r.getAs[Double]("intercept")))).toMap
    assert(out("up") == ((3L, 2.0, 1.0)))
    assert(out("flat") == ((2L, 0.0, 7.0)))
  }

  test("q73 benford: integer-part digits, sub-1 excluded, zero cells") {
    val dir = tmp("graft-benford")
    def t0(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    // digits: 10→1, 1.5→1, 2.0→2, 30→3; 0.5 excluded (|v| < 1)
    val vals = Seq(10.0, 1.5, 2.0, 30.0, 0.5)
    vals.zipWithIndex
      .map { case (v, i) => (i.toLong, 1L, t0(i), v, "u") }
      .toDF("event_id", "user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q73_benford")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_amounts") == 4L)
    val p = (d: Int) => math.log(1.0 + 1.0 / d) / math.log(10.0)
    val obs = Map(1 -> 2.0, 2 -> 1.0, 3 -> 1.0)
    val expected = (1 to 9).map { d =>
      val e = 4.0 * p(d); val dev = obs.getOrElse(d, 0.0) - e
      // mirror the query's DECIMAL(28,6) per-term quantization
      BigDecimal(dev * dev / e).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-9)
  }

  test("q74 autocorr: planted alternating and monotone series") {
    val dir = tmp("graft-autocorr")
    def t0(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val alt = Seq(1.0, 2.0, 1.0, 2.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, 1L, t0(i), v, "alt") }
    val mono = Seq(1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => (10L + i, 2L, t0(i), v, "mono") }
    (alt ++ mono).toDF("event_id", "user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q74_lag_autocorr")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("r1")))).toMap
    assert(out("alt") == ((4L, -1.0)))   // perfect anticorrelation
    assert(out("mono") == ((2L, 1.0)))   // perfect momentum
  }

  test("q75 association rules: hand-computed support/confidence/lift") {
    val dir = tmp("graft-assoc")
    // baskets: {1,2} {1,2} {1,3} {2}; only pair (1,2) clears n_ab >= 2
    val rows = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 2L), (40L, 2L)) // dup line collapses
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q75_assoc_rules")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("n_ab") == 2L &&
      r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("confidence") == 2.0 / 3.0)
    assert(r.getAs[Double]("lift") == 2.0 * 4.0 / 9.0)
  }

  test("q77 rolling distinct: trailing window, cross-day dedup") {
    val dir = tmp("graft-roll")
    def d(day: Int, off: Int = 0) =
      new java.sql.Timestamp(1704067200000L + day * 86400000L + off * 1000L)
    // u2 active on day0 AND day3 (must dedup in day3's window);
    // day8's trailing window includes day3 but NOT day0
    val rows = Seq((1L, 1L, d(0)), (2L, 2L, d(0)), (3L, 2L, d(3)),
      (4L, 3L, d(8)))
    rows.zipWithIndex.map { case ((id, u, ts), i) =>
      (id, u, ts, 1.0, "view") }
      .toDF("event_id", "user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q77_rolling_distinct")(spark, dir)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("users_7d")).toMap
    assert(out == Map("2024-01-01" -> 2L, "2024-01-04" -> 2L,
      "2024-01-09" -> 2L))
  }

  test("q68 table stats: ndv, null counts, min/max in one pass") {
    val dir = tmp("graft-stats")
    val ts = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    Seq(
      (1L, 10L, "A", Some(5.0), ts),
      (1L, 11L, "R", Some(2.0), ts2),
      (2L, 10L, "A", None, ts),
      (3L, 12L, "N", Some(9.0), ts))
      .toDF("l_orderkey", "l_partkey", "l_returnflag", "l_quantity",
        "l_shipdate")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q68_table_stats")(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("orderkey_ndv") == 3L)
    assert(r.getAs[Long]("partkey_ndv") == 3L)
    assert(r.getAs[Long]("returnflag_ndv") == 3L)
    assert(r.getAs[Long]("quantity_nulls") == 1L)
    assert(r.getAs[Double]("quantity_min") == 2.0)
    assert(r.getAs[Double]("quantity_max") == 9.0)
    assert(r.getAs[java.sql.Timestamp]("shipdate_min") == ts)
    assert(r.getAs[java.sql.Timestamp]("shipdate_max") == ts2)
  }
}
