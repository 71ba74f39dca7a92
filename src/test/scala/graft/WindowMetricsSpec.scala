package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WindowMetrics

/** W2 semantics (SURVEY.md §2.3): success/failure split, success-only
  * averages and min/max with 0-defaults, window boundary inclusivity. */
class WindowMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // (amount, exchangeRate, epochMillis)
  private def metrics(rows: Seq[(Double, Double, Long)]) = {
    val df = rows.toDF("amount", "rate", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    WindowMetrics.tumbling(df, $"ts", $"rate" =!= 0.0, $"amount", $"rate",
      "10 seconds")
      .orderBy("window_start")
      .collect()
      .map(r => (r.getAs[Long]("window_start"), r.getAs[Long]("cnt"),
        r.getAs[Long]("success_cnt"), r.getAs[Long]("failure_cnt"),
        r.getAs[Double]("avg_amount"), r.getAs[Double]("min_amount"),
        r.getAs[Double]("max_amount")))
  }

  test("mixed window: count = success + failure; averages over successes only") {
    val out = metrics(Seq((10.0, 1.0, 1000L), (20.0, 1.5, 2000L),
      (99.0, 0.0, 3000L)))
    assert(out.length == 1)
    val (ws, cnt, s, f, avg, mn, mx) = out.head
    assert(ws == 0L && cnt == 3L && s == 2L && f == 1L)
    assert(avg == 15.0 && mn == 10.0 && mx == 20.0)
  }

  test("all-failure window emits zeros, not MAX_VALUE sentinels (reference bug fixed)") {
    val out = metrics(Seq((5.0, 0.0, 1000L), (7.0, 0.0, 2000L)))
    val (_, cnt, s, f, avg, mn, mx) = out.head
    assert(cnt == 2L && s == 0L && f == 2L)
    assert(avg == 0.0 && mn == 0.0 && mx == 0.0)
  }

  test("window start inclusive, end exclusive at exact 10 s boundary") {
    val out = metrics(Seq((1.0, 1.0, 9999L), (2.0, 1.0, 10000L)))
    assert(out.map(_._1).toSeq == Seq(0L, 10000L))
    assert(out.forall(_._2 == 1L))
  }

  test("single-event window") {
    val out = metrics(Seq((3.25, 0.92, 25000L)))
    val (ws, cnt, s, f, avg, mn, mx) = out.head
    assert(ws == 20000L && cnt == 1L && s == 1L && f == 0L)
    assert(avg == 3.25 && mn == 3.25 && mx == 3.25)
  }

  test("keyed generalization partitions by key within the same windows") {
    val df = Seq(("a", 1.0, 1.0, 1000L), ("b", 2.0, 1.0, 2000L),
      ("a", 3.0, 0.0, 3000L)).toDF("k", "amount", "rate", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val out = WindowMetrics.tumbling(df, $"ts", $"rate" =!= 0.0, $"amount",
      $"rate", "10 seconds", Seq($"k")).collect()
    assert(out.length == 2)
    val byKey = out.map(r => r.getAs[String]("k") ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("failure_cnt"))).toMap
    assert(byKey("a") == (2L, 1L) && byKey("b") == (1L, 0L))
  }

  test("partition-invariance: same result at any parallelism") {
    val base = (1L to 200L).map(i =>
      (i * 1.5, if (i % 6 == 0) 0.0 else 1.0, i * 777L))
    val df13 = base.toDF("amount", "rate", "ts_ms").repartition(13)
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val df1 = base.toDF("amount", "rate", "ts_ms").coalesce(1)
      .withColumn("ts", timestamp_millis($"ts_ms"))
    def run(df: org.apache.spark.sql.DataFrame) =
      WindowMetrics.tumbling(df, $"ts", $"rate" =!= 0.0, $"amount", $"rate",
        "10 seconds").orderBy("window_start").collect().toSeq
    assert(run(df13) == run(df1))
  }

  test("invariants hold on randomized inputs across seeds") {
    for (seed <- Seq(1, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(500)((rnd.nextDouble() * 1000,
        if (rnd.nextInt(6) == 0) 0.0 else rnd.nextDouble() * 150,
        math.abs(rnd.nextLong() % 600000L)))
      metrics(rows).foreach { case (_, cnt, s, f, avg, mn, mx) =>
        assert(s + f == cnt)
        // sumExact rounds each addend at 6dp -> avg within 1e-5 of bounds
        if (s > 0) assert(mn <= avg + 1e-5 && avg <= mx + 1e-5)
        else assert(avg == 0.0 && mn == 0.0 && mx == 0.0)
      }
    }
  }
}

