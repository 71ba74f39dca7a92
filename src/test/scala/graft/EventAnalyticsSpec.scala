package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Edge-case checks for the event-analytics queries (q63 funnel, q64
  * cohort retention, q65 session transitions) on PLANTED event logs —
  * the fixture-scale oracle gate proves engine parity; these pin the
  * SEMANTICS on sequences where the right answer is decidable by hand:
  * click-before-view must not count, physical row order must not
  * matter, the 30-minute gap must cut q65 transitions.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Writes a synthetic events table to a temp dir (the queries read
    * `<dir>/events.parquet` via Tables.load) and returns the dir. */
  private def eventsDir(rows: Seq[(Long, String, Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-events").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("ts_s").cast("long")))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q63 funnel: ordering semantics decide the stage, not row order") {
    // user 1: view@10 → click@20 → purchase@30  ⇒ stage 3
    // user 2: click@10 before view@20; click@30 after ⇒ stage 2 (the
    //         pre-view click must NOT count; no purchase)
    // user 3: purchase@5, view@10 — purchase precedes everything ⇒ stage 1
    // user 4: only clicks ⇒ stage 0 (no view, nothing counts)
    val rows = Seq[(Long, String, Long, String)](
      (1L, "10", 1L, "view"), (2L, "20", 1L, "click"),
      (3L, "30", 1L, "purchase"),
      (4L, "10", 2L, "click"), (5L, "20", 2L, "view"),
      (6L, "30", 2L, "click"),
      (7L, "5", 3L, "purchase"), (8L, "10", 3L, "view"),
      (9L, "10", 4L, "click"), (10L, "20", 4L, "click"))
      .map { case (id, s, u, t) => (id, s, u, t) }
    // shuffle physical order: the result may not depend on it
    val dir = eventsDir(scala.util.Random.shuffle(rows))
    val out = SparkEntry.queries("q63_funnel_stages")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("stage")).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("q64 cohort retention: offsets count distinct users per day") {
    // users 1,2 first active day 0; user 1 returns day 1 and day 2,
    // user 2 returns day 2. user 3 first active day 1, never returns.
    def at(day: Long, id: Long, u: Long) =
      (id, (day * 86400L).toString, u, "view")
    val dir = eventsDir(Seq(
      at(0, 1, 1), at(0, 2, 2), at(1, 3, 1), at(2, 4, 1), at(2, 5, 2),
      at(1, 6, 3)))
    val out = SparkEntry.queries("q64_cohort_retention")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cohort_day"),
        r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_active")).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 2L,
      (1L, 0L) -> 1L))
  }

  test("q65 transitions: session gap cuts, ties break on event_id") {
    // user 1: view@0 → click@60 (counted), then a 31-minute silence →
    // view@1920s NOT a transition from click; view@1920 → error@1980
    // counted. user 2: two events at the SAME second — event_id order
    // decides prev/next deterministically.
    val dir = eventsDir(Seq(
      (1L, "0", 1L, "view"), (2L, "60", 1L, "click"),
      (3L, "1920", 1L, "view"), (4L, "1980", 1L, "error"),
      (5L, "100", 2L, "signup"), (6L, "100", 2L, "purchase")))
    val out = SparkEntry.queries("q65_session_transitions")(spark, dir)
      .collect().map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("next_type")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Long]("sum_gap_ms")))
      .toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 60000L)),
      ("view", "error") -> ((1L, 60000L)),
      ("signup", "purchase") -> ((1L, 0L))))
  }

  /** Events dir variant with explicit values (q67 needs them). */
  private def eventsDirV(
      rows: Seq[(Long, String, Long, String, Double)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-events").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s").cast("long")))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q67 anomaly: flags vs own history only, after warmup, var>0") {
    // user 1: ten alternating 9/11 priors (mean 10, var 10/9), then 1000
    //   ⇒ flagged with z = 990/sqrt(10/9); a final normal 10 ⇒ not
    //   flagged (its z uses the updated history including the 1000).
    // user 2: only 10 events — the big value arrives at n_prior=9,
    //   inside the warmup ⇒ never flagged.
    // user 3: ten IDENTICAL priors then 1000 — zero variance baseline
    //   cannot be z-scored ⇒ excluded by the var>0 guard, not Inf/NaN.
    def ramp(u: Long, base: Long, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) =>
        (base + i, (10 * (i + 1)).toString, u, "view", v) }
    val alt = Seq.tabulate(10)(i => if (i % 2 == 0) 9.0 else 11.0)
    val rows = ramp(1L, 100L, alt ++ Seq(1000.0, 10.0)) ++
      ramp(2L, 200L, Seq.fill(9)(10.0) :+ 1000.0) ++
      ramp(3L, 300L, Seq.fill(10)(7.0) :+ 1000.0)
    val dir = eventsDirV(scala.util.Random.shuffle(rows))
    val out = SparkEntry.queries("q67_user_anomaly")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("event_id") == 110L &&
      r.getAs[Long]("user_id") == 1L &&
      r.getAs[Long]("n_prior") == 10L &&
      r.getAs[Double]("mean_prior") == 10.0 &&
      r.getAs[Double]("z") == 990.0 / math.sqrt(10.0 / 9.0))
  }
}
