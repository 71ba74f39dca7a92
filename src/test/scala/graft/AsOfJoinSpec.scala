package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of lookup semantics: at-or-before matching, equal-timestamp tie
  * resolves to the build row, no-prior-build yields null. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // (id, key, ts, kind, value)
  private val rows = Seq(
    (1L, "u1", 10L, "build", 100.0),
    (2L, "u1", 20L, "probe", 0.0),   // -> 100.0
    (3L, "u1", 30L, "build", 300.0),
    (4L, "u1", 30L, "probe", 0.0),   // equal ts: build wins -> 300.0
    (5L, "u1", 25L, "probe", 0.0),   // -> 100.0 (build@30 is later)
    (6L, "u2", 5L, "probe", 0.0),    // no prior build -> null
    (7L, "u2", 9L, "build", 900.0),
    (8L, "u2", 12L, "probe", 0.0))   // -> 900.0
    .toDF("id", "key", "ts_l", "kind", "value")
    .withColumn("ts", timestamp_millis($"ts_l"))

  test("at-or-before semantics with deterministic tie handling") {
    val out = AsOfJoin.asOfLookup(rows,
      isBuild = $"kind" === "build", key = $"key", ts = $"ts",
      value = $"value", tieBreak = $"id")
      .select($"id", $"asof_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(2L).contains(100.0))
    assert(out(4L).contains(300.0))
    assert(out(5L).contains(100.0))
    assert(out(6L).isEmpty)
    assert(out(8L).contains(900.0))
    assert(!out.contains(1L) && !out.contains(3L)) // build rows filtered out
  }
}
