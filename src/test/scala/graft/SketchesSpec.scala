package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Count-Min heavy hitters on a planted vocabulary large enough to
  * collide (the fixture corpus has ~31 distinct tokens — every bucket is
  * private there, so the sketch's defining behaviors need construction).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("CM estimate is never below exact; tight grid forces overcounts") {
    // 400 distinct tokens, zipf-ish: token i appears (401-i) times; a
    // 4x64 grid (256 counters for 400 tokens) must collide somewhere.
    val docs = (1 to 400).flatMap(i => Seq.fill(401 - i)(s"tok$i"))
      .grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val out = Sketches.tokenHeavyHitters(docs, "text", k = 30,
        depth = 4, width = 64)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_cm")))
    assert(out.length == 30)
    // top-30 by construction: tok1..tok30 (counts 400..371)
    assert(out.map(_._1).toSet == (1 to 30).map(i => s"tok$i").toSet)
    out.foreach { case (t, exact, cm) =>
      assert(cm >= exact, s"$t: cm $cm < exact $exact")
    }
    val exactByTok = out.map(t => t._1 -> t._2).toMap
    assert(exactByTok("tok1") == 400L && exactByTok("tok30") == 371L)
    // with 400 tokens in 256 counters per the pigeonhole SOME of the
    // top-30 must share all-private buckets with heavy mass only rarely;
    // do not demand a specific collision, but the grid-wide overcount
    // (sum cm - sum exact) must be observable on at least one token OR
    // every top token happened to dodge — accept either but verify the
    // sketch never undercounts (asserted above) and estimates are exact
    // for an uncontested singleton grid:
    val wide = Sketches.tokenHeavyHitters(docs, "text", k = 30,
        depth = 4, width = 65536)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("n_cm")))
    assert(wide.forall(t => t._2 == t._3),
      "65536-wide grid over 400 tokens should be collision-free")
  }

  test("streamed CM grid equals the batch grid over the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val texts = (1 to 120).map(i => s"tok${i % 17} tok${i % 5} shared")
    val mem = MemoryStream[String]
    val q = Sketches.streamingCmGrid(
        mem.toDF().withColumnRenamed("value", "text"), "text",
        depth = 4, width = 64)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cm_stream").start()
    try {
      // three micro-batches: state must accumulate across them
      texts.grouped(40).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("cm_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.streamingCmGrid(
        texts.toDF("text"), "text", depth = 4, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.size <= 4 * 64, "state exceeded the constant grid")
  }

  test("KMV distinct estimate: calibrated error, partition-invariant, " +
      "exact in the sparse regime") {
    // 3 groups with known distinct counts: g0 5000 keys, g1 800 keys
    // (both >> k: formula path), g2 9 keys (sparse path)
    val rows = (1 to 5000).map(i => ("g0", s"a$i")) ++
      (1 to 800).map(i => ("g1", s"b$i")) ++
      (1 to 9).map(i => ("g2", s"c$i")) ++
      (1 to 800).map(i => ("g1", s"b$i")) // duplicates must not matter
    val df = rows.toDF("grp", "key")
    val out = Sketches.kmvDistinct(df, col("grp"), col("key"), k = 64)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_kept"), r.getAs[Double]("est_distinct"))).toMap
    // k=64 ⇒ stderr ≈ 1/√62 ≈ 12.7%; 4σ bound keeps flake odds nil
    assert(math.abs(out("g0")._2 / 5000.0 - 1.0) < 0.5, out("g0"))
    assert(math.abs(out("g1")._2 / 800.0 - 1.0) < 0.5, out("g1"))
    assert(out("g0")._1 == 64L && out("g1")._1 == 64L)
    // sparse regime: all 9 hashes kept, estimate IS the exact count
    assert(out("g2") == ((9L, 9.0)))
    // the two-stage k-min selection must not depend on physical layout
    Seq(1, 7, 32).foreach { n =>
      val re = Sketches.kmvDistinct(df.repartition(n), col("grp"),
          col("key"), k = 64)
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
            r.getAs[Double]("est_distinct"))).toMap
      val base = Sketches.kmvDistinct(df, col("grp"), col("key"), k = 64)
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
            r.getAs[Double]("est_distinct"))).toMap
      assert(re == base, s"repartition($n) changed the sketch")
    }
  }

  test("KMV merge: k-min of unioned states equals the union's own sketch") {
    import org.apache.spark.sql.expressions.Window
    // overlapping key sets: merging the two 64-min STATES must give
    // exactly the sketch a fresh pass over A ∪ B would build — the
    // property that lets per-partition/per-day sketches combine without
    // revisiting data
    val a = (1 to 3000).map(i => ("A", s"x$i"))
    val b = (2000 to 4500).map(i => ("B", s"x$i"))
    val df = (a ++ b).toDF("grp", "key")
    val kept = Sketches.kMinHashes(df, col("grp"), col("key"), 64)
    val mergedState = kept.select(lit("u").as("grp"), col("h")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= 64).select(col("grp"), col("h"))
    val viaMerge = Sketches.kmvEstimate(mergedState, 64)
      .collect().map(r => (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
        r.getAs[Double]("est_distinct"))).head
    val direct = Sketches.kmvDistinct(
        df.select(lit("u").as("g"), col("key")), col("g"), col("key"), 64)
      .collect().map(r => (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
        r.getAs[Double]("est_distinct"))).head
    assert(viaMerge == direct)
    assert(math.abs(direct._3 / 4500.0 - 1.0) < 0.5, direct)
  }

  test("streaming KMV: drained stream's final sketch equals the batch " +
      "sketch over the same keys") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val rows = (1 to 3000).map(i => ("g0", s"a$i")) ++
      (1 to 40).map(i => ("g1", s"b$i")) ++
      (500 to 1500).map(i => ("g0", s"a$i")) // cross-batch repeats
    val mem = MemoryStream[(String, String)]
    val q = Sketches.streamingKmvDistinct(
        mem.toDF().toDF("grp", "key"), "grp", "key", k = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_stream").start()
    try {
      rows.grouped(700).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    // update mode: last row per group is the final sketch
    val streamed = spark.table("kmv_stream")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("n_kept").desc, col("h_k").asc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
          r.getAs[Double]("est_distinct"))).toMap
    val batch = Sketches.kmvDistinct(rows.toDF("grp", "key"),
        col("grp"), col("key"), k = 64)
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("h_k"),
          r.getAs[Double]("est_distinct"))).toMap
    assert(streamed == batch)
    assert(batch("g1")._1 == 40L) // sparse group: all hashes kept
  }

  test("streaming column stats merge exactly across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Option[Double], Long)]
    val q = Sketches.streamingColumnStats(
        mem.toDF().toDF("grp", "v", "key"), "grp", "v", "key", k = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("stats_stream").start()
    try {
      // batch 1: g1 values 5, null, 9 over keys 1..3
      mem.addData(Seq(("g1", Some(5.0), 1L), ("g1", None, 2L),
        ("g1", Some(9.0), 3L)))
      q.processAllAvailable()
      // batch 2: widen min AND max, repeat key 1 (ndv must not grow)
      mem.addData(Seq(("g1", Some(1.0), 1L), ("g1", Some(20.0), 4L),
        ("g2", Some(7.0), 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("stats_stream")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("n_rows").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Double]("vmin"), r.getAs[Double]("vmax"),
          r.getAs[Double]("est_distinct")))).toMap
    // sparse regime (< k distinct keys): the estimate IS the exact ndv
    assert(last("g1") == ((5L, 1L, 1.0, 20.0, 4.0)))
    assert(last("g2") == ((1L, 0L, 7.0, 7.0, 1.0)))
  }

  test("top-k tie-break is (count desc, token asc) and deterministic") {
    val docs = Seq("b b a a d c c", "d e").toDF("text")
    val out = Sketches.tokenHeavyHitters(docs, "text", k = 3)
      .orderBy(desc("n_exact"), asc("token"))
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("n_exact")))
    // counts: a=2 b=2 c=2 d=2 e=1 -> top3 by tie-break = a, b, c
    assert(out.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }
}
