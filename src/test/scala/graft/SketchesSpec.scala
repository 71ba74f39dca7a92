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

  test("top-k tie-break is (count desc, token asc) and deterministic") {
    val docs = Seq("b b a a d c c", "d e").toDF("text")
    val out = Sketches.tokenHeavyHitters(docs, "text", k = 3)
      .orderBy(desc("n_exact"), asc("token"))
      .collect().map(r => (r.getAs[String]("token"), r.getAs[Long]("n_exact")))
    // counts: a=2 b=2 c=2 d=2 e=1 -> top3 by tie-break = a, b, c
    assert(out.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }
}
