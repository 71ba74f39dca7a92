package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** BM25 ranking properties on a planted corpus (value correctness is the
  * bounded DuckDB oracle's job; these pin the ranking semantics). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry date"),
    (2L, "apple apple apple apple apple apple apple apple"),
    (3L, "banana cherry date elderberry fig grape"),
    (4L, "zebra yak xerus walrus"),
    (5L, "apple zebra banana yak cherry")).toDF("doc_id", "text")

  private def run(qs: Seq[(Long, String)], k: Int = 5) =
    Retrieval.bm25TopK(docs, "doc_id", "text",
        qs.toDF("qid", "qtext"), "qid", "qtext", k)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("score"))).toMap

  test("multi-term match outranks single-term spam; n_hit counts matched terms") {
    val out = run(Seq((100L, "apple banana cherry")))
    // doc 1 matches all three query terms; doc 2 has apple 8 times but
    // only one term — tf saturation (k1) keeps it below the 3-hit docs
    assert(out((100L, 1L))._1 == 1L)
    assert(out((100L, 1L))._2 == 3L)
    val doc2 = out.values.find(_._1 == 2L).get
    assert(doc2._2 == 1L && doc2._3 < out((100L, 1L))._3)
    // every matching doc appears (4 of 5 contain some query term)
    assert(out.size == 4)
  }

  test("rare terms dominate: a zebra query prefers the short rare-term doc") {
    val out = run(Seq((200L, "zebra")))
    // zebra appears in docs 4 and 5; doc 4 is shorter → higher score
    assert(out((200L, 1L))._1 == 4L && out((200L, 2L))._1 == 5L)
    assert(out.size == 2)
  }

  test("k truncates and duplicate query terms count once") {
    val out = run(Seq((300L, "apple apple banana")), k = 2)
    assert(out.size == 2, "top-k must truncate to k rows")
    // n_hit counts DISTINCT matched query terms: doc 1 matches 2
    assert(out((300L, 1L))._1 == 1L && out((300L, 1L))._2 == 2L)
  }
}
