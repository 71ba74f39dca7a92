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

  test("rrf fusion: both-list docs beat single-list, missing lists fuse") {
    import spark.implicits._
    val sparse = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 30L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 11L, 1L), (1L, 12L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = graft.operators.Retrieval.rrfFuse(sparse, dense)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id")) ->
        ((r.getAs[Double]("rrf"), r.getAs[Long]("fused_rank")))).toMap
    // doc 11 on BOTH lists: 1/62 + 1/61 beats doc 10's 1/61 alone
    assert(out((1L, 11L)) == ((1.0 / 62 + 1.0 / 61, 1L)))
    assert(out((1L, 10L)) == ((1.0 / 61, 2L)))
    assert(out((1L, 12L)) == ((1.0 / 62, 3L)))
    // query 2 has no dense list at all — sparse-only fusion survives
    assert(out((2L, 30L)) == ((1.0 / 61, 1L)))
  }

  test("sim25 ranking-quality gate: fusion beats each single list on " +
      "the planted two-channel relevance (VERDICT r13 #2)") {
    // PLANS_r14 §sim25: each retriever sees only one relevance channel
    // (term depth vs the semantic cos ≥ 0.35 bonus), so neither single
    // list can saturate, and RRF is graded on surfacing the docs both
    // channels endorse — the Cormack, Clarke & Buettcher claim. Runs at
    // sf0.01 (10 queries): at sf0.001 there is ONE query and the "mean"
    // is that query's noise (probed: fused < sparse there — a
    // single-sample artifact, not a fusion property). Probed sf0.01
    // means: sparse 0.7258, dense 0.7922, fused 0.8153; the pin asserts
    // the ORDER (fused ≥ both) plus sane bounds, not the exact values.
    val out = SparkEntry.queries("sim25_retrieval_ndcg")(
      spark, "/root/testdata/sf0.01").collect()
    val mean = out.find(_.isNullAt(0))
      .getOrElse(fail("no rollup mean row"))
    val (s, d, f) = (mean.getAs[Double]("ndcg_sparse"),
      mean.getAs[Double]("ndcg_dense"), mean.getAs[Double]("ndcg_fused"))
    assert(f >= s && f >= d,
      s"fusion below a single list: sparse=$s dense=$d fused=$f")
    assert(s > 0.3 && s < 1.0, s"sparse mean out of band: $s")
    assert(f > 0.5 && f <= 1.0, s"fused mean out of band: $f")
    // per-query rows are a valid nDCG (in [0,1]) and none of the
    // queries lost its relevance set (no zero-IDCG collapse)
    val perQ = out.filterNot(_.isNullAt(0))
    assert(perQ.nonEmpty)
    Seq("ndcg_sparse", "ndcg_dense", "ndcg_fused").foreach { c =>
      assert(perQ.forall(r => {
        val v = r.getAs[Double](c); v >= 0.0 && v <= 1.0
      }), s"$c out of [0,1]")
    }
    assert(perQ.exists(_.getAs[Double]("ndcg_fused") > 0.0))
  }

  test("sim26 index-served stack: sparse leg identical to sim25's, " +
      "indexed dense within the measured band of brute, fused within " +
      "a small band of sparse (VERDICT r14 #1)") {
    // PLANS_r15 §sim26: probed BEFORE the oracle — indexed/brute dense
    // ratio 0.68 (sf0.01) / 0.72 (sf0.1), and "fused ≥ best single"
    // was FALSIFIED for the indexed stack at both sfs (fusing with the
    // quantization-degraded leg drags the hybrid slightly below sparse
    // alone), so that pin is deliberately absent here. The bands pin
    // the measured regime without freezing exact values.
    val dir = "/root/testdata/sf0.01"
    def meanOf(key: String) =
      SparkEntry.queries(key)(spark, dir).collect()
        .find(_.isNullAt(0)).getOrElse(fail(s"$key: no rollup mean row"))
    val m25 = meanOf("sim25_retrieval_ndcg")
    val m26 = meanOf("sim26_indexed_retrieval_ndcg")
    // (a) the sparse leg is THE SAME list — its mean must be bit-equal
    assert(m26.getAs[Double]("ndcg_sparse") ==
      m25.getAs[Double]("ndcg_sparse"),
      "sim26's sparse leg diverged from sim25's")
    // (b) the indexed leg pays a real, BOUNDED quality cost vs brute:
    // well above the floor (the index does retrieve signal) and below
    // brute (the cost is real — if this ever exceeds brute, the
    // measured story in sim14/sim26's comments needs rewriting)
    val brute = m25.getAs[Double]("ndcg_dense")
    val idx = m26.getAs[Double]("ndcg_indexed")
    assert(idx >= 0.4 * brute && idx <= brute,
      s"indexed dense out of the measured band: indexed=$idx brute=$brute")
    // (c) fusion with the indexed leg stays within a small band of
    // sparse alone (probed 0.673 vs 0.726): a collapse would mean the
    // RRF wiring broke, not just the dense leg's quality
    val s26 = m26.getAs[Double]("ndcg_sparse")
    val f26 = m26.getAs[Double]("ndcg_fused")
    assert(f26 >= 0.8 * s26 && f26 <= 1.0,
      s"indexed-stack fusion out of band: fused=$f26 sparse=$s26")
  }
}
