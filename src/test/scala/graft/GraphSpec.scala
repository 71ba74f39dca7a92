package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Planted-graph checks for the graph operators (the fixture-scale
  * oracle gate covers gr1/gr2 end-to-end; these pin the algorithmic
  * invariants on graphs small enough to verify by hand). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def edgeDf(pairs: (Long, Long)*) =
    pairs.toDF("s1", "s2")

  test("triangleStats: triangle + pendant edge, counted by hand") {
    // K3 on {1,2,3} plus pendant 1-4: degs 3,2,2,1 → wedges 3+1+1+0 = 5,
    // one triangle, clustering 3·1/5 = 0.6
    val out = Graph.triangleStats(edgeDf((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
      .collect().head
    assert(out.getAs[Long]("n_nodes") === 4L)
    assert(out.getAs[Long]("n_edges") === 4L)
    assert(out.getAs[Long]("n_wedges") === 5L)
    assert(out.getAs[Long]("n_triangles") === 1L)
    assert(out.getAs[Double]("clustering") === 0.6)
  }

  test("triangleStatsServed: the durable oriented base serves the " +
      "identical row as the direct computation") {
    // a graph with asymmetric degrees and two triangles sharing an edge,
    // so orientation, wedge join, and clustering all do real work
    val edges = edgeDf((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (1L, 5L), (5L, 6L))
    val tmp = java.nio.file.Files.createTempDirectory("tri-base").toString
    Graph.buildTriangleBase(edges, tmp)
    val direct = Graph.triangleStats(edges).collect().toSeq
    val served = Graph.triangleStatsServed(spark, tmp).collect().toSeq
    assert(served === direct)
    // meta froze the exact wedge work the direct guard would compute
    assert(graft.queries.TriangleBase.wedgeWork(spark, tmp) ===
      Graph.orientedWedgeWork(edges))
  }

  test("triangleStatsServed: empty base serves zero counts, " +
      "NULL clustering — same as direct") {
    val tmp = java.nio.file.Files.createTempDirectory("tri-base-e").toString
    Graph.buildTriangleBase(edgeDf(), tmp)
    val served = Graph.triangleStatsServed(spark, tmp).collect().head
    assert(served.getAs[Long]("n_triangles") === 0L)
    assert(served.isNullAt(served.fieldIndex("clustering")))
  }

  test("gr6 Doulion estimate: exactly t/p^3 of the sampled count, and " +
      "within 20% of the exact count on the deterministic fixture") {
    // the sample is hash-deterministic, so the fixture error is a pin,
    // not a statistical assertion: measured +15.1% at sf0.001 (and
    // -11.1% at sf0.01) — a drift past 20% means the sampling rule or
    // the estimator changed, not bad luck. At sf1.0 (the 10× replica,
    // measured r12 at the 9a45a83 code): est 1.9002e7 vs exact
    // 18,844,880 → +0.83% — the estimator CONCENTRATES with scale
    // (Doulion's variance shrinks as the sampled triangle count t
    // grows; t=19,002 here vs 368 at sf0.01), which is exactly why it
    // is the named 100 TB path while the fixture-scale pins above stay
    // loose
    val dir = "/root/testdata/sf0.001"
    val g6 = graft.queries.GraphQueries
      .queries("gr6_triangles_sampled")(spark, dir).collect().head
    val exact = graft.queries.GraphQueries
      .queries("gr2_triangles")(spark, dir).collect().head
      .getAs[Long]("n_triangles")
    val t = g6.getAs[Long]("n_triangles_sampled")
    val est = g6.getAs[Double]("est_triangles")
    assert(est == t.toDouble * 1000.0, "estimator must be exactly t/p^3")
    val rel = math.abs(est - exact.toDouble) / exact.toDouble
    assert(rel < 0.2, f"sampled estimate off by $rel%.3f (>20%%)")
  }

  test("gr5 serves from the durable baskets artifact: row-identical to " +
      "the raw rebuild, and the timed plan carries no collect_set") {
    val dir = "/root/testdata/sf0.001"
    val served = graft.queries.GraphQueries
      .queries("gr5_capped_edges")(spark, dir)
    val raw = Graph.cappedBasketPairs(
      graft.core.Tables.load(spark, dir, "lineitem"),
      "l_orderkey", "l_partkey", cap = 4)
    assert(served.collect().toSet === raw.collect().toSet)
    // the collect_set shuffle must be prewarm's cost, not the query's
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"),
      "gr5's timed plan re-derives baskets instead of scanning the artifact")
  }

  test("triangleStats: empty edge list yields zero counts, NULL clustering") {
    val out = Graph.triangleStats(edgeDf()).collect().head
    assert(out.getAs[Long]("n_nodes") === 0L &&
      out.getAs[Long]("n_edges") === 0L &&
      out.getAs[Long]("n_triangles") === 0L)
    assert(out.isNullAt(out.fieldIndex("clustering")))
  }

  test("triangleStats: wedge-free graph (single edge) has NULL clustering") {
    val out = Graph.triangleStats(edgeDf((1L, 2L))).collect().head
    assert(out.getAs[Long]("n_wedges") === 0L)
    assert(out.isNullAt(out.fieldIndex("clustering")),
      "0 wedges must yield NULL, not NaN — NaN is not oracle-portable")
  }

  test("triangleStats: star graph has wedges but zero triangles") {
    val out = Graph.triangleStats(edgeDf((1L, 2L), (1L, 3L), (1L, 4L)))
      .collect().head
    assert(out.getAs[Long]("n_wedges") === 3L)
    assert(out.getAs[Long]("n_triangles") === 0L)
  }

  test("triangleStats: wedge budget trips on a dense projection, " +
      "default budget changes nothing") {
    // K8: 28 edges, oriented wedge work Σ out·in > 0 — a budget of 1
    // must refuse up front rather than enumerate
    val k8 = (for { a <- 1L to 8L; b <- (a + 1) to 8L } yield (a, b))
    val e = intercept[IllegalArgumentException] {
      Graph.triangleStats(edgeDf(k8: _*), maxOrientedWedges = 1L).collect()
    }
    assert(e.getMessage.contains("wedge count"))
    // and under the default budget the same graph counts exactly: K8 has
    // C(8,3)=56 triangles, clustering 1.0
    val ok = Graph.triangleStats(edgeDf(k8: _*)).collect().head
    assert(ok.getAs[Long]("n_triangles") === 56L)
    assert(ok.getAs[Double]("clustering") === 1.0)
  }

  test("cappedBasketPairs: a hub order that trips the wedge guard " +
      "uncapped runs green under the cap, flagged") {
    // one pathological 60-item basket (a K60 projection: 1770 edges,
    // oriented wedge work ~34k) + two small clean baskets
    val hub = (1L to 60L).map(p => (9999L, p))
    val small = Seq((1L, 101L), (1L, 102L), (2L, 102L), (2L, 103L))
    val df = (hub ++ small).toDF("ok", "pk")
    // with a cap so large nothing is capped, the build matches the
    // uncapped projection — and the guard refuses it at this budget
    val uncapped = Graph.cappedBasketPairs(df, "ok", "pk", cap = 1000)
    assert(uncapped.filter(col("from_capped")).count() == 0)
    val e = intercept[IllegalArgumentException] {
      Graph.triangleStats(
        uncapped.select(col("a").as("s1"), col("b").as("s2")),
        maxOrientedWedges = 5000L).collect()
    }
    assert(e.getMessage.contains("cap per-key set size"))
    // capped at 8: the hub contributes a K8 (28 edges, flagged), the
    // clean baskets pass through EXACTLY (not flagged), and the same
    // budget now succeeds with the K8's 56 triangles
    val capped = Graph.cappedBasketPairs(df, "ok", "pk", cap = 8)
    val hubRows = capped.filter(col("a") <= 60L).collect()
    assert(hubRows.length == 28 &&
      hubRows.forall(_.getAs[Boolean]("from_capped")))
    val cleanRows = capped.filter(col("a") >= 101L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_ab"), r.getAs[Boolean]("from_capped"))).toSet
    assert(cleanRows == Set((101L, 102L, 1L, false),
      (102L, 103L, 1L, false)))
    val ok = Graph.triangleStats(
      capped.select(col("a").as("s1"), col("b").as("s2")),
      maxOrientedWedges = 5000L).collect().head
    assert(ok.getAs[Long]("n_triangles") === 56L)
  }

  test("triangleStatsAuto: healthy graph is exact with degraded=false; " +
      "over-budget graph degrades to the capped build instead of refusing") {
    // same fixture as the guard test: one 60-item hub basket + two small
    val hub = (1L to 60L).map(p => (9999L, p))
    val small = Seq((1L, 101L), (1L, 102L), (2L, 102L), (2L, 103L))
    val df = (hub ++ small).toDF("ok", "pk")
    val exact = Graph.cappedBasketPairs(df, "ok", "pk", cap = 1000)
      .select(col("a").as("s1"), col("b").as("s2"))
    // budget generous → identical numbers to triangleStats + degraded=false
    val want = Graph.triangleStats(exact).collect().head
    val got = Graph.triangleStatsAuto(exact, df, "ok", "pk", cap = 8)
      .collect().head
    assert(!got.getAs[Boolean]("degraded"))
    Seq("n_nodes", "n_edges", "n_wedges", "n_triangles").foreach(c =>
      assert(got.getAs[Long](c) === want.getAs[Long](c), c))
    // budget 5000 refuses in triangleStats (pinned above) — Auto instead
    // returns the capped graph's stats, flagged: hub → K8 (28 edges, 56
    // triangles) + the two clean pairs (2 edges, still wedge at 102)
    val deg = Graph.triangleStatsAuto(exact, df, "ok", "pk", cap = 8,
      maxOrientedWedges = 5000L).collect().head
    assert(deg.getAs[Boolean]("degraded"))
    val capWant = Graph.triangleStats(
      Graph.cappedBasketPairs(df, "ok", "pk", cap = 8)
        .select(col("a").as("s1"), col("b").as("s2"))).collect().head
    Seq("n_nodes", "n_edges", "n_wedges", "n_triangles").foreach(c =>
      assert(deg.getAs[Long](c) === capWant.getAs[Long](c), c))
    assert(deg.getAs[Long]("n_triangles") === 56L)
  }

  test("orientedWedgeWork: hand-counted on the triangle + pendant") {
    // K3 {1,2,3} + pendant 1-4; degrees 1:3, 2:2, 3:2, 4:1. (degree,id)
    // orientation: 2→1, 3→1, 2→3, 4→1. Only node 3 has both an incoming
    // (2→3) and an outgoing (3→1) edge, so the wedge join materializes
    // exactly ONE candidate path (2→3→1 — the triangle's single
    // oriented wedge): Σ out(v)·in(v) = 1.
    val w = Graph.orientedWedgeWork(
      edgeDf((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
    assert(w === 1L)
  }

  test("cappedBasketPairs: cap larger than every basket is the " +
      "identity on pair counts") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
      (3L, 9L)).toDF("ok", "pk")
    val rows = Graph.cappedBasketPairs(df, "ok", "pk", cap = 16)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_ab"), r.getAs[Boolean]("from_capped"))).toSet
    assert(rows == Set((1L, 2L, 1L, false), (1L, 3L, 1L, false),
      (2L, 3L, 2L, false)))
  }

  test("pagerank: star graph — hub dominates, leaves symmetric, " +
       "single round matches the closed form bit-for-bit") {
    val edges = edgeDf((1L, 2L), (1L, 3L), (1L, 4L))
      .select(col("s1").as("src"), col("s2").as("dst"))
    val r1 = Graph.pagerank(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hub: three leaves each contribute 1000000 div 1 micros →
    // 150000 + (85·3000000) div 100 = 2700000 micros
    assert(r1(1L) === 2.7)
    // leaf: hub contributes 1000000 div 3 = 333333 micros →
    // 150000 + (85·333333) div 100 = 433333 micros
    assert(r1(2L) === 433333.0 / 1e6)
    assert(r1(2L) === r1(3L) && r1(3L) === r1(4L))
    val r5 = Graph.pagerank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r5(1L) > r5(2L) && r5.values.forall(_ >= 0.15))
    assert(r5(2L) === r5(3L) && r5(3L) === r5(4L))
  }

  test("pagerank: result is partitioning-invariant (bit-identical)") {
    val base = edgeDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .select(col("s1").as("src"), col("s2").as("dst"))
    def run(parts: Int) =
      Graph.pagerank(base.repartition(parts), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(1) === run(7))
  }

  test("pagerank: broadcast gate OFF (co-partitioned sort-merge rounds) " +
      "iterates bit-identically to the broadcast path") {
    // a less symmetric graph than the star so a regime divergence can't
    // hide behind structural symmetry; broadcastNodeLimit = 0 forces
    // EVERY round through the cluster path (src-partitioned edge copy,
    // ranks exchanged on node, merge join) — the integer recurrence
    // must not care which plan executes it
    val base = edgeDf((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
        (5L, 1L), (2L, 5L))
      .select(col("s1").as("src"), col("s2").as("dst"))
    def run(limit: Long) =
      Graph.pagerank(base, iters = 4, broadcastNodeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gateOn = run(50000000L)
    val gateOff = run(0L)
    assert(gateOn === gateOff)
    assert(gateOn.size == 5)
  }

  test("kcore: 2-core strips the tail, keeps the cycle, hand-checked") {
    // triangle 1-2-3 plus a tail 3-4-5: the 2-core is exactly the
    // triangle (4 and 5 peel in two cascading rounds), and every core
    // node has in-core degree 2.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Graph.kcore(edges, k = 2, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: refuses loudly when the peel has not reached fixpoint") {
    // a 12-node path at k=2 peels one node per end per round — far
    // from converged after 2 rounds; the require must fire rather than
    // emit a non-core frame.
    val path = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      Graph.kcore(path, k = 2, rounds = 2).collect()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }
}
