package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.operators.Similarity

/** Planted-input semantics for the round-7 curation operators: the
  * oracle gate proves engine parity at fixture scale; these pin the
  * hand-decidable contracts — tx19's margin is exactly the sum of the
  * documented per-token weights, dd8 ties break to the smaller
  * benchmark id and sub-threshold corpus rows vanish, pl16 caps (not
  * scales) each cluster and ignores physical row order.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** tx19's documented weight contract, recomputed independently. */
  private def weight(tok: String): Long =
    (PortableHash.hash60Java(tok.getBytes("UTF-8")) % 4096) * 131 % 401 - 200

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-docs").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).cast("long")
          .as("n_chars"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("tx19 classifier: margin is the exact sum of token weights") {
    val dir = docsDir(Seq(
      (1L, "alpha alpha beta"), // repeated token counts twice
      (2L, ""),                 // zero tokens ⇒ margin 0, keep false
      (3L, "gamma")))
    val out = SparkEntry.queries("tx19_classifier")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("margin"),
          r.getAs[Boolean]("keep")))).toMap
    val m1 = 2 * weight("alpha") + weight("beta")
    val m3 = weight("gamma")
    assert(out(1L) == ((3L, m1, m1 > 0)))
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(3L) == ((1L, m3, m3 > 0)))
  }

  test("dd8 contamination: argmax per corpus vec, ties to smaller bench id") {
    def v(xs: Double*): Array[Float] =
      (xs.map(_.toFloat) ++ Array.fill(4 - xs.size)(0f)).toArray
    val bench = Seq((1L, v(1.0)), (2L, v(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, v(1.0)),            // cos 1.0 with bench 1
      (11L, v(0.8, 0.6)),       // cos 0.8 b1 / 0.6 b2 ⇒ argmax b1
      (12L, v(1.0, 1.0)),       // cos 1/√2 with BOTH ⇒ tie ⇒ b1
      (13L, v(0.0, 0.0, 1.0)))  // orthogonal ⇒ below any threshold
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticContamination(
        corpus, bench, "vec_id", "embedding", 0.7)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("bench_id"), r.getAs[Double]("cos_sim")))).toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L) == ((1L, 1.0)))
    // 0.8/0.6 are not exact float32s — the cos lands within float ulp
    assert(out(11L)._1 == 1L && math.abs(out(11L)._2 - 0.8) < 1e-6)
    assert(out(12L)._1 == 1L &&
      math.abs(out(12L)._2 - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("pl16 cluster cap: caps big clusters, keeps small ones whole") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-emb").toString
    val rows = (1L to 40L).map(i => (i, Array(i.toFloat), 0)) ++
      (100L to 102L).map(i => (i, Array(i.toFloat), 1))
    scala.util.Random.shuffle(rows).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("pl16_cluster_cap_sample")(spark, dir)
      .collect()
    val byLabel = out.groupBy(_.getAs[Int]("label"))
    assert(byLabel(0).length == 25 && byLabel(1).length == 3)
    assert(out.forall(_.getAs[Long]("rn") <= 25L))
    // the kept set is the hash-order prefix — recompute it independently
    val expect0 = (1L to 40L)
      .sortBy(i => (PortableHash.hash60Java(i.toString.getBytes), i))
      .take(25).toSet
    assert(byLabel(0).map(_.getAs[Long]("vec_id")).toSet == expect0)
  }
}
