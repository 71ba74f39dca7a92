package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ExactNum._
import graft.operators.Similarity

/** Similarity-search queries over `embeddings` (ArrayType(FloatType),
  * dim 64). Dot products fold in exact decimal (Similarity.dotExact) so
  * Spark and DuckDB produce bit-identical doubles — rankings, thresholds
  * and hash-compares all agree. The LSH ANN path is engine-native
  * (rows-only oracle) with recall asserted against brute force in
  * SimilaritySpec.
  */
object SimilarityQueries extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** DuckDB: exact decimal dot-product of two unnested float lists. */
  private def dotSql(a: String, b: String): String =
    s"CAST(sum(CAST(CAST($a AS DOUBLE) * CAST($b AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force cosine top-k (k=5) for a 20-query subset — the ANN
    // correctness baseline.
    "sim1_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      Similarity.cosineTopK(e, e.filter($"vec_id" < 20), "vec_id",
        "embedding", 5)
    }),

    // embedding-cosine near-duplicate pairs (threshold 0.45 — the fixture
    // corpus is random vectors with max pairwise cosine ≈ 0.51; production
    // near-dup would use ~0.95).
    "sim2_cosine_neardup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), "vec_id", "embedding", 0.45)),

    // per-label centroids (IVF coarse-quantizer build): exact mean per dim.
    "sim3_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(emb(s, dir), "label", "embedding")),

    // vector norms + norm stats per label (sanity surface for embeddings).
    "sim4_norms" -> ((s, dir) => {
      import s.implicits._
      emb(s, dir).select($"vec_id", $"label",
        Similarity.normExact($"embedding").as("l2_norm"))
    }),

    // LSH-bucketed ANN (engine-native signatures — rows-only oracle;
    // recall vs sim1 asserted in SimilaritySpec).
    "sim5_ann_lsh" -> ((s, dir) =>
      Similarity.annLsh(emb(s, dir), "vec_id", "embedding", dims = 64,
        planes = 16, bands = 4, threshold = 0.35)))

  private val normSql: String =
    s"""SELECT vec_id, sqrt(${dotSql("x", "x")}) AS nrm
       |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
       |  GROUP BY vec_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "sim1_cosine_topk" ->
      s"""WITH n AS ($normSql),
         |d AS (
         |  SELECT query_id, neighbor_id, ${dotSql("a", "b")} AS dot
         |  FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           unnest(q.embedding) AS a, unnest(c.embedding) AS b
         |    FROM embeddings q, embeddings c
         |    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
         |  ) z GROUP BY query_id, neighbor_id
         |), cos AS (
         |  SELECT query_id, neighbor_id,
         |         dot / (nq.nrm * nc.nrm) AS cos_sim
         |  FROM d JOIN n nq ON nq.vec_id = query_id
         |         JOIN n nc ON nc.vec_id = neighbor_id
         |)
         |SELECT query_id, neighbor_id, cos_sim, rank FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM cos) r
         |WHERE rank <= 5""".stripMargin,
    "sim2_cosine_neardup" ->
      s"""WITH n AS ($normSql),
         |d AS (
         |  SELECT id_a, id_b, ${dotSql("a", "b")} AS dot
         |  FROM (
         |    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |           unnest(x.embedding) AS a, unnest(y.embedding) AS b
         |    FROM embeddings x, embeddings y
         |    WHERE x.vec_id < y.vec_id
         |  ) z GROUP BY id_a, id_b
         |)
         |SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cos_sim
         |FROM d JOIN n na ON na.vec_id = id_a
         |       JOIN n nb ON nb.vec_id = id_b
         |WHERE dot / (na.nrm * nb.nrm) >= 0.45""".stripMargin,
    "sim3_label_centroids" ->
      s"""SELECT label, CAST(i AS BIGINT) AS dim,
         |  ${sumExactSql("CAST(embedding[i] AS DOUBLE)")} / count(embedding[i]) AS centroid,
         |  count(*) AS cnt
         |FROM (SELECT label, embedding,
         |        unnest(generate_series(1, len(embedding))) AS i
         |      FROM embeddings) p
         |GROUP BY label, i""".stripMargin,
    "sim4_norms" ->
      s"""SELECT e.vec_id, e.label, n.nrm AS l2_norm
         |FROM embeddings e JOIN ($normSql) n ON n.vec_id = e.vec_id""".stripMargin)
}
