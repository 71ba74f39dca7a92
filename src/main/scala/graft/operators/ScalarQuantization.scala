package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactNum

/** Int8 SCALAR quantization of an embedding corpus — the other standard
  * vector-memory reduction next to PQ ([[ProductQuantization]]): store
  * one byte per dimension against a per-dimension affine (min, max)
  * grid. 4× smaller than float32 with near-lossless recall for
  * well-conditioned embeddings; vector stores ship exactly this as
  * "int8/SQ8" alongside PQ, and the reconstruction-error profile this
  * operator emits is the go/no-go diagnostic for enabling it.
  *
  * code(x, d) = clamp(⌊(x − min_d)·255/(max_d − min_d) + 0.5⌉, 0, 255)
  * (floor(+0.5) nearest-grid rounding — Math.floor is IEEE-portable,
  * unlike any decimal-rounding convention); degenerate dims
  * (max = min) quantize to 0 and reconstruct min exactly.
  *
  * Output per dimension: count, grid bounds, saturated-code count
  * (codes at 0/255 — the clipping diagnostic) and the mean/max absolute
  * reconstruction error (mean decimal-exact via [[ExactNum]]; max is an
  * exact double comparison). max_abs_err ≤ (max−min)/510 + ε by
  * construction — SimilaritySpec pins it.
  *
  * Scale shape: one explode → per-dim min/max agg (d keys, map-side
  * partials ⇒ the shuffle carries d·partitions rows), d-row broadcast
  * back, one more d-key agg for the error profile. The corpus never
  * shuffles; both aggregate frames are dimension-sized at any N.
  */
object ScalarQuantization {

  /** (dim, code) quantization of one value against its dim's grid. */
  private def code(x: Column, vmin: Column, vmax: Column): Column =
    when(vmax === vmin, lit(0L)).otherwise(
      greatest(least(floor((x - vmin) * lit(255.0) / (vmax - vmin)
        + lit(0.5)), lit(255.0)), lit(0.0)).cast("long"))

  private def dequant(q: Column, vmin: Column, vmax: Column): Column =
    when(vmax === vmin, vmin)
      .otherwise(vmin + q.cast("double") * (vmax - vmin) / lit(255.0))

  /** Per-dimension quantization-error profile (see class doc). */
  def int8Stats(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ex = vecs.select(col(idCol).as("_vid"),
        posexplode(col(vecCol)).as(Seq("pos0", "xf")))
      .select(col("_vid"), (col("pos0") + 1).cast("long").as("dim"),
        col("xf").cast("double").as("x"))
    val stats = ex.groupBy(col("dim"))
      .agg(min(col("x")).as("vmin"), max(col("x")).as("vmax"))
    val q = code(col("x"), col("vmin"), col("vmax"))
    val err = abs(dequant(q, col("vmin"), col("vmax")) - col("x"))
    ex.join(broadcast(stats), "dim")
      .select(col("dim"), col("vmin"), col("vmax"), col("x"),
        q.as("q"), err.as("err"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        max(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        sum((col("q") === 0L || col("q") === 255L).cast("long"))
          .as("n_saturated"),
        ExactNum.avgExact(col("err")).as("mean_abs_err"),
        max(col("err")).as("max_abs_err"))
  }

  /** The DuckDB twin of [[int8Stats]] over `embeddings(vec_id,
    * embedding)` — same explode, same grid/rounding AST, same
    * decimal-exact mean fold. */
  def int8StatsSql: String = {
    import graft.functions.ExactNum.avgExactSql
    val codeSql = "CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(greatest(least(floor((x - vmin) * 255.0 / (vmax - vmin) " +
      "+ 0.5), 255.0), 0.0) AS BIGINT) END"
    val deqSql = "CASE WHEN vmax = vmin THEN vmin ELSE " +
      "vmin + CAST(q AS DOUBLE) * (vmax - vmin) / 255.0 END"
    s"""WITH ex AS (
       |  SELECT vec_id AS _vid, CAST(i AS BIGINT) AS dim,
       |    CAST(embedding[i] AS DOUBLE) AS x
       |  FROM (SELECT vec_id, embedding,
       |          unnest(generate_series(1, len(embedding))) AS i
       |        FROM embeddings) p
       |), stats AS (
       |  SELECT dim, min(x) AS vmin, max(x) AS vmax
       |  FROM ex GROUP BY dim
       |), coded AS (
       |  SELECT ex.dim, vmin, vmax, x, $codeSql AS q
       |  FROM ex JOIN stats ON ex.dim = stats.dim
       |), errs AS (
       |  SELECT dim, vmin, vmax, q, abs(($deqSql) - x) AS err
       |  FROM coded
       |)
       |SELECT dim, count(*) AS n,
       |  max(vmin) AS vmin, max(vmax) AS vmax,
       |  CAST(sum(CASE WHEN q = 0 OR q = 255 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_saturated,
       |  ${avgExactSql("err")} AS mean_abs_err,
       |  max(err) AS max_abs_err
       |FROM errs GROUP BY dim""".stripMargin
  }
}
