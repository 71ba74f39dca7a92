package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003: ±1 sign
  * matrices preserve pairwise distances like Gaussian ones) — the
  * dimension-reduction pass in front of ANN indexing / clustering when
  * the embedding dim is the cost driver: distances survive within
  * 1 ± ε at m = O(ln N / ε²) output dims, and the projection is a
  * zero-shuffle narrow map.
  *
  * The sign matrix is DERIVED, not stored: s(j,i) = parity of the
  * engine-portable [[graft.functions.PortableHash]] of "jl:j:i",
  * materialized ONCE driver-side into literal arrays (m·d values — KB
  * scale at any corpus size) and inlined into both the Spark plan and
  * the DuckDB twin. No hash evaluates per row, no matrix rides the
  * shuffle, and any executor/engine rebuilds the identical matrix from
  * the seed string alone. Each output coordinate is a SEQUENTIAL
  * left-fold over the input dims (the dotSeq contract), so the emitted
  * doubles are bit-identical across engines.
  */
object RandomProjection {

  /** ±1.0 from the portable hash parity of "jl:j:i". */
  def sign(j: Int, i: Int): Double =
    if ((graft.functions.PortableHash.hash60Java(
      s"jl:$j:$i".getBytes("UTF-8")) & 1L) == 0L) 1.0 else -1.0

  /** Project `vecCol` (array<float/double>, length d) to m dims
    * y0..y{m-1}, scaled by 1/√m — the normalization the JL guarantee is
    * stated for (E‖y_a − y_b‖² = ‖x_a − x_b‖²; without it projected
    * squared distances inflate by a factor of m and any absolute
    * distance threshold calibrated in the original space is wrong).
    * Both engines derive the factor as sqrt of the same exact integer
    * (IEEE-correctly-rounded in each), so outputs stay bit-identical. */
  def project(df: DataFrame, idCol: String, vecCol: String,
              d: Int, m: Int): DataFrame = {
    val projCols: Seq[Column] = (0 until m).map { j =>
      val signs = array((0 until d).map(i => lit(sign(j, i))): _*)
      (aggregate(
        zip_with(col(vecCol), signs, (x, sg) => x.cast("double") * sg),
        lit(0.0), (acc, v) => acc + v) / sqrt(lit(m.toDouble))).as(s"y$j")
    }
    df.select(col(idCol) +: projCols: _*)
  }

  /** DuckDB twin of [[project]] over the `embeddings` table. */
  def projectSql(d: Int, m: Int): String = {
    val cols = (0 until m).map { j =>
      val lits = (0 until d)
        .map(i => if (sign(j, i) > 0) "1.0" else "-1.0").mkString(", ")
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(generate_series(1, $d),
         |      i -> CAST(embedding[i] AS DOUBLE) * ([$lits])[i])),
         |    (acc, x) -> acc + x) / sqrt(CAST($m AS DOUBLE)) AS y$j""".stripMargin
    }
    s"SELECT vec_id,\n  ${cols.mkString(",\n  ")}\nFROM embeddings"
  }
}
