package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{ExactNum, PortableHash}

/** Product quantization for ANN (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): split each vector into
  * `m` subvectors, learn a small per-subspace codebook with seeded
  * Lloyd's, encode every vector as `m` one-byte codes, and answer
  * queries with asymmetric distance computation (ADC) — a per-query
  * lookup table of exact subspace distances, summed over the stored
  * codes. The memory story at 100 TB: the scored corpus representation
  * is m bytes per vector instead of dims·4, and the scoring join moves
  * only (vec, sub, code) rows.
  *
  * Determinism (the whole pipeline is hash-match oracle-able — unlike
  * BM25/DSIR there is no transcendental in sight):
  *  - codebook init: subvectors of the `ks` docs with the smallest
  *    (hash60(id), id) — the sim9 seeding rule, shared across subspaces;
  *  - training/encode: per-subspace nearest codeword by ‖c‖² − 2x·c,
  *    both dots PER-ROW sequential folds against the broadcast codeword
  *    arrays (DuckDB list_reduce twin), min(struct(score, code)) argmin
  *    with smaller-code tiebreak; codeword update = per-(sub, code, dim)
  *    decimal-exact mean; FIXED iteration count;
  *  - ADC: lut(q, sub, code) = q_s·q_s − 2·q_s·c + ‖c‖² (per-row IEEE),
  *    per-(query, doc) sum over the m lut hits is decimal-exact.
  *
  * Scale shape: codebooks are m·ks·subDim doubles — driver round-trip +
  * broadcast per iteration (the Lloyd's loop discipline); training
  * assignment is a broadcast join + min(struct) hash agg over N·m·ks
  * narrow rows; the query-time scoring join is codes ⋈ broadcast(lut)
  * followed by one hash agg — the corpus never reships its floats.
  */
object ProductQuantization {

  /** ADC top-k: learn codebooks, encode the corpus, score `queries`.
    * Output: (query_id, neighbor_id, adc_dist, rank ≤ k) by
    * (adc_dist ASC, neighbor_id ASC), self-matches excluded. */
  def pqTopK(vecs: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dims: Int, m: Int, ks: Int, iters: Int,
             k: Int): DataFrame = {
    require(dims % m == 0 && ks >= 1 && iters >= 1 && k >= 1)
    val spark = vecs.sparkSession
    import spark.implicits._
    val subDim = dims / m
    def subvectors(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
          explode(sequence(lit(0), lit(m - 1))).as("subi"),
          col(vecCol).as("_v"))
        .select(col(as), col("subi").cast("long").as("sub"),
          slice(col("_v"), col("subi") * subDim + 1, lit(subDim)).as("sv"))
    val sub = subvectors(vecs, "_vid")
    val wSeed = Window.orderBy(
      PortableHash.hash60(col("_vid").cast("string")), col("_vid"))
    val seeds = vecs.select(col(idCol).as("_vid"))
      .withColumn("rn", row_number().over(wSeed))
      .filter(col("rn") <= ks)
      .select(col("_vid"), (col("rn") - 1).cast("long").as("code"))
    // codebook as driver-side (sub, code, c_arr) — m·ks·subDim doubles
    var cb: Seq[(Long, Long, Seq[Double])] = seeds.join(sub, "_vid")
      .select(col("sub"), col("code"),
        transform(col("sv"), x => x.cast("double")).as("c_arr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq))
      .toSeq
    def cbDf(rows: Seq[(Long, Long, Seq[Double])]): DataFrame =
      rows.toDF("sub", "code", "c_arr")
        .withColumn("c2", Similarity.dotSeqHof(col("c_arr"), col("c_arr")))
    def assign(cbRows: Seq[(Long, Long, Seq[Double])]): DataFrame =
      sub.join(broadcast(cbDf(cbRows)), "sub")
        .withColumn("_score", col("c2") -
          lit(2.0) * Similarity.dotSeqHof(col("sv"), col("c_arr")))
        .groupBy(col("_vid"), col("sub"))
        .agg(min(struct(col("_score"), col("code"))).as("_best"))
        .select(col("_vid"), col("sub"), col("_best.code").as("code"))
    for (it <- 1 to iters - 1) {
      cb = assign(cb)
        .join(sub, Seq("_vid", "sub"))
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos0", "xf")))
        .groupBy(col("sub"), col("code"),
          (col("pos0") + 1).cast("long").as("dim"))
        .agg(ExactNum.avgExact(col("xf").cast("double")).as("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(t => (t._1, t._2)).toSeq
        .map { case ((s, c), rs) => (s, c, rs.sortBy(_._3).map(_._4).toSeq) }
        .sortBy(t => (t._1, t._2))
    }
    // encode with the final codebook; codes are the stored representation
    val codes = assign(cb)
    // ADC lookup table: exact subspace distance from each query subvector
    // to each codeword
    val lut = subvectors(queries, "query_id")
      .join(broadcast(cbDf(cb)), "sub")
      .withColumn("qq", Similarity.dotSeqHof(col("sv"), col("sv")))
      .withColumn("qc", Similarity.dotSeqHof(col("sv"), col("c_arr")))
      .select(col("query_id"), col("sub"), col("code"),
        (col("qq") - lit(2.0) * col("qc") + col("c2")).as("d"))
    // ADC sum: each (query, doc) hits exactly one lut row per subspace,
    // so the m distances pivot into m conditional-MAX aggs (order-free,
    // map-side combinable, pure codegen doubles) and sum in a FIXED
    // d0+d1+…+d(m−1) expression order — deterministic without touching
    // BigDecimal on the hottest agg (a decimal sum here was ~2× the
    // whole query's cost at 10×)
    val pivots = (0 until m).map(s =>
      max(when(col("sub") === s, col("d"))).as(s"d$s"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("_vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("_vid"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("adc_dist",
        (0 until m).map(s => col(s"d$s")).reduce(_ + _))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("_vid").asc)
    scored.withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("_vid").as("neighbor_id"),
        col("adc_dist"), col("rank"))
  }
}
