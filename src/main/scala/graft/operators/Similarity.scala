package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over embedding columns (`Array[Float]`) — the
  * LLM-pipeline north-star operator set.
  *
  * Numerics: float→double casts and double products are exact IEEE; the
  * *fold* over products runs in DECIMAL(28,12) so the dot product is
  * order-insensitive and bit-identical on any engine / any partitioning
  * (same design as graft.functions.ExactNum — see Scaladoc there).
  *
  * Scale design (100 TB): norms are computed once per vector *before* the
  * join (never inside the pair loop); brute force is the correctness
  * baseline over a broadcast query set (O(Q·N) with N streamed, never
  * materialized); `annLsh` is the scale path — random-hyperplane LSH
  * bucketing so candidate generation is a hash-partitioned equi-join on
  * (band, signature) instead of a cross join.
  */
object Similarity {

  val Dec: DecimalType = DecimalType(28, 12)

  /** Exact, order-insensitive dot product of two float-array columns. */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0).cast(Dec),
      (acc, x) => (acc + x.cast(Dec)).cast(Dec)).cast("double")

  /** L2 norm (exact sum of squares, then one IEEE sqrt). */
  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  /** Brute-force cosine top-k: for each row of `queries` (small, broadcast),
    * the k nearest rows of `corpus` by cosine similarity.
    *
    * @param corpus  (id, vec)
    * @param queries (id, vec) — must be broadcast-sized
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      normExact(col(vecCol)).as("c_norm"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normExact(col(vecCol)).as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        dotExact(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-duplicate
    * detection). Brute-force O(N²) verification baseline; at scale the
    * candidate set comes from [[annLsh]] bucketing instead. */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      normExact(col(vecCol)).as("norm_a"))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      normExact(col(vecCol)).as("norm_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        dotExact(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Deterministic ±1 random hyperplanes: sign((p·dims + d) LCG). */
  private def planeSign(plane: Int, dim: Column, dims: Int): Column = {
    val x = (lit(plane.toLong * dims) + dim) * 48271L % 2147483647L
    when(x % 2L === 0L, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed to a long.
    * Vectors with small angle agree on most bits; banding the signature
    * turns ANN into an equi-join — the 100 TB-scale candidate generator. */
  def lshSignature(vec: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)),
          (x, d) => x.cast("double") * planeSign(p, d.cast("long"), dims)),
        lit(0).cast(Dec), (acc, x) => (acc + x.cast(Dec)).cast(Dec))
        .cast("double")
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH bucketing: candidates = pairs agreeing on at least one
    * band of the signature; verified with exact cosine. Recall is tested
    * against [[cosineTopK]] in SimilaritySpec. */
  def annLsh(vecs: DataFrame, idCol: String, vecCol: String, dims: Int,
             planes: Int = 16, bands: Int = 4,
             threshold: Double = 0.8): DataFrame = {
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val sig = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshSignature(col(vecCol), planes, dims).as("sig"),
      normExact(col(vecCol)).as("nrm"))
    val banded = sig.select(col("id"), col("vec"), col("nrm"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * bandBits).bitwiseAND(mask).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("vec"), col("nrm"),
        col("bb.band"), col("bb.bucket"))
    val l = banded
    val r = banded.select(col("id").as("id2"), col("vec").as("vec2"),
      col("nrm").as("nrm2"), col("band").as("band2"), col("bucket").as("bucket2"))
    l.join(r, col("band") === col("band2") && col("bucket") === col("bucket2") &&
        col("id") < col("id2"))
      .select(col("id").as("id_a"), col("id2").as("id_b"),
        col("vec"), col("vec2"), col("nrm"), col("nrm2"))
      .distinct()
      .withColumn("cos_sim",
        dotExact(col("vec"), col("vec2")) / (col("nrm") * col("nrm2")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Per-label centroid components (exact mean per dimension) — the
    * IVF-style coarse quantizer build step. */
  def labelCentroids(vecs: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    import graft.functions.ExactNum
    vecs.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos0", "v")))
      .select(col("label"), (col("pos0") + 1).cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .groupBy(col("label"), col("dim"))
      .agg(ExactNum.avgExact(col("v")).as("centroid"), count(lit(1)).as("cnt"))
  }
}
