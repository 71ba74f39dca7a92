package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, TextFunctions}

/** Frequency-sketch operators for corpus statistics.
  *
  * Count-Min sketch (Cormode & Muthukrishnan 2005): a depth×width counter
  * grid; each item increments one bucket per hash row, an item's estimate
  * is the MIN of its buckets — always ≥ the true count, with overshoot
  * bounded by (corpus mass / width) per row. The sketch is built on the
  * engine-portable [[PortableHash.hash60]] family, so bucket assignment —
  * and therefore every estimate — is reproducible from plain SQL
  * arithmetic in the DuckDB oracle: the sketch VALUES are hash-checked,
  * not just "rows came back".
  */
object Sketches {

  /** Bucket of `token` in CM row `d`: a per-row salt prefixed to the
    * token keeps the depth rows independent with one hash family. */
  private def cmBucket(d: Int, token: Column, width: Int): Column =
    PortableHash.hash60(concat(lit(s"cm$d:"), token)) % width

  /** SQL twin of [[cmBucket]] with the row index inlined from a
    * generate_series column `dExpr`. */
  def cmBucketSql(dExpr: String, tokenExpr: String, width: Int): String =
    PortableHash.hash60Sql(
      s"'cm' || CAST($dExpr AS VARCHAR) || ':' || $tokenExpr") + s" % $width"

  /** Corpus token heavy hitters: exact top-k vocabulary with Count-Min
    * estimates alongside — the frequency table that seeds BPE vocabulary
    * training and stopword lists, plus the memory-bounded sketch a
    * production pipeline substitutes when the vocabulary itself is too
    * large to aggregate exactly.
    *
    * Scale shape: the exact pass is one hash aggregation over tokens
    * (shuffle keyed on token, partial counts map-side) followed by a
    * distributed top-k (TakeOrderedAndProject — per-partition heaps of k,
    * never a global sort). The CM pass aggregates to a FIXED depth×width
    * grid (here 4×1024 counters) regardless of corpus size — the partial
    * aggregate collapses each upstream partition to ≤ depth·width rows
    * before the (tiny) shuffle, which is the whole point of the sketch at
    * 100 TB: vocabulary-sized state never moves, only the constant grid.
    * The estimate join touches k·depth rows.
    *
    * Output: (token, n_exact, n_cm), n_cm ≥ n_exact by construction
    * (equality iff no colliding token shares all `depth` buckets). */
  def tokenHeavyHitters(docs: DataFrame, textCol: String, k: Int = 50,
                        depth: Int = 4, width: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    val toks = graft.core.Tables.spread(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
    val topk = toks.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("n_exact"))
      .orderBy(col("n_exact").desc, col("token").asc)
      .limit(k)
    // one (d, bucket) row per token occurrence per hash row; the groupBy
    // collapses to the constant grid
    val cm = cmGrid(toks, depth, width)
    // k·depth probe rows against the grid; both sides tiny — broadcast
    val probes = topk.select(col("token"), col("n_exact"),
      explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          cmBucket(d, col("token"), width).as("b"))): _*)).as("db"))
      .select(col("token"), col("n_exact"),
        col("db.d").as("d"), col("db.b").as("b"))
    probes.join(broadcast(cm), Seq("d", "b"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cm"))
  }

  /** Streaming twin of the Count-Min grid: the same portable bucket
    * assignment as a STREAMING aggregation in update mode. The state
    * store holds exactly the depth×width counter grid — constant memory
    * for any stream length, the sketch's defining property — and because
    * bucket arithmetic is identical, a drained stream's grid is
    * row-for-row equal to the batch grid over the same corpus
    * (pinned in SketchesSpec). */
  def streamingCmGrid(docs: DataFrame, textCol: String,
                      depth: Int = 4, width: Int = 1024): DataFrame =
    cmGrid(docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token")),
      depth, width)

  /** One (d, bucket) row per token occurrence per hash row, collapsed to
    * the constant depth×width grid. Works unchanged over a batch or a
    * streaming token table — the shared definition is what makes the
    * batch/stream equality in SketchesSpec true by construction. */
  private def cmGrid(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          cmBucket(d, col("token"), width).as("b"))): _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
    * et al. 2002; Beyer et al. 2007's unbiased estimator): keep the k
    * smallest hash values of the key set; with h_k the k-th smallest of
    * a hash uniform on [0, 2^60), distinct ≈ (k−1)·2^60 / h_k. Unlike
    * the HLL behind q21 (whose register layout is engine-private, hence
    * its bounded oracle), every number here derives from
    * [[PortableHash.hash60]] order statistics — plain SQL arithmetic the
    * DuckDB oracle reproduces bit-for-bit, giving a fully hash-checkable
    * distinct sketch.
    *
    * Scale shape: one dedup shuffle on (group, hash), then the k-min
    * selection runs TWO-STAGE — k smallest per (group, input partition)
    * first, so the per-group global sort sees ≤ k·partitions rows, never
    * the full key set (the relational spelling of the sketch's bounded
    * k-heap partial aggregate; a group with a billion distinct keys
    * never sorts a billion rows in one task). Groups with fewer than k
    * distinct hashes keep them all and the estimate degrades to the
    * EXACT count (n_kept), the sketch's sparse regime.
    *
    * Output: (grp, n_kept, h_k, est_distinct). */
  def kmvDistinct(df: DataFrame, grp: Column, key: Column,
                  k: Int = 64): DataFrame =
    kmvEstimate(kMinHashes(df, grp, key, k), k)

  /** The sketch STATE: the k smallest distinct key hashes per group,
    * as (grp, h) rows. Exposed because KMV states are mergeable — the
    * k-min of a union of sets is the k-min of the union of their
    * k-min states (q62 builds union/intersection estimates on this). */
  def kMinHashes(df: DataFrame, grp: Column, key: Column,
                 k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dk = df.filter(key.isNotNull)
      .select(grp.as("grp"), PortableHash.hash60(key.cast("string")).as("h"))
      .distinct()
    val local = dk.withColumn("p", spark_partition_id())
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("grp"), col("p"))
          .orderBy(col("h"))))
      .filter(col("rn") <= k).select(col("grp"), col("h"))
    local.withColumn("rn",
        row_number().over(Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k).select(col("grp"), col("h"))
  }

  /** (grp, n_kept, h_k, est_distinct) from a [[kMinHashes]] state. */
  def kmvEstimate(kept: DataFrame, k: Int): DataFrame =
    kept.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("h_k"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Pow60) /
            col("h_k").cast("double")))

  /** 2^60 as a double (exact): the hash range for the KMV estimator. */
  val Pow60: Double = 1152921504606846976.0

  /** Streaming twin of [[kmvDistinct]]: the same k-min state maintained
    * per group across micro-batches via flatMapGroupsWithState — state
    * is AT MOST k longs per group (the sketch's defining bound; folding
    * a batch is merge-with-state, the exact operation SketchesSpec pins
    * ≡ a fresh batch pass), and each batch emits the group's refreshed
    * (n_kept, h_k, est_distinct) row for a replace-by-key sink.
    * Estimate arithmetic is [[kmvEstimate]]'s, verbatim. */
  def streamingKmvDistinct(
      df: DataFrame, grpCol: String, keyCol: String, k: Int = 64)
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(keyCol).isNotNull)
      .select(col(grpCol).cast("string").as("grp"),
        PortableHash.hash60(col(keyCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (String, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (grp, rows, state: GroupState[Seq[Long]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map(_._2)).distinct.sorted.take(k)
          state.update(merged)
          val nKept = merged.size.toLong
          val hK = merged.last
          val est = if (nKept < k) nKept.toDouble
            else (k - 1).toDouble * Pow60 / hK.toDouble
          Iterator.single((grp, nKept, hK, est))
      }
      .toDF("grp", "n_kept", "h_k", "est_distinct")
  }

  /** One partition's maintained column statistics (q68's ANALYZE row,
    * kept fresh incrementally): exact count/null/min/max plus the KMV
    * distinct estimate of the key column. */
  case class ColStats(grp: String, n_rows: Long, n_nulls: Long,
                      vmin: Double, vmax: Double, n_kept: Long,
                      est_distinct: Double)

  /** Streaming stats maintenance — the q68 ANALYZE job without the
    * rescan: per-group (table-partition) count / null-count / min / max
    * merged exactly across micro-batches, plus the KMV k-min state for
    * the key column's NDV estimate. At 100 TB, re-running ANALYZE after
    * every ingest batch rescans the table; this keeps CBO stats current
    * for the cost of the arriving rows. State per group is O(k) longs +
    * four scalars — every piece MERGEABLE (counts add, min/min, max/max,
    * KMV union-take-k), which is exactly why these are the stats engines
    * maintain incrementally. Emits the refreshed row per group per batch
    * (update mode, replace-by-key sink). */
  def streamingColumnStats(df: DataFrame, grpCol: String, valCol: String,
      keyCol: String, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
      OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(grpCol).cast("string").as("grp"),
        col(valCol).cast("double").as("v"),
        PortableHash.hash60(col(keyCol).cast("string")).as("h"))
      .as[(String, Option[Double], Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Double, Double, Seq[Long]),
        ColStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (grp, rows,
            state: GroupState[(Long, Long, Double, Double, Seq[Long])]) =>
          var (n, nulls, vmin, vmax, kmv) = state.getOption
            .getOrElse((0L, 0L, Double.PositiveInfinity,
              Double.NegativeInfinity, Seq.empty[Long]))
          val hs = scala.collection.mutable.ArrayBuffer[Long]()
          rows.foreach { case (_, v, h) =>
            n += 1
            v match {
              case Some(x) =>
                if (x < vmin) vmin = x
                if (x > vmax) vmax = x
              case None => nulls += 1
            }
            h.foreach(hs += _)
          }
          kmv = (kmv ++ hs).distinct.sorted.take(k)
          state.update((n, nulls, vmin, vmax, kmv))
          val nKept = kmv.size.toLong
          val est = if (nKept == 0) 0.0
            else if (nKept < k) nKept.toDouble
            else (k - 1).toDouble * Pow60 / kmv.last.toDouble
          Iterator.single(ColStats(grp, n, nulls, vmin, vmax, nKept, est))
      }.toDF()
  }

  /** DuckDB twin of [[kmvDistinct]]'s selection + estimate, as a CTE
    * body parameterized on the source relation and expressions. */
  def kmvSql(from: String, grpExpr: String, keyExpr: String,
             k: Int = 64): String =
    s"""SELECT grp, count(*) AS n_kept, max(h) AS h_k,
       |  CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |       ELSE ${(k - 1).toDouble} * ${Pow60} / CAST(max(h) AS DOUBLE)
       |  END AS est_distinct
       |FROM (
       |  SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT $grpExpr AS grp,
       |          ${PortableHash.hash60Sql(s"CAST($keyExpr AS VARCHAR)")} AS h
       |        FROM $from WHERE $keyExpr IS NOT NULL)
       |) WHERE rn <= $k GROUP BY grp""".stripMargin
}
