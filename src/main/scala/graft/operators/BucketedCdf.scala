package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact cumulative counts over a value histogram WITHOUT a data-sized
  * single-task sort — q83's bucketed-offset machinery
  * (ExtendedQueries, VERDICT r11 #1) extracted for every key that needs
  * an exact empirical CDF / rank read-off (`min v with cum(v) ≥ r`).
  *
  * The problem it retires: `sum(c).over(Window.partitionBy(g).orderBy(v))`
  * puts each group's ENTIRE histogram through one task. That is fine
  * when the value domain is small (flags, buckets), but over a
  * near-unique continuous column (prices: ~60% of rows distinct) the
  * histogram IS data-sized — at 100× scale a 3-value group key means
  * three tasks each sorting ~130M rows, and no group key means one.
  *
  * Mechanics (all exact; the probe is the ONLY approximate piece and it
  * can never reach the output):
  *  1. per-group `percentile_approx` probe → nb−1 range boundaries.
  *     Boundaries are monotone in v, so probe error shifts bucket SIZES
  *     only — never any cumulative count.
  *  2. bucket id = #boundaries strictly below v (a fold over the
  *     broadcast boundary array) — monotone in v by construction.
  *  3. per-(group, bucket) row counts collect driver-side (≤ groups·nb
  *     rows — this helper targets LOW-cardinality group keys; a
  *     high-cardinality key doesn't have the problem, its per-group
  *     windows are already parallel) and fold into exact bucket OFFSETS.
  *  4. cum = offset + running sum under a window PARTITIONED by
  *     (group, bucket): each task sorts ~1/nb of the group's distinct
  *     values; scaling nb with data keeps tasks memory-bounded.
  *
  * cum values are byte-identical to the single-window form — the four
  * r12-rewired keys (q71/q66/q81/pl17) are hash-pinned against their
  * r11 oracles. Nulls in `vCol` are unsupported (the probe ignores
  * them and the bucket comparison would be null).
  */
object BucketedCdf {

  /** Append exact cumulative-count column `cumCol` (long; ordered by
    * `vCol` within each `groupCols` group) to a histogram frame that
    * has one row per distinct (group, v) carrying its count `cCol`.
    * Other columns ride through untouched. `groupCols` empty ⇒ one
    * global CDF.
    *
    * `keepBucketCol`: expose the internal probe-bucket id under the
    * given name — bucket b covers a contiguous v-range and cum is
    * globally monotone across buckets, so a rank-r lookup (min v with
    * cum ≥ r) only needs the FIRST bucket whose end-cum reaches r
    * (q71's grid probe; VERDICT r12 #2). */
  def withCum(hist: DataFrame, groupCols: Seq[String], vCol: String,
              cCol: String, cumCol: String = "cum", nb: Int = 32,
              maxOffsetRows: Int = 65536,
              keepBucketCol: Option[String] = None): DataFrame =
    withCumKeep(hist, groupCols, vCol, cCol, cumCol, nb, maxOffsetRows,
      keepBucketCol)._1

  /** [[withCum]] plus the persisted input histogram (second element):
    * callers that consume the histogram again outside the helper
    * (per-group totals, marginalizations, deviation re-histograms)
    * should derive those frames from IT — they then read the cached
    * blocks with no re-run of the cumulative window (deriving them from
    * the first element would re-run its shuffle+sort per consumer).
    * The persist is released by graft.core.ManagedPersist.sweep once
    * both returned frames are unreachable. */
  def withCumKeep(hist: DataFrame, groupCols: Seq[String], vCol: String,
                  cCol: String, cumCol: String = "cum", nb: Int = 32,
                  maxOffsetRows: Int = 65536,
                  keepBucketCol: Option[String] = None)
      : (DataFrame, DataFrame) = {
    val (out, hOut, _) = withCumEnds(hist, groupCols, vCol, cCol, cumCol,
      nb, maxOffsetRows, keepBucketCol)
    (out, hOut)
  }

  /** [[withCumKeep]] plus the per-bucket END-cumulatives (third element:
    * group cols…, bucket, `bend`) as a driver-built LocalRelation — the
    * offset fold already computed them, so a rank-r probe can locate its
    * bucket (first bucket with bend ≥ r) with NO extra job and no
    * re-run of the cumulative window (q71's grid read-off). */
  def withCumEnds(hist: DataFrame, groupCols: Seq[String], vCol: String,
                  cCol: String, cumCol: String = "cum", nb: Int = 32,
                  maxOffsetRows: Int = 65536,
                  keepBucketCol: Option[String] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = hist.sparkSession
    val synth = "__bcdf_g"
    // persisted for the multi-consumer span of the returned frames
    // (boundary probe, offset fold, final join, caller-side totals) —
    // without the pin the input lineage re-executes multiplicatively
    // (q81's two chained passes measured 2.3 → 8.7 s at sf0.1); release
    // is GC-scoped via ManagedPersist.register below
    val h = (if (groupCols.nonEmpty) hist
             else hist.withColumn(synth, lit(0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gcols = if (groupCols.nonEmpty) groupCols else Seq(synth)
    val gc = gcols.map(col)
    // 1. boundary probe — one hash agg over the histogram; accuracy 1000
    //    (the q83 setting) keeps bucket-size skew ≪ the nb split itself
    val bounds = h.groupBy(gc: _*)
      .agg(percentile_approx(col(vCol).cast("double"),
        array((1 until nb).map(i => lit(i.toDouble / nb)): _*),
        lit(1000)).as("__bds"))
    // 2. monotone bucket id (strict `>` so equal values share a bucket)
    val withB = h.join(broadcast(bounds), gcols)
      .withColumn("__b",
        aggregate(col("__bds"), lit(0), (acc, bd) =>
          acc + when(col(vCol).cast("double") > bd, 1).otherwise(0)))
    // 3. exact offsets, folded driver-side (≤ groups·nb rows — guarded)
    val bcDf = withB.groupBy((gc :+ col("__b")): _*)
      .agg(sum(col(cCol)).as("__bc"))
    val bcRows = bcDf.collect()
    require(bcRows.length <= maxOffsetRows,
      s"BucketedCdf offset table has ${bcRows.length} rows " +
        s"(> $maxOffsetRows): the group key is too wide for the " +
        "driver-side offset fold — per-group windows are already " +
        "parallel at that cardinality; use them directly")
    val nG = gcols.length
    // one fold emits both the bucket OFFSET (cum before the bucket) and
    // its END (cum through it) — offsets drive the window, ends serve
    // rank-probe callers via the third return value
    val offEndRows: Seq[(Row, Row)] = bcRows.toSeq
      .groupBy(r => (0 until nG).map(i => r.get(i)))
      .valuesIterator.flatMap { rs =>
        var acc = 0L
        rs.sortBy(_.getInt(nG)).map { r =>
          val key = (0 until nG).map(i => r.get(i)) :+ r.getInt(nG)
          val off = Row.fromSeq(key :+ acc)
          acc += r.getLong(nG + 1)
          (off, Row.fromSeq(key :+ acc))
        }
      }.toSeq
    val offSchema = StructType(
      bcDf.schema.fields.dropRight(1) :+
        StructField("__off", LongType, nullable = false))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offEndRows.map(_._1): _*), offSchema)
    val endSchema = StructType(
      bcDf.schema.fields.dropRight(1) :+
        StructField("bend", LongType, nullable = false))
    val endsDf0 = spark.createDataFrame(
      java.util.Arrays.asList(offEndRows.map(_._2): _*), endSchema)
      .drop(synth)
    val endsDf = keepBucketCol match {
      case Some(bc) => endsDf0.withColumnRenamed("__b", bc)
      case None => endsDf0
    }
    // 4. within-bucket cumulative under a PARTITIONED window; hist rows
    //    are distinct per (group, v), so the default RANGE frame has no
    //    ties and equals the rows frame
    val wCum = Window.partitionBy((gc :+ col("__b")): _*).orderBy(col(vCol))
    val cummed = withB.join(broadcast(offDf), gcols :+ "__b")
      .withColumn(cumCol, col("__off") + sum(col(cCol)).over(wCum))
      .drop("__bds", "__off", synth)
    val out = keepBucketCol match {
      case Some(bc) => cummed.withColumnRenamed("__b", bc)
      case None => cummed.drop("__b")
    }
    val hOut = h.drop(synth)
    // GC-scoped release of the input persist (VERDICT r12 #4): the pin
    // lives exactly as long as the frames handed to the caller — see
    // graft.core.ManagedPersist for the lifecycle and the measured
    // rejection of the localCheckpoint alternative
    graft.core.ManagedPersist.register(h, out, hOut)
    (out, hOut, endsDf)
  }
}
