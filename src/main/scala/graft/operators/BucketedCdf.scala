package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  3. per-(group, bucket) counts fold into exact bucket OFFSETS via a
  *     window over the ≤ groups·nb aggregate (this helper targets
  *     LOW-cardinality group keys; a high-cardinality key doesn't have
  *     the problem, its per-group windows are already parallel). The
  *     fold is IN-PLAN since r14 (VERDICT r13 #3) — DataFrame
  *     construction triggers no jobs; probe and fold execute inside the
  *     caller's own action.
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
    * group cols…, bucket, `bend`) — a constant-size (≤ groups·nb rows)
    * frame the offset fold computes anyway, so a rank-r probe can locate
    * its bucket (first bucket with bend ≥ r) against a broadcast of it
    * with no re-run of the cumulative window (q71's grid read-off). */
  def withCumEnds(hist: DataFrame, groupCols: Seq[String], vCol: String,
                  cCol: String, cumCol: String = "cum", nb: Int = 32,
                  maxOffsetRows: Int = 65536,
                  keepBucketCol: Option[String] = None)
      : (DataFrame, DataFrame, DataFrame) = {
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
    // 2. monotone bucket id (strict `>` so equal values share a bucket).
    //    Spelled as a STATIC sum of nb−1 codegen'd comparisons, not an
    //    `aggregate()` higher-order fold (optimization r15, guide §4 /
    //    §1.2 per-task work): HOF lambdas execute interpreted per array
    //    element, and this expression runs once per histogram row — the
    //    fold was the hot instruction in every BucketedCdf caller's
    //    dominant stage (q81's deviation pass: 40 s of task CPU at
    //    sf0.1, ~2/3 of it here; same shape in q71/q66/pl17). The sum
    //    of indicators is the identical count, so cum is byte-identical.
    val vD = col(vCol).cast("double")
    val withB = h.join(broadcast(bounds), gcols)
      .withColumn("__b",
        (1 until nb).map(i =>
            when(vD > col("__bds").getItem(i - 1), 1).otherwise(0))
          .reduce(_ + _))
    // 3. exact offsets, IN-PLAN (VERDICT r13 #3): the r13 form collected
    //    the per-(group, bucket) counts to the driver and folded offsets
    //    there — correct, but it made every DataFrame CONSTRUCTION pay
    //    two sequential job barriers (boundary-probe broadcast + offset
    //    collect), ~2.2 s of q71's 4.13 s sf0.1 median across its two
    //    passes, re-paid by each of Bench's best-of-2 constructions.
    //    The same fold is one window over the ≤ groups·nb bucket-count
    //    aggregate (constant-size by construction), so construction now
    //    triggers ZERO jobs: probe, fold and ends table all execute
    //    inside the query's own action, where AQE schedules the
    //    broadcast subtrees and a re-run reuses the persisted histogram.
    //    Offset values are the identical running sum — cum stays
    //    byte-identical (q71/q66/q81/pl17/pl28 hash-pinned).
    val bcDf = withB.groupBy((gc :+ col("__b")): _*)
      .agg(sum(col(cCol)).as("__bc"))
    val wOff = Window.partitionBy(gc: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the r13 require() becomes an in-plan guard (it must stay LOUD —
    // a too-wide group key would otherwise surface as a giant broadcast
    // or driver OOM): per-bucket group count × nb bounds the offset-
    // table size from above (total rows = Σ_b cnt_b ≤ nb·max_b cnt_b),
    // so any row seeing cnt_b·nb > maxOffsetRows fails the build before
    // the broadcast materializes. Slightly conservative under collapsed
    // probe boundaries (fails early only when buckets are missing for
    // some groups — exactly the degenerate case worth flagging).
    val wB = Window.partitionBy(col("__b"))
    val guarded = bcDf
      .withColumn("__off",
        when(count(lit(1)).over(wB) * lit(nb.toLong) <=
            lit(maxOffsetRows.toLong),
          coalesce(sum(col("__bc")).over(wOff), lit(0L)))
          .otherwise(raise_error(lit(
            s"BucketedCdf offset table exceeds $maxOffsetRows rows: " +
              "the group key is too wide for the broadcast offset " +
              "fold — per-group windows are already parallel at that " +
              "cardinality; use them directly")).cast("long")))
      .withColumn("bend", col("__off") + col("__bc"))
      // persisted (lazily — construction still triggers no jobs): the
      // offsets frame feeds up to three broadcast subtrees per caller
      // (cum join, ends table, rank probes), and WITHOUT the pin each
      // one re-runs the probe-join + count-agg chain — exchange reuse
      // cannot dedupe them because each consumer projects a different
      // column set. The frame is ≤ maxOffsetRows rows; release is
      // GC-scoped with the histogram below.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offDf = guarded.select((gc :+ col("__b") :+ col("__off")): _*)
    val endsDf0 = guarded
      .select((gc :+ col("__b") :+ col("bend")): _*)
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
    // rejection of the localCheckpoint alternative. endsDf embeds the
    // persisted lineage too (it is no longer a driver LocalRelation —
    // VERDICT r13 #3), so it joins the handle set.
    graft.core.ManagedPersist.register(h, out, hOut, endsDf)
    graft.core.ManagedPersist.register(guarded, out, hOut, endsDf)
    (out, hOut, endsDf)
  }
}
