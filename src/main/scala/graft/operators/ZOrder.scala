package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * operator behind `OPTIMIZE ... ZORDER BY` in lakehouse engines.
  *
  * Interleaving the bits of several dimensions gives a single sort key
  * whose ranges cover tight RECTANGLES in dimension space: files written
  * in z-key ranges carry min/max stats on every dimension that are
  * simultaneously narrow, so a predicate on ANY clustered column prunes
  * files — single-column range partitioning only prunes its own column.
  *
  * Scale shape: the z-value is pure per-row bit arithmetic (codegen'd,
  * no shuffle); the layout step is ONE range-partitioning exchange
  * (sampled boundaries, same machinery as a global sort's partitioner) —
  * the standard price of any clustered rewrite, paid once at write time
  * to make every later scan cheaper. Nothing here is driver-side: the
  * interleave is a column expression and the bucket stats are one hash
  * aggregation over bucket ids.
  */
object ZOrder {

  /** Morton interleave: bit i of dims(k) lands at position i·d + k.
    * Dims must be non-negative and fit in `bits` bits; d·bits ≤ 63. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d * bits <= 63, s"z-value would overflow a long: $d x $bits")
    dims.zipWithIndex.flatMap { case (c, k) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + k)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB twin of [[zValue]]: the same interleave spelled as inlined
    * shift-mask-or arithmetic (no lambdas — binder-safe anywhere). */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val d = dims.size
    dims.zipWithIndex.flatMap { case (e, k) =>
      (0 until bits).map(i => s"(((($e) >> $i) & 1) << ${i * d + k})")
    }.mkString("(", " | ", ")")
  }

  /** Rewrite `df` into `numFiles` z-clustered ranges: what a lakehouse
    * OPTIMIZE job does before writing files. */
  def layout(df: DataFrame, dims: Seq[Column], bits: Int,
             numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, zValue(dims, bits))

  /** Per-bucket bounding boxes under a fixed-boundary bucketing (top
    * `bucketBits` of the z-key): the file-statistics table a reader's
    * pruner consults, and the oracle-checkable witness that z-ranges
    * bound every dimension at once. */
  def bucketStats(df: DataFrame, dims: Seq[Column], bits: Int,
                  bucketBits: Int): DataFrame = {
    val d = dims.size
    val z = zValue(dims, bits)
    val named = dims.zipWithIndex.map { case (c, k) => c.as(s"d$k") }
    df.select((named :+ z.as("z")): _*)
      .groupBy(shiftright(col("z"), d * bits - bucketBits).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        (0 until d).flatMap(k => Seq(
          min(col(s"d$k")).as(s"min_d$k"),
          max(col(s"d$k")).as(s"max_d$k"))): _*)
  }
}
