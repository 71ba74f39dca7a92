package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of lookup — the temporal join Spark SQL lacks (per-probe-row: the
  * most recent build-side value at or before the probe's event time,
  * per key).
  *
  * Implemented by composition (preference order (a), SURVEY §4.2): union
  * the tagged sides, one pass of `last(value, ignoreNulls) over
  * (partition key order time, tag)` — build rows sort before probe rows at
  * equal timestamps, so "at or before" ties resolve to the build row.
  * Cost: one shuffle by key + one sort — the same price as the sort-merge
  * join a native ASOF operator would run, with no custom physical node to
  * maintain. Scales as a standard keyed window (state per key bounded by
  * the window frame, which is running-last: O(1)).
  */
object AsOfJoin {

  /** @param df       one DataFrame holding both sides
    * @param isBuild  predicate marking build-side rows (the looked-up side)
    * @param key      equi key
    * @param ts       event-time column
    * @param value    build-side value to carry to probe rows
    * @param tieBreak extra ordering column for full determinism
    * @return probe rows with `asof_value` = latest build value ≤ ts
    */
  def asOfLookup(df: DataFrame, isBuild: Column, key: Column, ts: Column,
                 value: Column, tieBreak: Column): DataFrame = {
    val tag = when(isBuild, 0).otherwise(1)
    val w = Window.partitionBy(key)
      .orderBy(ts.asc, tag.asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_tag", tag)
      .withColumn("asof_value",
        last(when(isBuild, value), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag")
  }
}
