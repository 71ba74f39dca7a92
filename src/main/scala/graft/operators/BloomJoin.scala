package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft => CatShiftLeft}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.PortableHash

/** Bloom-filter semi-join reduction — the runtime-filter pattern for
  * 100 TB joins.
  *
  * A selective dimension predicate ("customers in segment X") should prune
  * the FACT-side scan before any shuffle: build a Bloom filter over the
  * dimension keys, push the membership test into the fact scan as a plain
  * codegen'd predicate, and only the surviving rows reach the join
  * exchange. Spark's own InjectRuntimeFilter does this opaquely (and its
  * `bloom_filter_agg` bit layout has no DuckDB twin); this operator makes
  * the same shape explicit on the engine-portable [[PortableHash.hash60]]
  * family, so the filter's exact bit pattern — including which false
  * positives survive — is reproducible from plain SQL arithmetic in the
  * oracle.
  *
  * Scale shape: the build side collapses to a CONSTANT-size bitmask
  * (m/64 longs, a few KB for any m that matters) via one hash aggregation
  * — the collect is of that constant aggregate, never of data-sized rows —
  * and the mask rides into the probe predicate as a literal array, i.e.
  * broadcast state inside whole-stage codegen. The probe side is a narrow
  * filter: no shuffle, no join, k md5s per row. False positives only cost
  * work downstream (the exact join still decides truth); false negatives
  * are impossible by construction.
  */
object BloomJoin {

  /** Bit position of `key` under hash row `j` (salt-prefixed, one hash
    * family — the [[Sketches]] discipline). `key` must already be a
    * string: casts live at the call site so Spark and the SQL twin
    * spell the same text. */
  def bloomBit(j: Int, key: Column, m: Int): Column =
    PortableHash.hash60(concat(lit(s"bf$j:"), key)) % m

  /** DuckDB twin of [[bloomBit]] with the hash row inlined from a
    * generate_series column `jExpr`. */
  def bloomBitSql(jExpr: String, keyExpr: String, m: Int): String =
    PortableHash.hash60Sql(
      s"'bf' || CAST($jExpr AS VARCHAR) || ':' || $keyExpr") + s" % $m"

  private def shl(v: Column, bits: Column): Column =
    Bridge.column(CatShiftLeft(Bridge.expr(v), Bridge.expr(bits)))

  /** Build the m-bit filter over `keys`'s `keyCol` (string column) as
    * packed 64-bit words. Distributed: explode to k bit positions, OR the
    * per-word bits in one hash aggregation (≤ m/64 groups survive the
    * partial aggregate — the shuffle moves at most m/64 rows per upstream
    * partition), then collect the constant-size word table. */
  def buildMask(keys: DataFrame, keyCol: Column, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0, s"m must pack into longs, got $m")
    val words = keys
      .select(explode(array((0 until k).map(j =>
        bloomBit(j, keyCol, m)): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).as("w"),
        shl(lit(1L), col("pos").bitwiseAND(lit(63L)).cast("int")).as("bit"))
      .groupBy(col("w"))
      .agg(bit_or(col("bit")).as("word"))
      .collect()
    val mask = new Array[Long](m / 64)
    words.foreach(r => mask(r.getAs[Long]("w").toInt) = r.getAs[Long]("word"))
    mask
  }

  /** Membership predicate of `key` (string column) against a built mask:
    * all k bits set. Pure narrow column arithmetic — the mask is a
    * literal array, so the whole test inlines into the scan's
    * whole-stage-codegen filter. */
  def mightContain(mask: Array[Long], key: Column, m: Int, k: Int): Column = {
    val maskLit = array(mask.map(lit): _*)
    (0 until k).map { j =>
      val pos = bloomBit(j, key, m)
      val word = element_at(maskLit, shiftright(pos, 6).cast("int") + 1)
      word.bitwiseAND(shl(lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }
}
