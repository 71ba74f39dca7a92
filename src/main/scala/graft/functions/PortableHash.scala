package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for the sketch operators (MinHash, SimHash).
  *
  * Spark's `xxhash64` has no DuckDB twin, so any operator whose OUTPUT
  * depends on hash VALUES (not just hash equality) cannot be checked by
  * the SQL oracle when built on it. These primitives produce identical
  * integers in both engines from plain SQL arithmetic:
  *
  *  - [[hash60]]: the first 15 hex chars of `md5(s)` parsed base-16 — a
  *    uniform 60-bit non-negative long. Spark computes it with codegen'd
  *    `conv`; the DuckDB twin ([[hash60Sql]]) folds the same 15 chars with
  *    `strpos` arithmetic. md5 on UTF-8 bytes is engine-identical
  *    (verified incl. non-ASCII), so both sides see the same 60-bit value.
  *  - [[minhashPerm]]: the classic affine permutation family
  *    h_i(x) = (a_i * (x mod p) + b_i) mod p over p = 2^31-1. Operands
  *    stay under 2^62, so the arithmetic never overflows a BIGINT in
  *    either engine (DuckDB errors on overflow rather than wrapping).
  *
  * Cost note: hash60 is ~2× an xxhash64 (md5 + conv, both codegen'd) —
  * still narrow per-row work; use xxhash64 where only hash EQUALITY
  * matters (join keys), these where hash VALUES reach the output.
  */
object PortableHash {

  /** Mersenne prime 2^31 - 1: the permutation modulus. */
  val P31 = 2147483647L

  /** 60-bit engine-portable string hash (see class doc). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[hash60]]. */
  def hash60Sql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1,16), i -> CAST(strpos('0123456789abcdef', " +
      s"substring(md5($e), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))), " +
      s"(a, d) -> a * 16 + d)"

  /** Coefficients of the i-th affine permutation (a_i nonzero: both
    * factors are in (0, p) and p is prime, so the product mod p is too). */
  def permCoeffs(i: Int): (Long, Long) =
    (((i + 1) * 1103515245L) % P31, (i * 12345L + 67890L) % P31)

  /** i-th MinHash permutation of a [[hash60]] value. */
  def minhashPerm(i: Int, h60: Column): Column = {
    val (a, b) = permCoeffs(i)
    (lit(a) * (h60 % P31) + lit(b)) % P31
  }

  /** DuckDB twin of [[minhashPerm]]. */
  def minhashPermSql(i: Int, e: String): String = {
    val (a, b) = permCoeffs(i)
    s"(($a * (($e) % $P31) + $b) % $P31)"
  }
}
