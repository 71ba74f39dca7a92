package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numerically-deterministic aggregate helpers.
  *
  * Double summation is order-dependent, and Spark's partial aggregation
  * order differs run-to-run and engine-to-engine — a plain `sum(double)`
  * can never hash-match a DuckDB oracle bit-for-bit. The fix: per-row
  * arithmetic stays in IEEE double (identical in any engine), but the
  * *fold* runs in exact decimal, then the final value is cast back to
  * double. Decimal addition is associative, so partial aggregation,
  * shuffle order, and AQE re-planning all produce the same bits — on
  * 32 local threads or 1000 executors.
  *
  * `*Sql` twins emit the equivalent ANSI SQL for the DuckDB oracle.
  */
object ExactNum {
  /** 6-decimal fixed point; 32 integer digits headroom keeps the sum exact
    * far beyond 100 TB row counts (Spark widens sum(DECIMAL(38-10,6)) to
    * DECIMAL(38,6)). */
  val Exact: DecimalType = DecimalType(28, 6)

  /** Order-insensitive, engine-portable sum of a double expression. */
  def sumExact(c: Column): Column = sum(c.cast(Exact)).cast("double")

  /** avg = exact sum / count, evaluated in double (deterministic given
    * deterministic operands). */
  def avgExact(c: Column): Column = sumExact(c) / count(c)

  def sumExactSql(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  def avgExactSql(e: String): String =
    s"(${sumExactSql(e)} / count($e))"
}
