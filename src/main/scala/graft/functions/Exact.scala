package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exact-arithmetic helpers.
  *
  * The driver's correctness gate hash-compares our result rows against a
  * DuckDB oracle. Floating-point SUM/AVG are summation-order dependent, and
  * Spark's partial/final aggregation order differs from DuckDB's per-thread
  * combine, so raw double aggregates are not reproducible bit-for-bit.
  * Casting double→decimal is no better: the two engines round ties at the
  * target scale in different directions (Spark BigDecimal HALF_UP vs DuckDB's
  * native conversion), which we measured flipping ~1e-4-scale digits.
  *
  * Fix: quantize each addend with floor(x · 10^scale). The multiply is the
  * same IEEE-754 double op on identical inputs in both engines and floor has
  * no tie cases, so the quantized integers are bit-identical everywhere.
  * Summing them as exact decimals is associative (order-independent), and the
  * final decimal→double conversion is deterministic. The whole chain is
  * reproducible at ANY parallelism — exactly the property a 1000-executor /
  * 100 TB run needs: results don't drift when partitioning changes.
  *
  * Domain: |x|·10^scale must stay inside the double integer range (2^53) for
  * per-row exactness — true for prices/quantities at any TPC-H SF.
  */
object Exact {
  private def m(scale: Int): Double = math.pow(10.0, scale.toDouble)

  /** Order-independent sum of a double column, quantized at 10^-scale.
    * SQL: CAST(sum(CAST(floor(x * 1e{s}) AS DECIMAL(27,0))) AS DOUBLE) / 1e{s} */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(floor(c * lit(m(scale))).cast(DecimalType(27, 0))).cast("double") / lit(m(scale))

  /** Order-independent mean: quantized exact sum / count, divided as doubles
    * (IEEE division of identical operands is identical everywhere). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** SQL snippets mirroring the above, for oracle strings. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"(CAST(sum(CAST(floor(($expr) * 1e$scale) AS DECIMAL(27,0))) AS DOUBLE) / 1e$scale)"
  def davgSql(expr: String, scale: Int = 4): String =
    s"(${dsumSql(expr, scale)} / count($expr))"
}
