package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle hash compare.
  *
  * Double summation is order-dependent; Spark's parallel partial
  * aggregation and DuckDB's sequential scan would disagree in the last
  * bits on large sums. All fixture money/value columns carry exactly two
  * decimal digits, so casting each row to DECIMAL(18,2) loses nothing,
  * makes the sum exact and order-independent, and the final cast back to
  * double is a pure function of the value — identical in both engines.
  *
  * Oracle SQL twin of [[dsum]]:
  *   `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`
  * and of [[davg]]:
  *   `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)`
  */
object Det {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact, order-independent sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Deterministic mean built from the exact decimal sum. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Row-level cast used to keep arithmetic in exact decimals. */
  def dec2(c: Column): Column = c.cast(Money)

  /** lineitem revenue expression: decimal(18,2) * (1 - decimal(18,2))
    * has scale 4 and stays exact — no intermediate rounding anywhere.
    * Oracle twin: `CAST(l_extendedprice AS DECIMAL(18,2)) *
    *              (1 - CAST(l_discount AS DECIMAL(18,2)))`.
    */
  def revenueExpr(price: Column, discount: Column): Column =
    dec2(price) * (lit(1).cast(Money) - dec2(discount))
}
