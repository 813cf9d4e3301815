package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric helpers.
  *
  * The driver's oracle hashes Spark results against DuckDB results.
  * Double summation is order-dependent, so every aggregate over a double
  * column goes through a decimal cast first: rounding a double to a
  * fixed decimal scale is deterministic and engine-independent (decimal
  * midpoints are not binary-representable), decimal addition is exact
  * and order-independent, and the final decimal→double cast is
  * nearest-even on both engines. The same cast chain is written into the
  * DuckDB oracle SQL.
  */
object Exact {
  /** Prices / balances / measures: full-precision doubles in the data. */
  def money(c: Column): Column = c.cast("decimal(15,4)")

  /** Small-step ratio columns (discount, tax: 0.00–0.10 in 0.01 steps). */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** Order-independent SUM of a money column, surfaced as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Order-independent AVG: exact decimal sum, then one double divide. */
  def avgMoney(c: Column): Column =
    sum(money(c)).cast("double") / count(lit(1))
}
