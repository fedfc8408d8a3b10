package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Portable decimal rounding used by every oracle-compared query.
  *
  * Spark's `round()` rounds the shortest-decimal-representation HALF_UP
  * (via BigDecimal.valueOf) while DuckDB rounds the true binary value, so
  * the two disagree whenever a double sits on a .xx5 boundary. The
  * floor(x·10ⁿ + 0.5)/10ⁿ formula below is computed identically by both
  * engines (pure IEEE ops), so identical inputs always round identically.
  */
object Rounding {
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n) // exact for n ≤ 15
    floor(c * p + 0.5) / p
  }

  /** DuckDB rendering of [[pround]]. */
  def sqlRound(expr: String, n: Int): String =
    s"floor(($expr) * 1e$n + 0.5) / 1e$n"

  /** Driver-side (Scala double) twin of [[pround]]/[[sqlRound]] — the
    * same pure-IEEE floor(x·10ⁿ + 0.5)/10ⁿ, for driver-loop queries
    * whose learned per-step values must round exactly like the SQL
    * oracle recomputing them (q275's mixture weights).
    */
  def dround(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.floor(x * p + 0.5) / p
  }
}
