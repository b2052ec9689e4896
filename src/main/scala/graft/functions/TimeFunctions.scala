package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Epoch arithmetic with FLOOR semantics — the Unix convention and the
  * one every oracle already uses (`floor(epoch(ts))` in DuckDB).
  *
  * Spark's `unix_timestamp` / cast-timestamp-to-long TRUNCATES the
  * fractional second toward zero, which agrees with floor for every
  * post-1970 instant and disagrees by exactly 1 on every PRE-1970
  * instant with a fractional second (r13 fuzz: Spark -17280898 vs
  * DuckDB floor(epoch) -17280899 for 1969-06-14 23:45:01.123456).
  * Date-typed columns are second-aligned, so they never hit this; any
  * TIMESTAMP column can.
  */
object TimeFunctions {

  /** Epoch seconds as floor(epoch(ts)) — exact over the full timestamp
    * range, entirely in int64: the µs remainder is removed (pmod) and
    * the then exactly-divisible value goes through a truncating int64
    * division, which on an exact multiple IS the floor ([[floorDiv]]);
    * a double division would round past 2^53 µs (~year 2255).
    */
  def epochSec(ts: Column): Column =
    // the cast makes NTZ-read parquet (isAdjustedToUTC=false) usable:
    // sessions run UTC, so NTZ -> TIMESTAMP is the identity instant,
    // matching DuckDB's naive-UTC epoch()
    floorDiv(unix_micros(ts.cast("timestamp")), 1000000L)

  /** floor(x / n) for int64 x and constant n > 0 in exact integer
    * arithmetic — Spark's `div` truncates toward zero (pairs with
    * DuckDB's `//`), this floors (pairs with DuckDB's
    * `floor(x / n)`).
    */
  def floorDiv(x: Column, n: Long): Column = {
    require(n > 0, s"floorDiv needs n > 0, got $n")
    // x - pmod(x, n) is exactly divisible, so the truncating integer
    // division IS the floor — all int64, fully codegen'd (a decimal or
    // double division would be slower / round past 2^53)
    truncDiv(x - pmod(x, lit(n)), n)
  }

  /** x div n — truncating integer division as a Column op (pairs with
    * DuckDB's `//` / the SQL-text-only `div` operator).
    */
  def truncDiv(x: Column, n: Long): Column = {
    require(n > 0, s"truncDiv needs n > 0, got $n")
    truncDiv(x, lit(n))
  }

  /** Column-divisor form of [[truncDiv]] — `x div y` with DuckDB-`//`
    * truncation semantics, for per-row divisors (NULL/zero divisor →
    * NULL, Spark's div contract).
    */
  def truncDiv(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(y)))
}
