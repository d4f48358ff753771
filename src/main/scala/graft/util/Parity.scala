package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-parity helpers shared by the Spark queries and their DuckDB
  * oracles.
  *
  * The driver hash-compares Spark results against DuckDB, so floating
  * aggregation order must not leak into outputs:
  *   - sums/avgs of doubles go through DECIMAL(28,6) (exact, order-free)
  *     and are cast back to double;
  *   - variance/stddev are computed from those exact sums with a fixed
  *     double expression instead of the engines' streaming kernels;
  *   - timestamps are exported as epoch seconds (BIGINT), dates as
  *     ISO-8601 strings, so physical timestamp precision (ns in DuckDB,
  *     us in Spark) never reaches the comparator.
  */
object Parity {

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Exact average: exact sum / non-null count (identical double division
    * on both engines). Null when no non-null input rows. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample stddev from exact sums: sqrt((sum(x^2) - sum(x)^2/n)/(n-1)).
    * Matches the same spelled-out formula in the oracle SQL bit-for-bit;
    * null for n < 2 (nullif guard). */
  def dstddevSamp(c: Column): Column = {
    val n = count(c).cast("double")
    val s = dsum(c)
    val s2 = sum((c * c).cast(DecimalType(28, 6))).cast("double")
    sqrtNonNeg((s2 - s * s / n) / nullif(n - lit(1.0), lit(0.0)))
  }

  /** Population stddev from exact sums. */
  def dstddevPop(c: Column): Column = {
    val n = count(c).cast("double")
    val s = dsum(c)
    val s2 = sum((c * c).cast(DecimalType(28, 6))).cast("double")
    sqrtNonNeg((s2 - s * s / n) / nullif(n, lit(0.0)))
  }

  /** sqrt with a clamp for tiny negative FP numerators; CASE (not
    * greatest) so nulls stay null on both engines. */
  private def sqrtNonNeg(d: Column): Column =
    sqrt(when(d < 0, lit(0.0)).otherwise(d))

  /** Timestamp -> epoch seconds (floor), BIGINT. */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Quantize a double to n decimal places via decimal cast — for
    * verification outputs of transcendental-function results ONLY.
    * Java Math.exp/log and glibc disagree by <=1 ulp, so raw doubles
    * from exp/ln chains can never hash-match across JVM and DuckDB;
    * both engines round to the same grid instead (identical except
    * when the 1-ulp gap straddles a grid boundary — probability
    * ~1e-8/value at n=9). Library operators return raw doubles; only
    * the harness rounds. */
  def roundTo(c: Column, n: Int): Column =
    c.cast(DecimalType(28, n)).cast("double")

  /** Null-safe ratio: x / nullif(y, 0) — pandas/ClickHouse NaN-on-zero
    * parity (SURVEY §2.7 P8). */
  def ratio(x: Column, y: Column): Column = x / nullif(y, lit(0.0))

  // NOTE: there is deliberately no dsum variant finer than 6 dp.
  // Spark casts double→decimal via the value's shortest string repr,
  // DuckDB via the exact binary value; at a 12-dp grid the two
  // roundings disagree for ~2e-4 of ~1-magnitude values (observed at
  // sf0.01 in the first smile-fit cut). When finer-than-6-dp exact
  // sums are needed, quantize only the raw INPUTS at a coarse grid
  // and build the products in pinned-scale DECIMAL arithmetic — see
  // operators/SmileFit.scala and operators/SpotCorr.scala.

  // ---- DuckDB-side spellings of the same helpers (string templates) ----

  /** DuckDB: epoch seconds as BIGINT, truncation identical to Spark's
    * unix_timestamp (extract(epoch) alone returns a fractional DOUBLE). */
  def duckEpochS(col: String): String =
    s"CAST(extract(epoch FROM date_trunc('second', $col)) AS BIGINT)"

  def duckDsum(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"

  def duckDavg(expr: String): String =
    s"(${duckDsum(expr)} / count($expr))"

  def duckStddevSamp(expr: String): String = {
    val n = s"CAST(count($expr) AS DOUBLE)"
    val s = duckDsum(expr)
    val s2 = duckDsum(s"($expr)*($expr)")
    duckSqrtNonNeg(s"($s2 - $s*$s/$n) / nullif($n - 1.0, 0.0)")
  }

  def duckStddevPop(expr: String): String = {
    val n = s"CAST(count($expr) AS DOUBLE)"
    val s = duckDsum(expr)
    val s2 = duckDsum(s"($expr)*($expr)")
    duckSqrtNonNeg(s"($s2 - $s*$s/$n) / nullif($n, 0.0)")
  }

  private def duckSqrtNonNeg(d: String): String =
    s"sqrt(CASE WHEN ($d) < 0 THEN 0.0 ELSE ($d) END)"

  /** DuckDB twin of [[roundTo]]. */
  def duckRoundTo(expr: String, n: Int): String =
    s"CAST(CAST(($expr) AS DECIMAL(28,$n)) AS DOUBLE)"

  /** DuckDB: first 8 hex chars of a sha-hex column as BIGINT — the
    * twin of Spark's `conv(substring(sha, 1, 8), 16, 10)`. 32 bits,
    * so the 16.0**k double powers stay integer-exact (< 2^53). */
  def duckHex32(hexCol: String): String =
    s"""CAST(list_sum([(strpos('0123456789abcdef', $hexCol[i]) - 1)
       |      * (16.0 ** (8 - i)) for i in range(1, 9)]) AS BIGINT)"""
      .stripMargin

  /** DuckDB double literal that parses to the bit-identical IEEE
    * double: Java's toString is the shortest round-trip repr and the
    * string→double cast is correctly rounded. Used by the dynamic
    * oracles that pin computed values (trained-ANN gate, EGARCH
    * spread, sketch estimates). */
  def duckDoubleLit(d: Double): String =
    if (d.isNaN) "CAST('nan' AS DOUBLE)"
    else if (d == Double.PositiveInfinity) "CAST('inf' AS DOUBLE)"
    else if (d == Double.NegativeInfinity) "CAST('-inf' AS DOUBLE)"
    else s"CAST('$d' AS DOUBLE)"
}
