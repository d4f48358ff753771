package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.RealizedVol
import graft.options.SyntheticTrades
import graft.util.Parity._

/** Realized-volatility entries (M7 — beyond the reference: the
  * price-path twin of the IV resample family that the EGARCH spread
  * analysis implies but the reference never materializes). */
object VolQueries {

  private def trades(s: SparkSession, dir: String): DataFrame =
    SyntheticTrades.trades(s, dir)

  def m7RealizedVol(s: SparkSession, dir: String): DataFrame =
    RealizedVol.dailyEstimators(trades(s, dir))

  /** Every per-bar term quantized (duckRoundTo) before the exact
    * DECIMAL sum; the two transcendental coefficients are spelled via
    * duckDoubleLit so both engines fold bit-identical constants. */
  val m7Oracle: String = {
    val kp = duckDoubleLit(RealizedVol.ParkinsonCoef)
    val kgk = duckDoubleLit(RealizedVol.GkCoef)
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    s"""WITH ${SyntheticTrades.tradesCte},
       |pb AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    arg_min(price, "timestamp") AS open,
       |    max(price) AS high, min(price) AS low,
       |    arg_max(price, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |terms AS (
       |  SELECT underlying, bucket_start,
       |    bucket_start - bucket_start % 86400 AS day_start, close,
       |    ${duckRoundTo("ln(high/low)*ln(high/low)", 6)} AS lhl2,
       |    ${duckRoundTo(
               s"0.5*ln(high/low)*ln(high/low) - $kgk*ln(close/open)*ln(close/open)",
               6)} AS gk,
       |    ${duckRoundTo(
               "ln(high/close)*ln(high/open) + ln(low/close)*ln(low/open)",
               6)} AS rs
       |  FROM pb
       |),
       |rets AS (
       |  SELECT *, ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM terms
       |)
       |SELECT underlying, day_start,
       |  count(*) AS n_bars, count(r) AS n_returns,
       |  coalesce($rvSum, 0.0::DOUBLE) AS rv_cc,
       |  (${duckDsum("lhl2")} / count(*)) * $kp AS parkinson,
       |  ${duckDsum("gk")} / count(*) AS garman_klass,
       |  ${duckDsum("rs")} / count(*) AS rogers_satchell,
       |  sqrt(coalesce($rvSum, 0.0::DOUBLE)) AS rv_vol
       |FROM rets GROUP BY 1, 2""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "m7_realized_vol" -> QueryDef(m7RealizedVol _, m7Oracle))
}
