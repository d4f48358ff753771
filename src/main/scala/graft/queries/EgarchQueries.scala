package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Egarch, IvResampler}
import graft.options.SyntheticTrades

/** EGARCH volatility entries (M3-M6). Not ANSI-SQL-expressible — no
  * DuckDB oracle; the driver records rows-only checks, and the
  * statistical properties are covered by EgarchSpec. */
object EgarchQueries {

  private def bars(s: SparkSession, dir: String): DataFrame =
    IvResampler.resample(
      SyntheticTrades.trades(s, dir), "15 minutes", col("underlying"))

  /** M3/M5/M6: EGARCH(1,1,1) per underlying + 1-step vol forecast +
    * residual stats + IV-vs-EGARCH spread. */
  def m3Fit(s: SparkSession, dir: String): DataFrame =
    Egarch.fitPerGroup(bars(s, dir)).toDF()

  /** M4: AIC grid auto-selection over p,q in {1,2}. */
  def m4Auto(s: SparkSession, dir: String): DataFrame =
    Egarch.fitPerGroup(bars(s, dir), auto = true).toDF()

  /** M5: 5-step volatility forecast per underlying (analytic 1-step +
    * seeded simulation for 2..5). */
  def m5Forecast(s: SparkSession, dir: String): DataFrame =
    Egarch.forecastPerGroup(bars(s, dir), horizon = 5).toDF()

  /** M6: full per-bar residual / conditional-vol / IV-spread series
    * (one row per 15-min bar per underlying, not just the last value
    * m3 reports). */
  def m6Spread(s: SparkSession, dir: String): DataFrame =
    Egarch.spreadSeriesPerGroup(bars(s, dir)).toDF()

  val defs: Map[String, QueryDef] = Map(
    "m3_egarch_fit" -> QueryDef(m3Fit _, None),
    "m4_egarch_auto" -> QueryDef(m4Auto _, None),
    "m5_egarch_forecast" -> QueryDef(m5Forecast _, None),
    "m6_egarch_spread" -> QueryDef(m6Spread _, None))
}
