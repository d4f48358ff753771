package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Egarch, IvResampler}
import graft.options.SyntheticTrades

/** EGARCH volatility entries (M3-M6). The MLE fit itself is not
  * ANSI-SQL-expressible, so every entry is oracle-gated around the
  * fit with the [[DynamicOracles]] echo+verify pattern (same as the
  * trained-ANN re-rank gate in [[LlmQueries]] and m6): fit outputs
  * are pinned as literals, while everything the SQL engine CAN
  * derive — the per-underlying observation count from the bars
  * pipeline, the last bar's iv_close feeding the spread — is
  * recomputed in DuckDB and hash-matched, so drift in the series the
  * fit consumed mismatches even though the MLE itself is only
  * echoed. Statistical properties of the fit are covered by
  * EgarchSpec. */
object EgarchQueries {

  private def bars(s: SparkSession, dir: String): DataFrame =
    IvResampler.resample(
      SyntheticTrades.trades(s, dir), "15 minutes", col("underlying"))

  /** Bars + per-underlying series stats the oracles re-derive from
    * the raw trades: n_obs = bar count, the fit's observation count
    * (Egarch.prepareAndFit consumes one value per bar and drops NaN
    * bar values — NaN is not NULL in DuckDB, so the count filters
    * `NOT isnan(iv_close)` to keep the two definitions identical). */
  private def statsCtes: String =
    s"""${OracleCtes.enriched},
       |bars AS (
       |  SELECT underlying, arg_max(iv, "timestamp") AS iv_close,
       |    bucket_start
       |  FROM enriched WHERE iv IS NOT NULL
       |  GROUP BY underlying, bucket_start
       |),
       |stats AS (
       |  SELECT underlying, CAST(count(*) AS INT) AS n_obs
       |  FROM bars WHERE NOT isnan(iv_close) GROUP BY underlying
       |)""".stripMargin

  /** M3/M5/M6: EGARCH(1,1,1) per underlying + 1-step vol forecast +
    * residual stats + IV-vs-EGARCH spread. */
  def m3Fit(s: SparkSession, dir: String): DataFrame =
    gatedFit("m3_egarch_fit", s, dir, auto = false)

  /** M4: AIC grid auto-selection over p,q in {1,2}. */
  def m4Auto(s: SparkSession, dir: String): DataFrame =
    gatedFit("m4_egarch_auto", s, dir, auto = true)

  /** Shared m3/m4 gate: fit params pinned as literals (echo); n_obs
    * re-derived by the oracle from raw trades, so a drift in the bars
    * pipeline the fit consumed hash-mismatches. The collect is one
    * row per underlying. EgarchRow field order is the contract here:
    * 0 underlying, 1 p, 2 q, 3-12 doubles (mu..persistence),
    * 13 n_obs, 14 converged, 15-18 doubles (vol_forecast_1,
    * resid_mean, resid_std, iv_egarch_spread_last). */
  private def gatedFit(name: String, s: SparkSession, dir: String,
      auto: Boolean): DataFrame = {
    val out = graft.util.Caches.materialize(
      Egarch.fitPerGroup(bars(s, dir), auto = auto).toDF())
    // bounded-collect(one fitted-parameter row per underlying)
    val rows = out.collect().sortBy(_.getString(0))
    val sql =
      if (rows.isEmpty) emptyM3Oracle
      else {
        val values = rows.map { r =>
          val dbl = (i: Int) => dlit(r.getDouble(i))
          s"('${r.getString(0)}', ${r.getInt(1)}, ${r.getInt(2)}, " +
            (3 to 12).map(dbl).mkString(", ") +
            s", ${r.getBoolean(14)}, " +
            (15 to 18).map(dbl).mkString(", ") + ")"
        }.mkString(",\n    ")
        s"""WITH $statsCtes,
           |fitted(underlying, p, q, mu, omega, alpha1, gamma, beta1, nu,
           |       log_lik, aic, bic, persistence, converged,
           |       vol_forecast_1, resid_mean, resid_std,
           |       iv_egarch_spread_last) AS (VALUES
           |    $values)
           |SELECT f.underlying, f.p, f.q, f.mu, f.omega, f.alpha1,
           |  f.gamma, f.beta1, f.nu, f.log_lik, f.aic, f.bic,
           |  f.persistence, s.n_obs, f.converged, f.vol_forecast_1,
           |  f.resid_mean, f.resid_std, f.iv_egarch_spread_last
           |FROM fitted f JOIN stats s USING (underlying)""".stripMargin
      }
    DynamicOracles.put(name, sql)
    out
  }

  /** Empty-branch oracles must still project the full typed column
    * list (the harness checks schema_match even on zero rows), so a
    * legitimately-empty fit set at a small scale factor stays green —
    * mirrors m6Oracle's empty branch. */
  private val emptyM3Oracle =
    """SELECT CAST(NULL AS VARCHAR) AS underlying,
      |  CAST(NULL AS INT) AS p, CAST(NULL AS INT) AS q,
      |  CAST(NULL AS DOUBLE) AS mu, CAST(NULL AS DOUBLE) AS omega,
      |  CAST(NULL AS DOUBLE) AS alpha1, CAST(NULL AS DOUBLE) AS gamma,
      |  CAST(NULL AS DOUBLE) AS beta1, CAST(NULL AS DOUBLE) AS nu,
      |  CAST(NULL AS DOUBLE) AS log_lik, CAST(NULL AS DOUBLE) AS aic,
      |  CAST(NULL AS DOUBLE) AS bic, CAST(NULL AS DOUBLE) AS persistence,
      |  CAST(NULL AS INT) AS n_obs, CAST(NULL AS BOOLEAN) AS converged,
      |  CAST(NULL AS DOUBLE) AS vol_forecast_1,
      |  CAST(NULL AS DOUBLE) AS resid_mean, CAST(NULL AS DOUBLE) AS resid_std,
      |  CAST(NULL AS DOUBLE) AS iv_egarch_spread_last
      |WHERE false""".stripMargin

  private val emptyM5Oracle =
    """SELECT CAST(NULL AS VARCHAR) AS underlying,
      |  CAST(NULL AS INT) AS horizon, CAST(NULL AS DOUBLE) AS vol_forecast,
      |  CAST(NULL AS DOUBLE) AS persistence, CAST(NULL AS INT) AS n_obs,
      |  CAST(NULL AS BOOLEAN) AS converged
      |WHERE false""".stripMargin

  /** M5: 5-step volatility forecast per underlying (analytic 1-step +
    * seeded simulation for 2..5). Gate: forecasts pinned, n_obs
    * re-derived from the bars pipeline. */
  def m5Forecast(s: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Caches.materialize(
      Egarch.forecastPerGroup(bars(s, dir), horizon = 5).toDF())
    // bounded-collect(underlyings x horizon=5 forecast rows)
    val rows = out.collect().sortBy(r => (r.getString(0), r.getInt(1)))
    val sql =
      if (rows.isEmpty) emptyM5Oracle
      else {
        val values = rows.map { r =>
          s"('${r.getString(0)}', ${r.getInt(1)}, ${dlit(r.getDouble(2))}, " +
            s"${dlit(r.getDouble(3))}, ${r.getBoolean(5)})"
        }.mkString(",\n    ")
        s"""WITH $statsCtes,
           |fc(underlying, horizon, vol_forecast, persistence, converged)
           |  AS (VALUES
           |    $values)
           |SELECT f.underlying, f.horizon, f.vol_forecast, f.persistence,
           |  s.n_obs, f.converged
           |FROM fc f JOIN stats s USING (underlying)""".stripMargin
      }
    DynamicOracles.put("m5_egarch_forecast", sql)
    out
  }

  /** M6: full per-bar residual / conditional-vol / IV-spread series
    * (one row per 15-min bar per underlying, not just the last value
    * m3 reports). Oracle-gated: the fitted (cond_vol, residual) pairs
    * — the only non-SQL part — are pinned as literals, and the oracle
    * recomputes iv_close from the trades derivation, joins on
    * (underlying, bucket_start), and recomputes the spread; any drift
    * in the bars pipeline or the alignment hash-mismatches. The
    * collect is bounded by bar count (one row / 15 min / underlying —
    * the EGARCH operator already collects each group's series inside
    * its executor task by design, Egarch.scala:390). */
  def m6Spread(s: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Caches.materialize(
      Egarch.spreadSeriesPerGroup(bars(s, dir)).toDF())
    import out.sparkSession.implicits._
    val fitted = out
      .select(col("underlying"), col("bucket_start"),
        col("cond_vol"), col("residual"))
      // bounded-collect(underlyings x 15-min calendar buckets: the
      // spread series is time-bounded, not corpus-proportional)
      .as[(String, Long, Double, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    DynamicOracles.put("m6_egarch_spread", m6Oracle(fitted))
    out
  }

  private def dlit(d: Double): String = graft.util.Parity.duckDoubleLit(d)

  private def m6Oracle(fitted: Seq[(String, Long, Double, Double)]): String =
    if (fitted.isEmpty)
      """SELECT CAST(NULL AS VARCHAR) AS underlying,
        |  CAST(NULL AS BIGINT) AS bucket_start,
        |  CAST(NULL AS DOUBLE) AS iv_close, CAST(NULL AS DOUBLE) AS cond_vol,
        |  CAST(NULL AS DOUBLE) AS residual,
        |  CAST(NULL AS DOUBLE) AS iv_egarch_spread
        |WHERE false""".stripMargin
    else {
      val values = fitted.map { case (u, b, cv, r) =>
        s"('$u', $b, ${dlit(cv)}, ${dlit(r)})"
      }.mkString(",\n    ")
      s"""WITH ${OracleCtes.enriched},
         |bars AS (
         |  SELECT underlying, arg_max(iv, "timestamp") AS iv_close, bucket_start
         |  FROM enriched WHERE iv IS NOT NULL
         |  GROUP BY underlying, bucket_start
         |),
         |fitted(underlying, bucket_start, cond_vol, residual) AS (VALUES
         |    $values)
         |SELECT b.underlying, b.bucket_start, b.iv_close, f.cond_vol,
         |  f.residual, b.iv_close - f.cond_vol AS iv_egarch_spread
         |FROM fitted f
         |JOIN bars b
         |  ON b.underlying = f.underlying AND b.bucket_start = f.bucket_start""".stripMargin
    }

  val defs: Map[String, QueryDef] = Map(
    "m3_egarch_fit" -> QueryDef(m3Fit _, None),
    "m4_egarch_auto" -> QueryDef(m4Auto _, None),
    "m5_egarch_forecast" -> QueryDef(m5Forecast _, None),
    "m6_egarch_spread" -> QueryDef(m6Spread _, None))
}
