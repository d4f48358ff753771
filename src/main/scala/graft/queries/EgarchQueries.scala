package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{Egarch, IvResampler}
import graft.options.SyntheticTrades

/** EGARCH volatility entries (M3-M6). The MLE fit itself is not
  * ANSI-SQL-expressible — M3-M5 have no DuckDB oracle (rows-only
  * checks; statistical properties covered by EgarchSpec). M6 is
  * oracle-gated around the fit: the fitted series is pinned as
  * literals and the SQL-expressible tail (bars pipeline, alignment
  * join, spread arithmetic) is hash-matched — same pattern as the
  * trained-ANN re-rank gate in [[LlmQueries]]. */
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
