package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftMath
import graft.operators.{Greeks, SpotProvider}
import graft.util.Parity
import graft.util.Parity._

/** Correctness entries for the Greeks engine (M1/M2/F8/P13/A14/A15).
  * The oracle mirrors every arithmetic stage — including the A&S
  * 7.1.26 erf — op for op, so the custom Catalyst expression itself is
  * under the hash-compare gate. */
object GreeksQueries {

  private def greeksDf(s: SparkSession, dir: String): DataFrame =
    Greeks.withGreeks(FeatureQueries.enrichedSpot(s, dir))

  /** Stage-by-stage oracle twin of Greeks.withGreeks. */
  private val greeksCte: String =
    s"""${OracleCtes.enrichedSpot},
       |gt AS (
       |  SELECT *,
       |    (${duckEpochS("CAST(expiry AS TIMESTAMP)")} - ep) / 31557600.0 AS T
       |  FROM enriched_spot
       |),
       |gv AS (
       |  SELECT *,
       |    (T > 0 AND iv > 0 AND spot_price > 0 AND strike > 0) AS valid
       |  FROM gt
       |),
       |g1 AS (SELECT *, CASE WHEN valid THEN sqrt(T) END AS sqrtT FROM gv),
       |g2 AS (
       |  SELECT *, CASE WHEN valid THEN
       |    (ln(spot_price / strike) + (0.02 + iv * iv / 2.0) * T)
       |      / (iv * sqrtT) END AS d1
       |  FROM g1
       |),
       |g3 AS (SELECT *, d1 - iv * sqrtT AS d2 FROM g2),
       |g4 AS (SELECT *, d1 / sqrt(2.0) AS x1, d2 / sqrt(2.0) AS x2 FROM g3),
       |g5 AS (
       |  SELECT *, ${GraftMath.duckErf("x1")} AS erf1,
       |    ${GraftMath.duckErf("x2")} AS erf2
       |  FROM g4
       |),
       |g6 AS (
       |  SELECT *,
       |    0.5 * (1.0 + erf1) AS cdf1,
       |    0.5 * (1.0 + erf2) AS cdf2,
       |    0.5 * (1.0 - erf2) AS cdfn2,
       |    exp(-(d1 * d1) / 2.0) / sqrt(2.0 * pi()) AS pdf1
       |  FROM g5
       |),
       |greeks AS (
       |  SELECT *,
       |    CASE WHEN option_type = 'C' THEN cdf1 ELSE cdf1 - 1.0 END
       |      AS bs_delta,
       |    pdf1 / (spot_price * iv * sqrtT) AS gamma,
       |    spot_price * pdf1 * sqrtT / 100.0 AS vega,
       |    (CASE WHEN option_type = 'C'
       |      THEN (-(spot_price * pdf1 * iv)) / (2.0 * sqrtT)
       |        - 0.02 * strike * exp(-(0.02 * T)) * cdf2
       |      ELSE (-(spot_price * pdf1 * iv)) / (2.0 * sqrtT)
       |        + 0.02 * strike * exp(-(0.02 * T)) * cdfn2
       |    END) / 365.25 AS theta
       |  FROM g6
       |),
       |greeks_adj AS (
       |  SELECT *, bs_delta - price / spot_price AS adjusted_delta
       |  FROM greeks
       |)""".stripMargin

  // ---- M1/M2: row-level greeks ----

  // Outputs are grid-quantized (Parity.roundTo): JVM and glibc
  // exp/log differ by <=1 ulp, so raw transcendental chains can never
  // hash-match. gamma gets 12 decimals (values ~1e-5).
  def m1Greeks(s: SparkSession, dir: String): DataFrame =
    greeksDf(s, dir).select(
      col("trade_id"),
      Parity.epochS(col("timestamp")).as("ep"),
      col("option_type"), col("T"),
      Parity.roundTo(col("bs_delta"), 9).as("bs_delta"),
      Parity.roundTo(col("adjusted_delta"), 9).as("adjusted_delta"),
      Parity.roundTo(col("gamma"), 12).as("gamma"),
      Parity.roundTo(col("vega"), 9).as("vega"),
      Parity.roundTo(col("theta"), 9).as("theta"))

  val m1Oracle: String =
    s"""WITH $greeksCte
       |SELECT trade_id, ep, option_type, T,
       |  ${duckRoundTo("bs_delta", 9)} AS bs_delta,
       |  ${duckRoundTo("adjusted_delta", 9)} AS adjusted_delta,
       |  ${duckRoundTo("gamma", 12)} AS gamma,
       |  ${duckRoundTo("vega", 9)} AS vega,
       |  ${duckRoundTo("theta", 9)} AS theta
       |FROM greeks_adj""".stripMargin

  // ---- M19: delta-hedged P&L replay ----

  def m19HedgedPnl(s: SparkSession, dir: String): DataFrame =
    Greeks.hedgedPnl(greeksDf(s, dir))

  val m19Oracle: String =
    s"""WITH $greeksCte,
       |base AS (
       |  SELECT * FROM greeks_adj
       |  WHERE adjusted_delta IS NOT NULL AND spot_price > 0
       |),
       |stp AS (
       |  SELECT *,
       |    lag(price) OVER w AS prev_price,
       |    lag(spot_price) OVER w AS prev_spot,
       |    lag(adjusted_delta) OVER w AS prev_delta
       |  FROM base
       |  WINDOW w AS (PARTITION BY instrument_name ORDER BY ep, trade_id)
       |),
       |fl AS (SELECT * FROM stp WHERE prev_price IS NOT NULL),
       |aggd AS (
       |  SELECT underlying, strftime(expiry, '%Y-%m-%d') AS expiry_date,
       |    count(*) AS n_steps,
       |    ${duckDsum("price - prev_price")} AS option_pnl,
       |    ${duckDsum(duckRoundTo(
              "prev_delta * (spot_price - prev_spot)", 6))} AS hedge_pnl
       |  FROM fl GROUP BY 1, 2
       |)
       |SELECT *, option_pnl - hedge_pnl AS hedged_pnl FROM aggd"""
      .stripMargin

  // ---- A14: portfolio greeks ----

  def a14Portfolio(s: SparkSession, dir: String): DataFrame =
    Greeks.portfolioGreeks(greeksDf(s, dir))

  val a14Oracle: String =
    s"""WITH $greeksCte,
       |valid_g AS (SELECT * FROM greeks_adj WHERE adjusted_delta IS NOT NULL)
       |SELECT * ,
       |  net_delta * spot_median AS dollar_delta,
       |  net_gamma * spot_median AS dollar_gamma
       |FROM (
       |  SELECT
       |    ${duckDsum("adjusted_delta * amount")} AS net_delta,
       |    ${duckDsum("gamma * amount")} AS net_gamma,
       |    ${duckDsum("vega * amount")} AS net_vega,
       |    ${duckDsum("theta * amount")} AS net_theta,
       |    median(spot_price) AS spot_median
       |  FROM valid_g
       |)""".stripMargin

  // ---- A15: greeks by moneyness bucket ----

  def a15ByBucket(s: SparkSession, dir: String): DataFrame =
    Greeks.greeksByBucket(
      greeksDf(s, dir).withColumn("moneyness_bucket",
        SpotProvider.moneynessBucket(col("moneyness"))))

  val a15Oracle: String = {
    val aggs = Seq("bs_delta", "adjusted_delta", "gamma", "vega", "theta")
      .map { g =>
        s"""  ${duckDavg(g)} AS ${g}_mean,
           |  ${duckStddevSamp(g)} AS ${g}_std,
           |  count($g) AS ${g}_count""".stripMargin
      }
      .mkString(",\n")
    s"""WITH $greeksCte
       |SELECT ${OracleCtes.moneynessBucketCase("moneyness")}
       |    AS moneyness_bucket,
       |$aggs
       |FROM greeks_adj
       |GROUP BY moneyness_bucket""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "m1_greeks" -> QueryDef(m1Greeks _, m1Oracle),
    "m19_hedged_pnl" -> QueryDef(m19HedgedPnl _, m19Oracle),
    "a14_portfolio_greeks" -> QueryDef(a14Portfolio _, a14Oracle),
    "a15_greeks_by_bucket" -> QueryDef(a15ByBucket _, a15Oracle))
}
