package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftColumns
import graft.util.Parity

/** Black-Scholes Greeks with Deribit inverse-option adjustment
  * (SURVEY §2.8 M1/M2, §2.2 F8, §2.7 P13, §2.4 A14/A15) — the
  * reference's `features/greeks.py:43-264`.
  *
  * The reference leaves ClickHouse for numpy/numba here ("scipy.norm
  * not available in ClickHouse", greeks.py:10-13); in Spark the whole
  * computation stays columnar: Φ needs erf, supplied by the native
  * [[graft.functions.Erf]] codegen expression. No UDFs, no Python — at
  * 100 TB the Greeks are a map stage fused by whole-stage codegen with
  * zero extra passes.
  *
  * Conventions (greeks.py:155-165): vega per 1% IV move (raw/100),
  * theta per day (annual/365.25), r = 0.02 (config.py risk_free_rate),
  * premium-adjusted delta = bs_delta − price/spot (Alexander et al.
  * 2023, arXiv:2107.12041 — cited by greeks.py:22-25).
  */
object Greeks {

  val DaysPerYear = 365.25
  val SecondsPerYear: Double = DaysPerYear * 24 * 3600 // 31557600.0
  val DefaultRiskFreeRate = 0.02

  /** M1+M2: adds T, bs_delta, adjusted_delta, gamma, vega, theta.
    * F8 validity mask: rows with T<=0, iv<=0, spot<=0 or strike<=0
    * (or nulls) get null Greeks. Intermediates are real columns so the
    * DuckDB oracle can mirror the arithmetic stage by stage. */
  def withGreeks(
      df: DataFrame,
      spotCol: String = "spot_price",
      ivCol: String = "iv",
      r: Double = DefaultRiskFreeRate,
      keepInternals: Boolean = false): DataFrame = {
    val spot = col(spotCol)
    val iv = col(ivCol)
    val out = df
      .withColumn("T",
        (unix_timestamp(col("expiry").cast("timestamp"))
          - unix_timestamp(col("timestamp"))) / lit(SecondsPerYear))
      .withColumn("_valid",
        col("T") > 0 && iv > 0 && spot > 0 && col("strike") > 0)
      .withColumn("_sqrtT", when(col("_valid"), sqrt(col("T"))))
      .withColumn("_d1", when(col("_valid"),
        (log(spot / col("strike")) + (lit(r) + iv * iv / 2.0) * col("T"))
          / (iv * col("_sqrtT"))))
      .withColumn("_d2", col("_d1") - iv * col("_sqrtT"))
      .withColumn("_x1", col("_d1") / math.sqrt(2.0))
      .withColumn("_x2", col("_d2") / math.sqrt(2.0))
      .withColumn("_erf1", GraftColumns.erf(col("_x1")))
      .withColumn("_erf2", GraftColumns.erf(col("_x2")))
      .withColumn("_cdf1", lit(0.5) * (lit(1.0) + col("_erf1")))
      .withColumn("_cdf2", lit(0.5) * (lit(1.0) + col("_erf2")))
      .withColumn("_cdfn2", lit(0.5) * (lit(1.0) - col("_erf2")))
      .withColumn("_pdf1",
        exp(-(col("_d1") * col("_d1")) / 2.0)
          / lit(math.sqrt(2.0 * math.Pi)))
      .withColumn("bs_delta",
        when(col("option_type") === "C", col("_cdf1"))
          .otherwise(col("_cdf1") - 1.0))
      .withColumn("gamma", col("_pdf1") / (spot * iv * col("_sqrtT")))
      .withColumn("vega", spot * col("_pdf1") * col("_sqrtT") / 100.0)
      .withColumn("theta",
        when(col("option_type") === "C",
          (-(spot * col("_pdf1") * iv)) / (lit(2.0) * col("_sqrtT"))
            - lit(r) * col("strike") * exp(-(lit(r) * col("T"))) * col("_cdf2"))
          .otherwise(
            (-(spot * col("_pdf1") * iv)) / (lit(2.0) * col("_sqrtT"))
              + lit(r) * col("strike") * exp(-(lit(r) * col("T"))) * col("_cdfn2"))
          / lit(DaysPerYear))
      .withColumn("adjusted_delta", col("bs_delta") - col("price") / spot)
    if (keepInternals) out
    else out.drop("_valid", "_sqrtT", "_d1", "_d2", "_x1", "_x2",
      "_erf1", "_erf2", "_cdf1", "_cdf2", "_cdfn2", "_pdf1")
  }

  /** M33: second-order Greeks — vanna (∂Δ/∂σ), vomma (∂vega/∂σ, per
    * 1% vol like vega) and charm (delta decay, per day like theta) —
    * the cross-risks a vol desk hedges once delta/gamma/vega are
    * flat. Same row-level chain as [[withGreeks]] (whose internals
    * this reuses — one shared d1/d2/φ evaluation, no second erf),
    * identical for calls and puts at q = 0. */
  def secondOrderGreeks(
      df: DataFrame,
      spotCol: String = "spot_price",
      ivCol: String = "iv",
      r: Double = DefaultRiskFreeRate): DataFrame = {
    val spot = col(spotCol)
    val iv = col(ivCol)
    val g = withGreeks(df, spotCol, ivCol, r, keepInternals = true)
    g
      .withColumn("vanna", -(col("_pdf1") * col("_d2")) / iv)
      .withColumn("vomma",
        spot * col("_pdf1") * col("_sqrtT") * col("_d1") * col("_d2")
          / iv / 100.0)
      .withColumn("charm",
        -(col("_pdf1") * (lit(2.0 * r) * col("T")
          - col("_d2") * iv * col("_sqrtT")))
          / (lit(2.0) * col("T") * iv * col("_sqrtT"))
          / lit(DaysPerYear))
      .drop("_valid", "_sqrtT", "_d1", "_d2", "_x1", "_x2",
        "_erf1", "_erf2", "_cdf1", "_cdf2", "_cdfn2", "_pdf1")
  }

  /** A14: position-weighted portfolio Greeks over valid rows + dollar
    * delta/gamma at the median spot (greeks.py:173-238). */
  def portfolioGreeks(
      greeks: DataFrame,
      positionCol: String = "amount",
      spotCol: String = "spot_price"): DataFrame =
    greeks
      .filter(col("adjusted_delta").isNotNull)
      .agg(
        Parity.dsum(col("adjusted_delta") * col(positionCol)).as("net_delta"),
        Parity.dsum(col("gamma") * col(positionCol)).as("net_gamma"),
        Parity.dsum(col("vega") * col(positionCol)).as("net_vega"),
        Parity.dsum(col("theta") * col(positionCol)).as("net_theta"),
        median(col(spotCol)).as("spot_median"))
      .withColumn("dollar_delta", col("net_delta") * col("spot_median"))
      .withColumn("dollar_gamma", col("net_gamma") * col("spot_median"))

  /** A15: mean/std/count of each Greek per bucket (greeks.py:241-264,
    * pandas .agg(["mean","std","count"]) → sample std). */
  def greeksByBucket(
      greeks: DataFrame,
      bucketCol: String = "moneyness_bucket"): DataFrame = {
    val greekCols =
      Seq("bs_delta", "adjusted_delta", "gamma", "vega", "theta")
    val aggs: Seq[Column] = greekCols.flatMap { g =>
      Seq(
        Parity.davg(col(g)).as(s"${g}_mean"),
        Parity.dstddevSamp(col(g)).as(s"${g}_std"),
        count(col(g)).as(s"${g}_count"))
    }
    greeks.groupBy(col(bucketCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** M19: delta-hedged P&L replay — per (underlying, expiry), walk
    * each instrument's trade sequence and accumulate the option leg
    * (Δprice) against the hedge leg (previous adjusted delta ×
    * Δspot); hedged P&L = option − hedge. The classic check that the
    * smile's deltas actually hedge (the reference computes the
    * deltas, reference `features/greeks.py:14-25`, but never replays
    * them).
    *
    * Shape: ONE instrument-keyed window exchange over the enriched
    * tape (lag price/spot/delta in a single window), then an
    * expiry-keyed hash aggregate. Exactness: Δprice terms are exact
    * 2-dp doubles (dsum-safe); the hedge term carries an erf-derived
    * delta — a ≤1-ulp transcendental — so it is 6-dp-quantized
    * (roundTo) before its exact decimal sum, the same contract as
    * every transcendental sum in the repo. */
  def hedgedPnl(greeks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("instrument_name"))
      .orderBy(unix_timestamp(col("timestamp")), col("trade_id"))
    val stepped = greeks
      .filter(col("adjusted_delta").isNotNull && col("spot_price") > 0)
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("prev_spot", lag(col("spot_price"), 1).over(w))
      .withColumn("prev_delta", lag(col("adjusted_delta"), 1).over(w))
      .filter(col("prev_price").isNotNull)
    val hedgeTerm = Parity.roundTo(
      col("prev_delta") * (col("spot_price") - col("prev_spot")), 6)
    stepped
      .groupBy(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"))
      .agg(
        count(lit(1)).as("n_steps"),
        Parity.dsum(col("price") - col("prev_price")).as("option_pnl"),
        Parity.dsum(hedgeTerm).as("hedge_pnl"))
      .withColumn("hedged_pnl", col("option_pnl") - col("hedge_pnl"))
  }

  /** M23: Taylor P&L attribution — decompose each instrument's
    * step-to-step price change into the classic greek ladder taken at
    * the PREVIOUS quote (delta·ΔS + ½γ·ΔS² + vega·Δσ + θ·Δt) and
    * surface the unexplained residual per (underlying, expiry). The
    * desk-level "P&L explain" report the reference computes greeks
    * FOR (features/greeks.py) but never assembles. Delta is the
    * premium-adjusted (inverse-quote) delta — the hedge ratio m19
    * replays; vega is per vol point so Δσ is scaled ×100; theta is
    * per calendar day so Δt is epoch-seconds/86400.
    *
    * Shape: same single instrument-keyed window exchange as
    * [[hedgedPnl]] (all lags ride one window), then one expiry-keyed
    * hash aggregate; residual is post-aggregate column arithmetic.
    * Exactness: every greek-carrying product is 6-dp-quantized before
    * its exact decimal sum (the repo-wide transcendental-sum
    * contract); ΔS/Δprice/Δσ/Δt are exact doubles by construction. */
  def pnlAttribution(greeks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("instrument_name"))
      .orderBy(col("ep"), col("trade_id"))
    val stepped = greeks
      .withColumn("ep", unix_timestamp(col("timestamp")))
      .filter(col("adjusted_delta").isNotNull && col("spot_price") > 0)
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("prev_spot", lag(col("spot_price"), 1).over(w))
      .withColumn("prev_iv", lag(col("iv"), 1).over(w))
      .withColumn("prev_ep", lag(col("ep"), 1).over(w))
      .withColumn("prev_delta", lag(col("adjusted_delta"), 1).over(w))
      .withColumn("prev_gamma", lag(col("gamma"), 1).over(w))
      .withColumn("prev_vega", lag(col("vega"), 1).over(w))
      .withColumn("prev_theta", lag(col("theta"), 1).over(w))
      .filter(col("prev_price").isNotNull)
    val dS = col("spot_price") - col("prev_spot")
    val deltaTerm = Parity.roundTo(col("prev_delta") * dS, 6)
    val gammaTerm = Parity.roundTo(lit(0.5) * col("prev_gamma") * dS * dS, 6)
    val vegaTerm = Parity.roundTo(
      col("prev_vega") * ((col("iv") - col("prev_iv")) * 100.0), 6)
    val thetaTerm = Parity.roundTo(
      col("prev_theta") *
        ((col("ep") - col("prev_ep")).cast("double") / 86400.0), 6)
    stepped
      .groupBy(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"))
      .agg(
        count(lit(1)).as("n_steps"),
        Parity.dsum(col("price") - col("prev_price")).as("option_pnl"),
        Parity.dsum(deltaTerm).as("delta_pnl"),
        Parity.dsum(gammaTerm).as("gamma_pnl"),
        Parity.dsum(vegaTerm).as("vega_pnl"),
        Parity.dsum(thetaTerm).as("theta_pnl"))
      .withColumn("explained_pnl",
        col("delta_pnl") + col("gamma_pnl") + col("vega_pnl") +
          col("theta_pnl"))
      .withColumn("residual_pnl", col("option_pnl") - col("explained_pnl"))
  }

  /** A33: gamma-exposure (GEX) profile by strike — the dealer-gamma
    * map options desks read for pin/flip levels: per (underlying,
    * strike), Σ γ·size·S²·1% signed by option side (calls +, puts −,
    * the standard dealer-short-put convention), volume-weighted
    * (the tape carries traded size, not open interest — documented
    * proxy), plus the cumulative profile in strike order and the
    * sign-flip flag (the "gamma flip" strike).
    *
    * Shape: one (underlying, strike)-keyed hash aggregate over the
    * greeks tape (map-side partials), then windows over the
    * strike-ladder-sized table (bounded: strikes per underlying).
    * Exactness: γ is 12-dp-quantized per row (the ≤1-ulp erf/exp
    * contract of m1); every sum AND the cumulative profile stay in
    * DECIMAL — a double running sum would differ between Spark's
    * running frame and DuckDB's segment tree — and only the final
    * columns cast to double. */
  def gammaExposure(greeks: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val sign = when(col("option_type") === "C", 1.0).otherwise(-1.0)
    val gex = Parity.roundTo(col("gamma"), 12) * col("amount") *
      col("spot_price") * col("spot_price") * lit(0.01) * sign
    val perStrike = greeks
      .filter(col("gamma").isNotNull && col("spot_price") > 0)
      .withColumn("_gex", gex)
      .groupBy(col("underlying"), col("strike"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(col("_gex").cast(dec)).as("_gd"),
        sum(when(col("option_type") === "C", col("_gex"))
          .cast(dec)).as("_gc"),
        sum(when(col("option_type") === "P", col("_gex"))
          .cast(dec)).as("_gp"))
    val w = Window.partitionBy(col("underlying")).orderBy(col("strike"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perStrike
      .withColumn("_cum", sum(col("_gd")).over(wCum))
      .withColumn("_prev", lag(col("_cum"), 1).over(w))
      .select(
        col("underlying"), col("strike"), col("n_trades"),
        col("_gc").cast("double").as("gex_calls"),
        col("_gp").cast("double").as("gex_puts"),
        col("_gd").cast("double").as("gex_net"),
        col("_cum").cast("double").as("cum_gex"),
        (col("_prev").isNotNull &&
          ((col("_cum") >= 0) =!= (col("_prev") >= 0))).as("is_flip"))
  }
}
