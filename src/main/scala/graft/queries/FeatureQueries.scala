package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.options.SyntheticTrades
import graft.util.Parity
import graft.util.Parity._

/** Correctness entries for the alpha-feature operators: contract
  * selection (A1/F6/J1), spot enrichment (A17/J2/P5/P6), moneyness
  * aggregations (A8/A9/P12), PCR (A6), term structure (A7). */
object FeatureQueries {

  private def trades(s: SparkSession, dir: String): DataFrame =
    SyntheticTrades.trades(s, dir)

  private[queries] def enrichedSpot(s: SparkSession, dir: String): DataFrame =
    SpotProvider.enrichWithSpot(
      trades(s, dir),
      SpotProvider.spotBars(SyntheticTrades.spotTicks(s, dir)))

  // ---- A1: front-month selection ----

  private def frontMonthDf(s: SparkSession, dir: String): DataFrame =
    ContractSelector.frontMonth(trades(s, dir), col("trade_id"))

  private def contractsOut(df: DataFrame, extra: org.apache.spark.sql.Column*)
      : DataFrame =
    df.select(Seq(
      col("bucket_start"), col("underlying"),
      Parity.epochS(col("timestamp")).as("ep"),
      col("instrument_name"), col("strike"),
      col("expiry").cast("string").as("expiry"),
      col("option_type"), col("iv"), col("price"), col("amount"),
      col("direction"), col("index_price")) ++ extra: _*)

  def a1FrontMonth(s: SparkSession, dir: String): DataFrame =
    contractsOut(frontMonthDf(s, dir))

  /** Front-month CTE: whole-row selection of the min-key row per
    * (bar, underlying) — the oracle twin of min_by(struct, key).
    * row_number (not per-column arg_min: DuckDB's arg_min skips NULL
    * args, which would mix columns from different rows when iv or
    * index_price is null). Key = dte*1e13 + trade_id is row-unique. */
  private val selCte: String =
    s"""${OracleCtes.enriched},
       |sel AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(dte AS BIGINT) * 10000000000000
       |      + CAST(trade_id AS BIGINT) AS sel_key
       |    FROM enriched
       |  )
       |  QUALIFY row_number() OVER (
       |    PARTITION BY bucket_start, underlying ORDER BY sel_key) = 1
       |)""".stripMargin

  private val contractsCols =
    """bucket_start, underlying, ep, instrument_name, strike,
      |  CAST(expiry AS VARCHAR) AS expiry, option_type, iv, price,
      |  amount, direction, index_price""".stripMargin

  val a1Oracle: String =
    s"""WITH $selCte
       |SELECT $contractsCols FROM sel""".stripMargin

  // ---- F6: + ATM band ----

  def f6Atm(s: SparkSession, dir: String): DataFrame =
    contractsOut(ContractSelector.atmFilter(frontMonthDf(s, dir)))

  val f6Oracle: String =
    s"""WITH $selCte
       |SELECT $contractsCols FROM sel
       |WHERE strike / index_price BETWEEN 0.95 AND 1.05""".stripMargin

  // ---- J1: + daily liquidity floor (window form) ----

  def j1Liquid(s: SparkSession, dir: String): DataFrame =
    contractsOut(
      ContractSelector.liquidityFilter(
        ContractSelector.atmFilter(frontMonthDf(s, dir))),
      col("daily_volume"))

  val j1Oracle: String =
    s"""WITH $selCte,
       |atm AS (
       |  SELECT * FROM sel
       |  WHERE strike / index_price BETWEEN 0.95 AND 1.05
       |),
       |liq AS (
       |  SELECT *, CAST(sum(CAST(amount AS DECIMAL(28,6))) OVER (
       |    PARTITION BY instrument_name, bucket_start - bucket_start % 86400
       |  ) AS DOUBLE) AS daily_volume
       |  FROM atm
       |)
       |SELECT $contractsCols, daily_volume FROM liq
       |WHERE daily_volume >= 10.0""".stripMargin

  // ---- A17: spot bars ----

  def a17SpotBars(s: SparkSession, dir: String): DataFrame =
    SpotProvider.spotBars(SyntheticTrades.spotTicks(s, dir))

  val a17Oracle: String =
    s"""WITH ${OracleCtes.spotBars}
       |SELECT symbol, ts_bucket, close FROM spot_bars""".stripMargin

  // ---- J2/P5/P6: spot enrichment + moneyness ----

  def j2SpotEnrich(s: SparkSession, dir: String): DataFrame =
    enrichedSpot(s, dir).select(
      col("trade_id"),
      Parity.epochS(col("timestamp")).as("ep"),
      col("underlying"), col("strike"), col("index_price"),
      col("binance_spot"), col("spot_price"), col("moneyness"),
      SpotProvider.moneynessBucket(col("moneyness")).as("moneyness_bucket"))

  val j2Oracle: String =
    s"""WITH ${OracleCtes.enrichedSpot}
       |SELECT trade_id, ep, underlying, strike, index_price,
       |  binance_spot, spot_price, moneyness,
       |  ${OracleCtes.moneynessBucketCase("moneyness")} AS moneyness_bucket
       |FROM enriched_spot""".stripMargin

  // ---- A8: moneyness long aggregation ----

  def a8MoneynessLong(s: SparkSession, dir: String): DataFrame =
    Moneyness.aggregateLong(enrichedSpot(s, dir))

  private val bucketedCte: String =
    s"""${OracleCtes.enrichedSpot},
       |bucketed AS (
       |  SELECT bucket_start AS ts,
       |    ${OracleCtes.moneynessBucketCase("moneyness")} AS moneyness_bucket,
       |    iv, amount, option_type
       |  FROM enriched_spot
       |  WHERE moneyness > 0 AND iv > 0
       |)""".stripMargin

  val a8Oracle: String =
    s"""WITH $bucketedCte
       |SELECT ts, moneyness_bucket,
       |  ${duckDavg("iv")} AS iv_mean,
       |  ${duckStddevPop("iv")} AS iv_std,
       |  count(*) AS trade_count,
       |  ${duckDsum("amount")} AS total_volume,
       |  count(CASE WHEN option_type = 'C' THEN 1 END) AS call_count,
       |  count(CASE WHEN option_type = 'P' THEN 1 END) AS put_count
       |FROM bucketed
       |GROUP BY ts, moneyness_bucket""".stripMargin

  // ---- A9/P12: moneyness wide + smile ----

  def a9MoneynessSmile(s: SparkSession, dir: String): DataFrame =
    Moneyness.aggregateWide(enrichedSpot(s, dir))

  val a9Oracle: String = {
    def ivIf(b: String) = s"CASE WHEN moneyness_bucket = '$b' THEN iv END"
    def amtIf(b: String) = s"CASE WHEN moneyness_bucket = '$b' THEN amount END"
    def cntIf(b: String) = s"count(CASE WHEN moneyness_bucket = '$b' THEN 1 END)"
    s"""WITH $bucketedCte,
       |wide AS (
       |  SELECT ts,
       |    ${duckDavg(ivIf("atm"))} AS atm_iv_mean,
       |    ${duckStddevPop(ivIf("atm"))} AS atm_iv_std,
       |    ${cntIf("atm")} AS atm_count,
       |    coalesce(${duckDsum(amtIf("atm"))}, 0.0) AS atm_volume,
       |    ${duckDavg(ivIf("otm_put"))} AS otm_put_iv_mean,
       |    ${duckStddevPop(ivIf("otm_put"))} AS otm_put_iv_std,
       |    ${cntIf("otm_put")} AS otm_put_count,
       |    coalesce(${duckDsum(amtIf("otm_put"))}, 0.0) AS otm_put_volume,
       |    ${duckDavg(ivIf("otm_call"))} AS otm_call_iv_mean,
       |    ${duckStddevPop(ivIf("otm_call"))} AS otm_call_iv_std,
       |    ${cntIf("otm_call")} AS otm_call_count,
       |    coalesce(${duckDsum(amtIf("otm_call"))}, 0.0) AS otm_call_volume,
       |    ${duckDavg(ivIf("deep_otm_put"))} AS deep_otm_put_iv_mean,
       |    ${cntIf("deep_otm_put")} AS deep_otm_put_count,
       |    ${duckDavg(ivIf("deep_otm_call"))} AS deep_otm_call_iv_mean,
       |    ${cntIf("deep_otm_call")} AS deep_otm_call_count
       |  FROM bucketed
       |  GROUP BY ts
       |  HAVING ${cntIf("atm")} > 0
       |)
       |SELECT *,
       |  otm_put_iv_mean - otm_call_iv_mean AS put_call_skew,
       |  (otm_put_iv_mean + otm_call_iv_mean) / 2.0 - atm_iv_mean
       |    AS smile_curvature,
       |  deep_otm_put_iv_mean / nullif(deep_otm_call_iv_mean, 0.0)
       |    AS wing_ratio,
       |  (otm_put_iv_mean - atm_iv_mean) / 0.05 AS smile_slope_put,
       |  (otm_call_iv_mean - atm_iv_mean) / 0.05 AS smile_slope_call,
       |  (otm_put_iv_mean - atm_iv_mean) / 0.05
       |    - (otm_call_iv_mean - atm_iv_mean) / 0.05 AS smile_asymmetry
       |FROM wide""".stripMargin
  }

  // ---- A6: PCR by tenor ----

  def a6Pcr(s: SparkSession, dir: String): DataFrame =
    Pcr.pcrByTenor(trades(s, dir))

  val a6Oracle: String =
    s"""WITH ${OracleCtes.enriched}
       |SELECT bucket_start, dte_bucket,
       |  coalesce(${duckDsum("CASE WHEN option_type = 'P' THEN amount END")}, 0.0)
       |    AS put_volume,
       |  coalesce(${duckDsum("CASE WHEN option_type = 'C' THEN amount END")}, 0.0)
       |    AS call_volume,
       |  coalesce(${duckDsum("CASE WHEN option_type = 'P' THEN amount END")}, 0.0)
       |    / nullif(coalesce(${duckDsum("CASE WHEN option_type = 'C' THEN amount END")}, 0.0), 0.0)
       |    AS pcr
       |FROM (SELECT *, ${OracleCtes.pcrBucketCase} AS dte_bucket FROM enriched)
       |WHERE dte_bucket IS NOT NULL
       |GROUP BY bucket_start, dte_bucket""".stripMargin

  // ---- A7: term structure slope + ratio ----

  def a7TermStructure(s: SparkSession, dir: String): DataFrame =
    TermStructure.termStructure(trades(s, dir))

  val a7Oracle: String =
    s"""WITH ${OracleCtes.enriched},
       |agg AS (
       |  SELECT bucket_start,
       |    ${duckDavg("CASE WHEN dte <= 30 THEN iv END")} AS near_iv,
       |    ${duckDavg("CASE WHEN dte >= 60 THEN iv END")} AS far_iv
       |  FROM enriched
       |  GROUP BY bucket_start
       |)
       |SELECT bucket_start, near_iv, far_iv,
       |  near_iv - far_iv AS slope,
       |  near_iv / nullif(far_iv, 0.0) AS ratio
       |FROM agg
       |WHERE near_iv IS NOT NULL AND far_iv IS NOT NULL""".stripMargin

  // ---- A34: Theil–Sen robust term-curve slope ----

  def a34TheilSen(s: SparkSession, dir: String): DataFrame =
    TermStructure.theilSenSlope(trades(s, dir))

  /** Mirrors [[TermStructure.theilSenSlope]]: bucket-mid CASE over
    * the shared DTE set (mid literals via duckDoubleLit so both
    * engines fold identical doubles), exact-decimal mean IV panel,
    * pairwise slopes via a bounded self-join (≤ 15 pairs per
    * (underlying, day)), median = element at rank (n+1) div 2. */
  val a34Oracle: String = {
    val midCase = DteBuckets.buckets
      .map { case (lo, hi) =>
        s"WHEN dte BETWEEN $lo AND $hi THEN ${duckDoubleLit((lo + hi) / 2.0)}"
      }
      .mkString("CASE ", " ", " ELSE NULL END")
    s"""WITH ${OracleCtes.enriched},
       |m AS (
       |  SELECT underlying, ep // 86400 AS day, mid,
       |    ${duckDavg("iv")} AS miv
       |  FROM (SELECT *, $midCase AS mid FROM enriched
       |        WHERE iv IS NOT NULL)
       |  WHERE mid IS NOT NULL
       |  GROUP BY 1, 2, 3
       |),
       |p AS (
       |  SELECT a.underlying, a.day,
       |    (b.miv - a.miv) / (b.mid - a.mid) AS slope
       |  FROM m a JOIN m b
       |    ON b.underlying = a.underlying AND b.day = a.day
       |    AND a.mid < b.mid
       |),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY underlying, day
       |      ORDER BY slope) AS rn,
       |    count(*) OVER (PARTITION BY underlying, day) AS n
       |  FROM p
       |)
       |SELECT underlying, day, n AS n_pairs, slope AS ts_slope
       |FROM r WHERE rn = (n + 1) // 2""".stripMargin
  }

  // ---- J5: exact as-of spot lookup (beyond the reference's 15-min
  // bucket quantization; oracle = DuckDB's native ASOF LEFT JOIN) ----

  def j5AsofSpot(s: SparkSession, dir: String): DataFrame = {
    val spot = SyntheticTrades.spotTicks(s, dir)
      .select(col("symbol").as("underlying"), col("timestamp"),
        col("close"))
    AsOfJoin.asOf(
      trades(s, dir).select("trade_id", "underlying", "timestamp"),
      spot,
      key = "underlying", leftTime = "timestamp", rightTime = "timestamp",
      rightVal = "close", asofCol = "asof_spot")
      .select(col("trade_id"), Parity.epochS(col("timestamp")).as("ep"),
        col("underlying"), col("asof_spot"))
  }

  val j5Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |${SyntheticTrades.spotCte},
       |sd AS (
       |  SELECT symbol, date_trunc('microseconds', "timestamp") AS ts,
       |    max(close) AS close
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |tl AS (
       |  SELECT trade_id, underlying,
       |    date_trunc('microseconds', "timestamp") AS ts,
       |    ${duckEpochS("\"timestamp\"")} AS ep
       |  FROM trades
       |)
       |SELECT trade_id, ep, underlying, sd.close AS asof_spot
       |FROM tl ASOF LEFT JOIN sd
       |  ON tl.underlying = sd.symbol AND sd.ts <= tl.ts""".stripMargin

  // ---- J8: as-of with freshness tolerance (pandas merge_asof
  // tolerance=; oracle = DuckDB ASOF + age CASE on the matched ts) ----

  private val J8TolSec = 600L

  def j8AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val spot = SyntheticTrades.spotTicks(s, dir)
      .select(col("symbol").as("underlying"), col("timestamp"),
        col("close"))
    AsOfJoin.asOfTolerance(
      trades(s, dir).select("trade_id", "underlying", "timestamp"),
      spot,
      key = "underlying", leftTime = "timestamp", rightTime = "timestamp",
      rightVal = "close", asofCol = "asof_spot", tolSec = J8TolSec)
      .select(col("trade_id"), Parity.epochS(col("timestamp")).as("ep"),
        col("underlying"), col("asof_spot"), col("asof_age_sec"),
        col("is_fresh"))
  }

  val j8Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |${SyntheticTrades.spotCte},
       |sd AS (
       |  SELECT symbol, date_trunc('microseconds', "timestamp") AS ts,
       |    max(close) AS close
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |tl AS (
       |  SELECT trade_id, underlying,
       |    date_trunc('microseconds', "timestamp") AS ts,
       |    ${duckEpochS("\"timestamp\"")} AS ep,
       |    epoch_us(date_trunc('microseconds', "timestamp")) AS us
       |  FROM trades
       |),
       |m AS (
       |  SELECT tl.trade_id, tl.ep, tl.underlying, sd.close,
       |    (tl.us - epoch_us(sd.ts)) // 1000000 AS asof_age_sec
       |  FROM tl ASOF LEFT JOIN sd
       |    ON tl.underlying = sd.symbol AND sd.ts <= tl.ts
       |)
       |SELECT trade_id, ep, underlying,
       |  CASE WHEN coalesce(asof_age_sec <= $J8TolSec, FALSE)
       |       THEN close END AS asof_spot,
       |  asof_age_sec,
       |  coalesce(asof_age_sec <= $J8TolSec, FALSE) AS is_fresh
       |FROM m""".stripMargin

  // ---- J7: nearest-temporal spot lookup (bidirectional as-of;
  // oracle = two native DuckDB ASOF joins + the tie-backward CASE) ----

  def j7NearestSpot(s: SparkSession, dir: String): DataFrame = {
    val spot = SyntheticTrades.spotTicks(s, dir)
      .select(col("symbol").as("underlying"), col("timestamp"),
        col("close"))
    graft.operators.NearestJoin.nearest(
      trades(s, dir).select("trade_id", "underlying", "timestamp"),
      spot,
      key = "underlying", leftTime = "timestamp", rightTime = "timestamp",
      rightVal = "close", valCol = "near_spot", deltaCol = "delta_us")
      .select(col("trade_id"), Parity.epochS(col("timestamp")).as("ep"),
        col("underlying"), col("near_spot"), col("delta_us"))
  }

  val j7Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |${SyntheticTrades.spotCte},
       |sd AS (
       |  SELECT symbol, date_trunc('microseconds', "timestamp") AS ts,
       |    epoch_us(date_trunc('microseconds', "timestamp")) AS rts,
       |    max(close) AS close
       |  FROM spot_ticks GROUP BY 1, 2, 3
       |),
       |tl AS (
       |  SELECT trade_id, underlying,
       |    date_trunc('microseconds', "timestamp") AS ts,
       |    epoch_us(date_trunc('microseconds', "timestamp")) AS us,
       |    ${duckEpochS("\"timestamp\"")} AS ep
       |  FROM trades
       |),
       |b AS (
       |  SELECT tl.trade_id, tl.ep, tl.us, tl.underlying,
       |    sd.rts AS bts, sd.close AS bclose
       |  FROM tl ASOF LEFT JOIN sd
       |    ON tl.underlying = sd.symbol AND sd.ts <= tl.ts
       |),
       |f AS (
       |  SELECT tl.trade_id, sd.rts AS fts, sd.close AS fclose
       |  FROM tl ASOF LEFT JOIN sd
       |    ON tl.underlying = sd.symbol AND sd.ts >= tl.ts
       |)
       |SELECT b.trade_id, b.ep, b.underlying,
       |  CASE WHEN bclose IS NULL THEN fclose
       |       WHEN fclose IS NULL THEN bclose
       |       WHEN (us - bts) <= (fts - us) THEN bclose
       |       ELSE fclose END AS near_spot,
       |  CASE WHEN bclose IS NULL THEN fts - us
       |       WHEN fclose IS NULL THEN us - bts
       |       WHEN (us - bts) <= (fts - us) THEN us - bts
       |       ELSE fts - us END AS delta_us
       |FROM b JOIN f ON f.trade_id = b.trade_id""".stripMargin

  // ---- A35: butterfly arbitrage audit (strike convexity) ----

  /** A35: butterfly-arbitrage audit — the strike-axis companion to
    * m22's calendar check: a call price curve must be CONVEX in
    * strike, so for consecutive strikes k1<k2<k3 the mid price must
    * satisfy c2 ≤ ((k3−k2)·c1 + (k2−k1)·c3)/(k3−k1) (the general
    * unequal-spacing butterfly). Violations are free money — and on
    * real tapes, stale-quote detectors. Per (underlying, expiry,
    * option_type): strike count, triple count, violation count, and
    * the worst positive gap.
    *
    * Shape: last traded price per (underlying, expiry, type, strike)
    * is one bounded-group window (the m22 last-quote recipe with the
    * numeric trade_id tie-break), then lag/lead over strike inside
    * (underlying, expiry, type) — groups bounded by the strike grid
    * (17 here), never corpus-sized. Convexity algebra is identical
    * IEEE text both engines; the violation gap stays a raw double. */
  def a35ButterflyArb(s: SparkSession, dir: String): DataFrame =
    butterflyArb(trades(s, dir))

  /** Core audit over any trades-shaped frame (underlying, expiry,
    * option_type, strike, price, timestamp, trade_id). */
  def butterflyArb(tradesDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tradesDf
      .withColumn("ep", Parity.epochS(col("timestamp")))
      .withColumn("tidn", col("trade_id").cast("long"))
    val wLast = Window
      .partitionBy(col("underlying"), col("expiry"), col("option_type"),
        col("strike"))
      .orderBy(col("ep").desc, col("tidn").desc)
    val last = t
      .withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1)
      .select(col("underlying"), col("expiry"), col("option_type"),
        col("strike"), col("price"))
    val wK = Window
      .partitionBy(col("underlying"), col("expiry"), col("option_type"))
      .orderBy(col("strike"))
    last
      .withColumn("k1", lag(col("strike"), 1).over(wK))
      .withColumn("c1", lag(col("price"), 1).over(wK))
      .withColumn("k3", lead(col("strike"), 1).over(wK))
      .withColumn("c3", lead(col("price"), 1).over(wK))
      .withColumn("_interp", expr(butterflyInterpExpr))
      .withColumn("_gap", col("price") - col("_interp"))
      .groupBy(col("underlying"), col("expiry"), col("option_type"))
      .agg(
        count(lit(1)).as("n_strikes"),
        count(col("_interp")).as("n_triples"),
        count(when(col("_gap") > 0, lit(1))).as("n_violations"),
        max(when(col("_gap") > 0, col("_gap"))).as("worst_gap"))
      .select(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry"),
        col("option_type"), col("n_strikes"), col("n_triples"),
        col("n_violations"), col("worst_gap"))
  }

  /** Unequal-spacing butterfly bound — shared text (k1/k3 = lag/lead
    * strikes, c1/c3 their prices, strike/price the middle leg). */
  val butterflyInterpExpr: String =
    "((k3 - strike) * c1 + (strike - k1) * c3) / (k3 - k1)"

  val a35Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |lastq AS (
       |  SELECT underlying, expiry, option_type, strike, price
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY underlying, expiry, option_type, strike
       |      ORDER BY ${duckEpochS("\"timestamp\"")} DESC,
       |        CAST(trade_id AS BIGINT) DESC) AS rn
       |    FROM trades
       |  ) WHERE rn = 1
       |),
       |tri AS (
       |  SELECT *,
       |    lag(strike) OVER w AS k1, lag(price) OVER w AS c1,
       |    lead(strike) OVER w AS k3, lead(price) OVER w AS c3
       |  FROM lastq
       |  WINDOW w AS (PARTITION BY underlying, expiry, option_type
       |    ORDER BY strike)
       |),
       |g AS (
       |  SELECT *, price - ($butterflyInterpExpr) AS gap,
       |    $butterflyInterpExpr AS interp
       |  FROM tri
       |)
       |SELECT underlying, strftime(expiry, '%Y-%m-%d') AS expiry,
       |  option_type, count(*) AS n_strikes,
       |  count(interp) AS n_triples,
       |  count(CASE WHEN gap > 0 THEN 1 END) AS n_violations,
       |  max(CASE WHEN gap > 0 THEN gap END) AS worst_gap
       |FROM g GROUP BY 1, 2, 3""".stripMargin

  // ---- A31: IV surface grid (DTE x moneyness) with fill ----

  def a31SurfaceGrid(s: SparkSession, dir: String): DataFrame =
    graft.operators.SurfaceGrid.ivSurface(enrichedSpot(s, dir))

  val a31Oracle: String = {
    val mCase = graft.operators.SurfaceGrid.MBuckets.zipWithIndex
      .map { case (b, i) => s"WHEN '$b' THEN $i" }
      .mkString("CASE m_bucket ", " ", " ELSE -1 END")
    s"""WITH ${OracleCtes.enrichedSpot},
       |obs AS (
       |  SELECT underlying, ${OracleCtes.dteBucketCase} AS dte_bucket,
       |    ${OracleCtes.moneynessBucketCase("moneyness")} AS m_bucket,
       |    ${duckDavg("iv")} AS iv_obs, count(*) AS n_obs
       |  FROM enriched_spot
       |  WHERE moneyness > 0 AND iv > 0
       |    AND ${OracleCtes.dteBucketCase} IS NOT NULL
       |  GROUP BY 1, 2, 3
       |),
       |dense AS (
       |  SELECT DISTINCT o.underlying, o.dte_bucket, m.mb
       |  FROM obs o, (VALUES ('deep_otm_put'), ('otm_put'), ('atm'),
       |    ('otm_call'), ('deep_otm_call')) m(mb)
       |),
       |j AS (
       |  SELECT d.underlying, d.dte_bucket, d.mb AS m_bucket,
       |    o.iv_obs, o.n_obs
       |  FROM dense d LEFT JOIN obs o
       |    ON o.underlying = d.underlying AND o.dte_bucket = d.dte_bucket
       |    AND o.m_bucket = d.mb
       |),
       |ordd AS (SELECT *, $mCase AS m_ord FROM j),
       |f AS (
       |  SELECT *,
       |    last_value(iv_obs IGNORE NULLS) OVER (
       |      PARTITION BY underlying, dte_bucket ORDER BY m_ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_iv,
       |    first_value(iv_obs IGNORE NULLS) OVER (
       |      PARTITION BY underlying, dte_bucket ORDER BY m_ord
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_iv
       |  FROM ordd
       |)
       |SELECT underlying, dte_bucket, m_bucket, m_ord,
       |  CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs, iv_obs,
       |  coalesce(iv_obs, (prev_iv + next_iv) / 2.0, prev_iv, next_iv)
       |    AS iv_filled,
       |  CASE WHEN iv_obs IS NOT NULL THEN 'obs'
       |       WHEN prev_iv IS NOT NULL AND next_iv IS NOT NULL
       |         THEN 'interp'
       |       WHEN prev_iv IS NOT NULL OR next_iv IS NOT NULL THEN 'edge'
       |       ELSE 'empty' END AS fill_src
       |FROM f""".stripMargin
  }

  // ---- A16: count wrapper per contract-selection strategy ----

  def a16StrategyCounts(s: SparkSession, dir: String): DataFrame = {
    // fm/atm feed two branches each, but the branches are count-only:
    // recomputing the (fast, codegen'd) aggregate is cheaper than
    // writing its wide rows to a cache — measured, so deliberately NOT
    // materialized
    val fm = frontMonthDf(s, dir)
    val atm = ContractSelector.atmFilter(fm)
    val liq = ContractSelector.liquidityFilter(atm)
    def one(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_contracts"))
        .select(lit(name).as("strategy"), col("n_contracts"))
    one("front_month", fm)
      .unionAll(one("front_month_atm", atm))
      .unionAll(one("front_month_atm_liquid", liq))
  }

  val a16Oracle: String =
    s"""WITH $selCte,
       |atm AS (
       |  SELECT * FROM sel
       |  WHERE strike / index_price BETWEEN 0.95 AND 1.05
       |),
       |liq AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(sum(CAST(amount AS DECIMAL(28,6))) OVER (
       |      PARTITION BY instrument_name, bucket_start - bucket_start % 86400
       |    ) AS DOUBLE) AS daily_volume
       |    FROM atm
       |  ) WHERE daily_volume >= 10.0
       |)
       |SELECT 'front_month' AS strategy, count(*) AS n_contracts FROM sel
       |UNION ALL
       |SELECT 'front_month_atm', count(*) FROM atm
       |UNION ALL
       |SELECT 'front_month_atm_liquid', count(*) FROM liq""".stripMargin

  // ---- full feature pipeline (reference §3.3 compose-then-execute) ----

  /** The reference's nested-SQL-template lifecycle as ONE Catalyst
    * plan: front-month selection → ATM band → liquidity floor → spot
    * enrichment → moneyness aggregation (`contract_selector.py:117-191`
    * → `spot_provider.py:144-205` → `moneyness.py:136-170`). Each
    * stage is a DataFrame => DataFrame transform; Catalyst sees the
    * whole tree, so the reference's "filter in the innermost template"
    * discipline is recovered by pushdown automatically. */
  def p0Pipeline(s: SparkSession, dir: String): DataFrame = {
    val selected = frontMonthDf(s, dir)
      .transform(ContractSelector.atmFilter(_))
      .transform(ContractSelector.liquidityFilter(_))
    val enriched = SpotProvider.enrichWithSpot(
      selected,
      SpotProvider.spotBars(SyntheticTrades.spotTicks(s, dir)))
    Moneyness.aggregateLong(enriched)
  }

  val p0Oracle: String =
    s"""WITH $selCte,
       |atm AS (
       |  SELECT * FROM sel
       |  WHERE strike / index_price BETWEEN 0.95 AND 1.05
       |),
       |liq AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(sum(CAST(amount AS DECIMAL(28,6))) OVER (
       |      PARTITION BY instrument_name, bucket_start - bucket_start % 86400
       |    ) AS DOUBLE) AS daily_volume
       |    FROM atm
       |  ) WHERE daily_volume >= 10.0
       |),
       |${OracleCtes.spotBars},
       |pipe AS (
       |  SELECT l.bucket_start AS ts,
       |    ${OracleCtes.moneynessBucketCase(
             "l.strike / coalesce(l.index_price, s.close)")}
       |      AS moneyness_bucket,
       |    l.iv, l.amount, l.option_type,
       |    l.strike / coalesce(l.index_price, s.close) AS moneyness
       |  FROM liq l
       |  LEFT JOIN spot_bars s
       |    ON s.symbol = l.underlying AND s.ts_bucket = l.bucket_start
       |)
       |SELECT ts, moneyness_bucket,
       |  ${duckDavg("iv")} AS iv_mean,
       |  ${duckStddevPop("iv")} AS iv_std,
       |  count(*) AS trade_count,
       |  ${duckDsum("amount")} AS total_volume,
       |  count(CASE WHEN option_type = 'C' THEN 1 END) AS call_count,
       |  count(CASE WHEN option_type = 'P' THEN 1 END) AS put_count
       |FROM pipe
       |WHERE moneyness > 0 AND iv > 0
       |GROUP BY ts, moneyness_bucket""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "p0_pipeline_e2e" -> QueryDef(p0Pipeline _, p0Oracle),
    "a16_strategy_counts" -> QueryDef(a16StrategyCounts _, a16Oracle),
    "a1_front_month" -> QueryDef(a1FrontMonth _, a1Oracle),
    "f6_atm_contracts" -> QueryDef(f6Atm _, f6Oracle),
    "j1_liquid_contracts" -> QueryDef(j1Liquid _, j1Oracle),
    "a17_spot_bars" -> QueryDef(a17SpotBars _, a17Oracle),
    "j2_spot_enrich" -> QueryDef(j2SpotEnrich _, j2Oracle),
    "j5_asof_spot" -> QueryDef(j5AsofSpot _, j5Oracle),
    "j8_asof_tolerance" -> QueryDef(j8AsofTolerance _, j8Oracle),
    "j7_nearest_spot" -> QueryDef(j7NearestSpot _, j7Oracle),
    "a31_surface_grid" -> QueryDef(a31SurfaceGrid _, a31Oracle),
    "a8_moneyness_long" -> QueryDef(a8MoneynessLong _, a8Oracle),
    "a9_moneyness_smile" -> QueryDef(a9MoneynessSmile _, a9Oracle),
    "a6_pcr_by_tenor" -> QueryDef(a6Pcr _, a6Oracle),
    "a7_term_structure" -> QueryDef(a7TermStructure _, a7Oracle),
    "a34_theil_sen" -> QueryDef(a34TheilSen _, a34Oracle),
    "a35_butterfly_arb" -> QueryDef(a35ButterflyArb _, a35Oracle))
}
