package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{HarRv, OrderFlow, RealizedVol}
import org.apache.spark.sql.functions.col
import graft.options.SyntheticTrades
import graft.util.Parity._

/** Realized-volatility and order-flow entries (M7/M8/A19 — beyond
  * the reference: the price-path twin of the IV resample family that
  * the EGARCH spread analysis implies but the reference never
  * materializes, plus the microstructure read on `direction`). */
object VolQueries {

  private def trades(s: SparkSession, dir: String): DataFrame =
    SyntheticTrades.trades(s, dir)

  /** Shared oracle CTE: 15-min price OHLC bars (positive prices,
    * argMin/argMax open/close on unique timestamps) + day key. */
  private val pbCte: String =
    s"""${SyntheticTrades.tradesCte},
       |pb AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    arg_min(price, "timestamp") AS open,
       |    max(price) AS high, min(price) AS low,
       |    arg_max(price, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |pbd AS (
       |  SELECT *, bucket_start - bucket_start % 86400 AS day_start
       |  FROM pb
       |)""".stripMargin

  def m7RealizedVol(s: SparkSession, dir: String): DataFrame =
    RealizedVol.dailyEstimators(trades(s, dir))

  /** Every per-bar term quantized (duckRoundTo) before the exact
    * DECIMAL sum; the two transcendental coefficients are spelled via
    * duckDoubleLit so both engines fold bit-identical constants. */
  val m7Oracle: String = {
    val kp = duckDoubleLit(RealizedVol.ParkinsonCoef)
    val kgk = duckDoubleLit(RealizedVol.GkCoef)
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    s"""WITH $pbCte,
       |terms AS (
       |  SELECT underlying, bucket_start, day_start, close,
       |    ${duckRoundTo("ln(high/low)*ln(high/low)", 6)} AS lhl2,
       |    ${duckRoundTo(
               s"0.5*ln(high/low)*ln(high/low) - $kgk*ln(close/open)*ln(close/open)",
               6)} AS gk,
       |    ${duckRoundTo(
               "ln(high/close)*ln(high/open) + ln(low/close)*ln(low/open)",
               6)} AS rs
       |  FROM pbd
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

  /** M48: HAR-RV (Corsi 2009) pooled OLS per underlying over the m7
    * daily rv series ([[graft.operators.HarRv]]). The oracle rebuilds
    * the same rv chain and runs the IDENTICAL generated Cramer text —
    * the scale-4 decimal gate upstream is what lets a 24-term
    * alternating determinant hash-match across engines. */
  def m48HarRv(s: SparkSession, dir: String): DataFrame =
    HarRv.fit(RealizedVol.dailyEstimators(trades(s, dir))
      .select(col("underlying"), col("day_start"), col("rv_cc")))

  val m48Oracle: String = {
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start, bucket_start,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM pbd
       |),
       |rvd AS (
       |  SELECT underlying, day_start,
       |    coalesce($rvSum, 0.0::DOUBLE) AS rv_cc
       |  FROM rets GROUP BY 1, 2
       |),
       |${HarRv.duckTail}""".stripMargin
  }

  /** M51: Holt's linear (double exponential) smoothing over the same
    * daily log-close panel as m49 ([[graft.operators.HoltLinear]]) —
    * the trend-aware forecaster the local-level filter lacks, in the
    * error-correction parameterization whose triangular state update
    * stays bit-identical under DuckDB's in-order struct mutation. */
  def m51Holt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{log => flog, max_by}
    val daily = RealizedVol.priceBars(trades(s, dir))
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .groupBy(col("underlying"), col("day_start"))
      .agg(max_by(col("close"), col("bucket_start")).as("dclose"))
      .select(col("underlying"), col("day_start"),
        roundTo(flog(col("dclose")), 6).as("y"))
    graft.operators.HoltLinear.fit(daily)
  }

  val m51Oracle: String =
    s"""WITH $pbCte,
       |hdy AS (
       |  SELECT underlying, day_start,
       |    ${duckRoundTo("ln(arg_max(close, bucket_start))", 6)} AS y
       |  FROM pbd GROUP BY 1, 2
       |),
       |${graft.operators.HoltLinear.duckTail}""".stripMargin

  /** M49: local-level Kalman filter over daily log closes
    * ([[graft.operators.KalmanLevel]]) — the state-space trend/noise
    * split, run as a per-underlying higher-order fold (a recurrence
    * is sequential in time; the panel is calendar-bounded). The
    * oracle replays the IDENTICAL fold via list_reduce — pure
    * +,−,*,/ inside the loop, so the state matches bit-for-bit with
    * only the ln() input quantized. */
  def m49Kalman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{log => flog, max_by}
    val daily = RealizedVol.priceBars(trades(s, dir))
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .groupBy(col("underlying"), col("day_start"))
      .agg(max_by(col("close"), col("bucket_start")).as("dclose"))
      .select(col("underlying"), col("day_start"),
        roundTo(flog(col("dclose")), 6).as("y"))
    graft.operators.KalmanLevel.fit(daily)
  }

  val m49Oracle: String =
    s"""WITH $pbCte,
       |kdy AS (
       |  SELECT underlying, day_start,
       |    ${duckRoundTo("ln(arg_max(close, bucket_start))", 6)} AS y
       |  FROM pbd GROUP BY 1, 2
       |),
       |${graft.operators.KalmanLevel.duckTail}""".stripMargin

  /** M50: Mincer–Zarnowitz forecast evaluation — next-day realized
    * vol regressed on the 5-day accumulation forecast (α=0, β=1/5 for
    * an unbiased efficient forecast in the sum parameterization),
    * from the same capped-decimal moment machinery as m48. */
  def m50MzEval(s: SparkSession, dir: String): DataFrame =
    HarRv.mzEval(RealizedVol.dailyEstimators(trades(s, dir))
      .select(col("underlying"), col("day_start"), col("rv_cc")))

  val m50Oracle: String = {
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start, bucket_start,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM pbd
       |),
       |rvd AS (
       |  SELECT underlying, day_start,
       |    coalesce($rvSum, 0.0::DOUBLE) AS rv_cc
       |  FROM rets GROUP BY 1, 2
       |),
       |${HarRv.duckMzTail}""".stripMargin
  }

  def m40VolOfVol(s: SparkSession, dir: String): DataFrame =
    RealizedVol.volOfVol(trades(s, dir))

  /** Mirrors [[RealizedVol.volOfVol]]: the m7 rv chain, rv_vol
    * 6-dp-quantized into DECIMAL(10,6), DECIMAL(24,12)-gated moment
    * and lag-cross sums, shared Pearson spelling. */
  val m40Oracle: String = {
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,12)) AS DOUBLE)"
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM pbd
       |),
       |daily AS (
       |  SELECT underlying, day_start,
       |    CAST(${duckRoundTo(
               s"sqrt(coalesce($rvSum, 0.0::DOUBLE))", 6)}
       |      AS DECIMAL(10,6)) AS rq
       |  FROM rets GROUP BY 1, 2
       |),
       |chain AS (
       |  SELECT *, lag(rq) OVER (PARTITION BY underlying
       |    ORDER BY day_start) AS rp
       |  FROM daily
       |),
       |a AS (
       |  SELECT underlying, count(*) AS n_days,
       |    ${d24("sum(rq)")} AS _s, ${d24("sum(rq*rq)")} AS _s2,
       |    count(rp) AS _np,
       |    ${d24("sum(rp)")} AS _px,
       |    ${d24("sum(CASE WHEN rp IS NOT NULL THEN rq END)")} AS _py,
       |    ${d24("sum(rp*rq)")} AS _pxy,
       |    ${d24("sum(rp*rp)")} AS _pxx,
       |    ${d24("sum(CASE WHEN rp IS NOT NULL THEN rq*rq END)")} AS _pyy
       |  FROM chain GROUP BY 1
       |),
       |b AS (SELECT *, CAST(n_days AS DOUBLE) AS nd,
       |  CAST(_np AS DOUBLE) AS npd FROM a)
       |SELECT underlying, n_days, _s / nd AS mean_rv,
       |  sqrt(CASE WHEN (_s2 - _s*_s/nd) / nullif(nd - 1.0, 0.0) < 0
       |    THEN 0.0 ELSE (_s2 - _s*_s/nd) / nullif(nd - 1.0, 0.0) END)
       |    AS std_rv,
       |  CASE WHEN _np >= 2 THEN
       |    (npd*_pxy - _px*_py) / nullif(
       |      sqrt((npd*_pxx - _px*_px) * (npd*_pyy - _py*_py)), 0.0)
       |  END AS acf1_rv
       |FROM b""".stripMargin
  }

  def m39JumpTest(s: SparkSession, dir: String): DataFrame =
    RealizedVol.jumpTest(trades(s, dir))

  /** Mirrors [[RealizedVol.jumpTest]]: 6-dp-quantized r² and
    * |r_i||r_{i−1}| terms, exact decimal sums, the π/2 constant
    * multiplying the SUM once. */
  val m39Oracle: String = {
    val kbp = duckDoubleLit(RealizedVol.BipowerCoef)
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    val bpSum = duckDsum(duckRoundTo("abs(r)*abs(rp)", 6))
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start, bucket_start,
       |    ln(close / lag(close) OVER w) AS r
       |  FROM pbd
       |  WINDOW w AS (PARTITION BY underlying, day_start
       |    ORDER BY bucket_start)
       |),
       |chain AS (
       |  SELECT *, lag(r) OVER (PARTITION BY underlying, day_start
       |    ORDER BY bucket_start) AS rp
       |  FROM rets
       |),
       |a AS (
       |  SELECT underlying, day_start, count(r) AS n_returns,
       |    coalesce($rvSum, 0.0::DOUBLE) AS rv_cc,
       |    coalesce($bpSum, 0.0::DOUBLE) * $kbp AS bv
       |  FROM chain GROUP BY 1, 2
       |)
       |SELECT underlying, day_start, n_returns, rv_cc, bv,
       |  CASE WHEN rv_cc > 0.0 AND n_returns >= 2 THEN
       |    greatest(0.0, 1.0 - bv / rv_cc) END AS jump_frac
       |FROM a""".stripMargin
  }

  def m42Semivariance(s: SparkSession, dir: String): DataFrame =
    RealizedVol.semivariance(trades(s, dir))

  /** Mirrors [[RealizedVol.semivariance]]: m7's day-partitioned lag
    * chain, 6-dp-quantized r², conditional decimal sums for the
    * up/down legs inside ONE aggregate. */
  val m42Oracle: String = {
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    val upSum = duckDsum(s"CASE WHEN r > 0 THEN ${duckRoundTo("r*r", 6)} END")
    val dnSum = duckDsum(s"CASE WHEN r < 0 THEN ${duckRoundTo("r*r", 6)} END")
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM pbd
       |),
       |a AS (
       |  SELECT underlying, day_start, count(r) AS n_returns,
       |    coalesce($rvSum, 0.0::DOUBLE) AS rv_cc,
       |    coalesce($upSum, 0.0::DOUBLE) AS rsv_up,
       |    coalesce($dnSum, 0.0::DOUBLE) AS rsv_down
       |  FROM rets GROUP BY 1, 2
       |)
       |SELECT underlying, day_start, n_returns, rv_cc, rsv_up, rsv_down,
       |  rsv_up - rsv_down AS signed_jump,
       |  rsv_down / nullif(rv_cc, 0.0) AS down_share
       |FROM a""".stripMargin
  }

  private val SignatureIntervals = Seq(60L, 300L, 900L, 3600L)

  def m43SignaturePlot(s: SparkSession, dir: String): DataFrame =
    RealizedVol.signaturePlot(trades(s, dir), SignatureIntervals)

  /** Mirrors [[RealizedVol.signaturePlot]]: ONE fine-bar (60 s) CTE,
    * coarse closes re-derived per interval as the close of the last
    * non-empty fine bar, m7's day-partitioned lag chain per
    * (underlying, interval), quantized exact sums. The interval
    * dimension is a 4-row unnest — the Spark side is the equivalent
    * union of four bar-sized projections. */
  val m43Oracle: String = {
    val ivList = SignatureIntervals.mkString("[", ", ", "]")
    s"""WITH ${SyntheticTrades.tradesCte},
       |fine AS (
       |  SELECT underlying, ep - ep % ${SignatureIntervals.min} AS fb,
       |    arg_max(price, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |ivs AS (SELECT CAST(unnest($ivList) AS BIGINT) AS interval_sec),
       |coarse AS (
       |  SELECT underlying, interval_sec,
       |    fb - fb % interval_sec AS cb,
       |    arg_max(close, fb) AS close
       |  FROM fine, ivs
       |  GROUP BY 1, 2, 3
       |),
       |rets AS (
       |  SELECT underlying, interval_sec,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, interval_sec, cb - cb % 86400
       |      ORDER BY cb)) AS r
       |  FROM coarse
       |)
       |SELECT underlying, interval_sec, count(r) AS n_returns,
       |  coalesce(${duckDsum(duckRoundTo("r*r", 6))}, 0.0::DOUBLE) AS rv
       |FROM rets GROUP BY 1, 2""".stripMargin
  }

  def m44OvernightIntraday(s: SparkSession, dir: String): DataFrame =
    RealizedVol.overnightIntraday(trades(s, dir))

  /** Mirrors [[RealizedVol.overnightIntraday]]: daily open/close
    * aggregate, lag chain, DECIMAL(10,6)-quantized legs,
    * DECIMAL(24,12)-gated moment sums, shared Welch variance text. */
  val m44Oracle: String = {
    import graft.operators.EventsAnalytics.welchVarExpr
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,12)) AS DOUBLE)"
    s"""WITH ${SyntheticTrades.tradesCte},
       |daily AS (
       |  SELECT underlying, ep - ep % 86400 AS day_start,
       |    arg_min(price, "timestamp") AS open,
       |    arg_max(price, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT *, lag(close) OVER (
       |    PARTITION BY underlying ORDER BY day_start) AS pc
       |  FROM daily
       |),
       |q AS (
       |  SELECT underlying,
       |    CAST(${duckRoundTo("ln(open / pc)", 6)} AS DECIMAL(10,6))
       |      AS on_q,
       |    CAST(${duckRoundTo("ln(close / open)", 6)} AS DECIMAL(10,6))
       |      AS id_q
       |  FROM rets
       |),
       |a AS (
       |  SELECT underlying, count(*) AS n_days, count(on_q) AS n_on,
       |    ${d24("sum(on_q)")} AS _so, ${d24("sum(on_q*on_q)")} AS _qo,
       |    ${d24("sum(id_q)")} AS _si, ${d24("sum(id_q*id_q)")} AS _qi
       |  FROM q GROUP BY 1
       |),
       |b AS (SELECT *, CAST(n_on AS DOUBLE) AS no,
       |  CAST(n_days AS DOUBLE) AS nd FROM a),
       |c AS (SELECT *, ${welchVarExpr("_qo", "_so", "no")} AS var_overnight,
       |  ${welchVarExpr("_qi", "_si", "nd")} AS var_intraday FROM b)
       |SELECT underlying, n_days, n_on, var_overnight, var_intraday,
       |  var_overnight / nullif(var_overnight + var_intraday, 0.0)
       |    AS overnight_share
       |FROM c""".stripMargin
  }

  def m47DownsideBeta(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpotCorr.downsideBeta(
      SyntheticTrades.spotTicks(s, dir))

  /** Mirrors [[graft.operators.SpotCorr.downsideBeta]]: the m11
    * aligned-return chain, sign-conditional decimal sums, shared
    * sided beta text. */
  val m47Oracle: String = {
    import graft.operators.SpotCorr
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,16)) AS DOUBLE)"
    def side(tag: String, cond: String) =
      s"""count(CASE WHEN $cond THEN 1 END) AS n_$tag,
         |    ${d24(s"sum(CASE WHEN $cond THEN xq END)")} AS sx_$tag,
         |    ${d24(s"sum(CASE WHEN $cond THEN yq END)")} AS sy_$tag,
         |    ${d24(s"sum(CASE WHEN $cond THEN xq * yq END)")} AS sxy_$tag,
         |    ${d24(s"sum(CASE WHEN $cond THEN xq * xq END)")} AS sxx_$tag"""
        .stripMargin
    s"""WITH ${SyntheticTrades.spotCte},
       |daily AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 86400 AS day,
       |    arg_max(close, "timestamp") AS close
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT symbol, day, close,
       |    lag(close) OVER (PARTITION BY symbol ORDER BY day) AS prev
       |  FROM daily
       |),
       |j AS (
       |  SELECT b.day,
       |    CAST(b.close / b.prev - 1.0 AS DECIMAL(12,8)) AS xq,
       |    CAST(e.close / e.prev - 1.0 AS DECIMAL(12,8)) AS yq
       |  FROM rets b JOIN rets e USING (day)
       |  WHERE b.symbol = 'BTC' AND e.symbol = 'ETH'
       |    AND b.prev IS NOT NULL AND e.prev IS NOT NULL
       |),
       |a AS (
       |  SELECT ${side("dn", "xq < 0")},
       |    ${side("up", "xq > 0")}
       |  FROM j
       |)
       |SELECT n_dn, n_up,
       |  ${SpotCorr.sideBetaExpr("dn")} AS beta_down,
       |  ${SpotCorr.sideBetaExpr("up")} AS beta_up,
       |  (${SpotCorr.sideBetaExpr("dn")})
       |    - (${SpotCorr.sideBetaExpr("up")}) AS beta_asym
       |FROM a""".stripMargin
  }

  def m45VarEs(s: SparkSession, dir: String): DataFrame =
    RealizedVol.varEs(trades(s, dir))

  /** Mirrors [[RealizedVol.varEs]]: daily closes, 6-dp-quantized
    * returns, the ceil-rank element pick and the rank-tail exact
    * decimal mean, restated per quantile. */
  val m45Oracle: String = {
    def cut(a: Int, b: Int) = s"(n * $a + ${b - 1}) // $b"
    def cols(a: Int, b: Int, nm: String) =
      s"""max(CASE WHEN rn = ${cut(a, b)} THEN rq END) AS var_$nm,
         |  ${duckDsum(s"CASE WHEN rn <= ${cut(a, b)} THEN rq END")}
         |    / CAST((max(n) * $a + ${b - 1}) // $b AS DOUBLE) AS es_$nm"""
        .stripMargin
    s"""WITH ${SyntheticTrades.tradesCte},
       |daily AS (
       |  SELECT underlying, ep - ep % 86400 AS day_start,
       |    arg_max(price, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT underlying, day_start,
       |    ${duckRoundTo(
             """ln(close / lag(close) OVER (
               |      PARTITION BY underlying ORDER BY day_start))""".stripMargin,
             6)} AS rq
       |  FROM daily
       |),
       |rk AS (
       |  SELECT underlying, day_start, rq,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY rq, day_start) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM rets WHERE rq IS NOT NULL
       |)
       |SELECT underlying, max(n) AS n_returns,
       |  ${cols(1, 20, "95")},
       |  ${cols(1, 100, "99")}
       |FROM rk GROUP BY 1""".stripMargin
  }

  /** M9: daily implied-vs-realized spread — the volatility-risk-
    * premium read the reference's EGARCH spread (m6) approximates
    * per-bar, here stated at the daily horizon: mean traded IV minus
    * the day's realized vol, per underlying. Joins two bar-sized
    * aggregates (both orders smaller than the tape) on
    * (underlying, day). */
  def m9IvRvSpread(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = trades(s, dir)
    val rv = RealizedVol.dailyEstimators(t)
      .select(col("underlying"), col("day_start"), col("n_bars"),
        col("rv_vol"))
    val ep = unix_timestamp(col("timestamp"))
    val ivd = t.filter(col("iv").isNotNull)
      .withColumn("day_start", ep - ep % 86400L)
      .groupBy(col("underlying"), col("day_start"))
      .agg(davg(col("iv")).as("iv_mean"),
        count(lit(1)).as("n_iv_trades"))
    ivd.join(rv, Seq("underlying", "day_start"))
      .withColumn("iv_rv_spread", col("iv_mean") - col("rv_vol"))
  }

  val m9Oracle: String = {
    val rvSum = duckDsum(duckRoundTo("r*r", 6))
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start, bucket_start,
       |    ln(close / lag(close) OVER (
       |      PARTITION BY underlying, day_start ORDER BY bucket_start)) AS r
       |  FROM pbd
       |),
       |rv AS (
       |  SELECT underlying, day_start, count(*) AS n_bars,
       |    sqrt(coalesce($rvSum, 0.0::DOUBLE)) AS rv_vol
       |  FROM rets GROUP BY 1, 2
       |),
       |ivd AS (
       |  SELECT underlying, ep - ep % 86400 AS day_start,
       |    ${duckDavg("iv")} AS iv_mean,
       |    count(*) AS n_iv_trades
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE iv IS NOT NULL
       |  GROUP BY 1, 2
       |)
       |SELECT i.underlying, i.day_start, i.iv_mean, i.n_iv_trades,
       |  r.n_bars, r.rv_vol, i.iv_mean - r.rv_vol AS iv_rv_spread
       |FROM ivd i JOIN rv r
       |  ON r.underlying = i.underlying AND r.day_start = i.day_start""".stripMargin
  }

  private val EwmaLambda = 0.94

  def m8EwmaVol(s: SparkSession, dir: String): DataFrame =
    RealizedVol.ewmaSeries(trades(s, dir), EwmaLambda)

  /** The λ^t·Σλ^{-i}r² closed form with every pow() output quantized
    * (see [[RealizedVol.ewmaSeries]]); the running sum is DECIMAL —
    * order-free — so DuckDB's segment-tree window aggregation cannot
    * diverge from Spark's sequential one. */
  val m8Oracle: String = {
    val lam = duckDoubleLit(EwmaLambda)
    val oneMinus = duckDoubleLit(1.0 - EwmaLambda)
    s"""WITH $pbCte,
       |rets AS (
       |  SELECT underlying, day_start, bucket_start,
       |    ln(close / lag(close) OVER w) AS r
       |  FROM pbd
       |  WINDOW w AS (PARTITION BY underlying, day_start
       |               ORDER BY bucket_start)
       |),
       |seq AS (
       |  SELECT underlying, day_start, bucket_start,
       |    CAST(row_number() OVER w AS INT) AS bar_rn,
       |    ${duckRoundTo("r*r", 6)} AS r2
       |  FROM rets WHERE r IS NOT NULL
       |  WINDOW w AS (PARTITION BY underlying, day_start
       |               ORDER BY bucket_start)
       |),
       |acc AS (
       |  SELECT *,
       |    CAST(sum(CAST(${duckRoundTo(s"power($lam, -bar_rn)", 6)} * r2
       |          AS DECIMAL(28,6))) OVER (
       |        PARTITION BY underlying, day_start ORDER BY bucket_start
       |        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s,
       |    ${duckRoundTo(s"power($lam, bar_rn)", 12)} AS ppos
       |  FROM seq
       |)
       |SELECT underlying, day_start, bucket_start, bar_rn, r2,
       |  ${duckRoundTo(s"ppos * $oneMinus * s / (1.0 - ppos)", 9)}
       |    AS ewma_var,
       |  sqrt(${duckRoundTo(s"ppos * $oneMinus * s / (1.0 - ppos)", 9)})
       |    AS ewma_vol
       |FROM acc""".stripMargin
  }

  def a19FlowImbalance(s: SparkSession, dir: String): DataFrame =
    OrderFlow.flowImbalance(trades(s, dir))

  /** Conditional DECIMAL sums per side in one aggregate; imbalance is
    * the identical double expression on both engines, null when the
    * bucket's total volume is zero. */
  val a19Oracle: String = {
    val buy = duckDsum("CASE WHEN direction = 'buy' THEN amount END")
    val sell = duckDsum("CASE WHEN direction <> 'buy' THEN amount END")
    s"""WITH ${SyntheticTrades.tradesCte},
       |agg AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    count(CASE WHEN direction = 'buy' THEN 1 END) AS n_buys,
       |    count(CASE WHEN direction <> 'buy' THEN 1 END) AS n_sells,
       |    $buy AS buy_volume,
       |    $sell AS sell_volume
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  GROUP BY 1, 2
       |)
       |SELECT *,
       |  (coalesce(buy_volume, 0.0::DOUBLE)
       |     - coalesce(sell_volume, 0.0::DOUBLE))
       |    / nullif(coalesce(buy_volume, 0.0::DOUBLE)
       |       + coalesce(sell_volume, 0.0::DOUBLE), 0.0::DOUBLE)
       |    AS imbalance
       |FROM agg""".stripMargin
  }

  def a20Vwap(s: SparkSession, dir: String): DataFrame =
    OrderFlow.vwapSeries(trades(s, dir))

  /** Bar notional/volume as exact DECIMAL sums, then DECIMAL running
    * sums per day — order-free on both engines; vwap is one double
    * division. */
  val a20Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |bars AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    ${duckDsum("price * amount")} AS bar_pv,
       |    ${duckDsum("amount")} AS bar_volume,
       |    count(*) AS n_trades
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  GROUP BY 1, 2
       |),
       |acc AS (
       |  SELECT *, bucket_start - bucket_start % 86400 AS day_start
       |  FROM bars
       |)
       |SELECT underlying, bucket_start, bar_pv, bar_volume, n_trades,
       |  day_start,
       |  CAST(sum(CAST(bar_pv AS DECIMAL(28,6))) OVER w AS DOUBLE)
       |    AS cum_pv,
       |  CAST(sum(CAST(bar_volume AS DECIMAL(28,6))) OVER w AS DOUBLE)
       |    AS cum_volume,
       |  CAST(sum(CAST(bar_pv AS DECIMAL(28,6))) OVER w AS DOUBLE)
       |    / nullif(CAST(sum(CAST(bar_volume AS DECIMAL(28,6))) OVER w
       |             AS DOUBLE), 0.0) AS vwap
       |FROM acc
       |WINDOW w AS (PARTITION BY underlying, day_start
       |  ORDER BY bucket_start ROWS UNBOUNDED PRECEDING)""".stripMargin

  private val J6GapSec = 4L * 3600L

  /** J6: interval-containment join via bucketization
    * ([[graft.operators.IntervalJoin]]) — activity sessions from the
    * thinned trade tape joined to every spot tick they enclose. The
    * oracle states the same join as a plain BETWEEN theta-join
    * (DuckDB's optimizer copes at oracle scale; the Spark side is the
    * shape that survives 100 TB). */
  def j6IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = trades(s, dir)
      .filter(col("trade_id").cast("long") % 7 === 0)
      .select(col("underlying").as("symbol"),
        unix_timestamp(col("timestamp")).as("ep"))
    val iv = graft.operators.IntervalJoin.activityIntervals(
      t, "symbol", "ep", J6GapSec)
    val ticks = SyntheticTrades.spotTicks(s, dir)
      .select(col("symbol"), unix_timestamp(col("timestamp")).as("ep"),
        col("close"))
    graft.operators.IntervalJoin
      .containmentJoin(ticks, iv, "symbol", "ep", "start_ep", "end_ep")
      .select("symbol", "ep", "close", "session_seq", "start_ep", "end_ep")
  }

  val j6Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |${SyntheticTrades.spotCte},
       |sampled AS (
       |  SELECT underlying, ${duckEpochS("\"timestamp\"")} AS ep
       |  FROM trades WHERE CAST(trade_id AS BIGINT) % 7 = 0
       |),
       |seq AS (
       |  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
       |      OR ep - lag(ep) OVER w > $J6GapSec THEN 1 ELSE 0 END AS is_new
       |  FROM sampled WINDOW w AS (PARTITION BY underlying ORDER BY ep)
       |),
       |ses AS (
       |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY underlying
       |      ORDER BY ep ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |  FROM seq
       |),
       |iv AS (
       |  SELECT underlying, session_seq, min(ep) AS start_ep,
       |    max(ep) AS end_ep
       |  FROM ses GROUP BY 1, 2
       |),
       |ticks AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} AS ep, close
       |  FROM spot_ticks
       |)
       |SELECT t.symbol, t.ep, t.close, i.session_seq, i.start_ep, i.end_ep
       |FROM ticks t JOIN iv i
       |  ON i.underlying = t.symbol
       |  AND t.ep BETWEEN i.start_ep AND i.end_ep""".stripMargin

  /** J9: interval×interval OVERLAP join via the canonical-bucket
    * dedup ([[graft.operators.IntervalJoin.overlapJoin]]) — call-side
    * vs put-side activity sessions on the thinned tape, paired where
    * the two sides were simultaneously active (two-sided-market
    * windows), with the overlap span. The oracle states the plain
    * theta overlap join; the Spark side is the bucketized equi-join
    * that survives 100 TB without a per-key cartesian or a dedup
    * shuffle. */
  def j9OverlapJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val t = trades(s, dir)
      .filter(col("trade_id").cast("long") % 7 === 0)
      .select(col("underlying").as("symbol"),
        unix_timestamp(col("timestamp")).as("ep"), col("option_type"))
    def side(ot: String, tag: String): DataFrame =
      graft.operators.IntervalJoin.activityIntervals(
        t.filter(col("option_type") === ot), "symbol", "ep", J6GapSec)
        .select(col("symbol"), col("session_seq").as(s"${tag}_seq"),
          col("start_ep").as(s"${tag}_start"),
          col("end_ep").as(s"${tag}_end"))
    graft.operators.IntervalJoin.overlapJoin(
      side("C", "call"), side("P", "put"), "symbol",
      "call_start", "call_end", "put_start", "put_end")
      .select(col("symbol"), col("call_seq"), col("put_seq"),
        col("call_start"), col("call_end"),
        col("put_start"), col("put_end"),
        greatest(col("call_start"), col("put_start")).as("ov_start"),
        least(col("call_end"), col("put_end")).as("ov_end"),
        (least(col("call_end"), col("put_end"))
          - greatest(col("call_start"), col("put_start"))).as("ov_sec"))
  }

  val j9Oracle: String = {
    def sideCte(ot: String, tag: String): String =
      s"""${tag}_seq AS (
         |  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
         |      OR ep - lag(ep) OVER w > $J6GapSec THEN 1 ELSE 0 END AS is_new
         |  FROM sampled WHERE option_type = '$ot'
         |  WINDOW w AS (PARTITION BY underlying ORDER BY ep)
         |),
         |${tag}_iv AS (
         |  SELECT underlying,
         |    CAST(sum(is_new) OVER (PARTITION BY underlying
         |      ORDER BY ep ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS session_seq, ep
         |  FROM ${tag}_seq
         |),
         |${tag}s AS (
         |  SELECT underlying, session_seq, min(ep) AS ${tag}_start,
         |    max(ep) AS ${tag}_end
         |  FROM ${tag}_iv GROUP BY 1, 2
         |)""".stripMargin
    s"""WITH ${SyntheticTrades.tradesCte},
       |sampled AS (
       |  SELECT underlying, option_type,
       |    ${duckEpochS("\"timestamp\"")} AS ep
       |  FROM trades WHERE CAST(trade_id AS BIGINT) % 7 = 0
       |),
       |${sideCte("C", "call")},
       |${sideCte("P", "put")}
       |SELECT c.underlying AS symbol,
       |  c.session_seq AS call_seq, p.session_seq AS put_seq,
       |  c.call_start, c.call_end, p.put_start, p.put_end,
       |  greatest(c.call_start, p.put_start) AS ov_start,
       |  least(c.call_end, p.put_end) AS ov_end,
       |  least(c.call_end, p.put_end)
       |    - greatest(c.call_start, p.put_start) AS ov_sec
       |FROM calls c JOIN puts p
       |  ON p.underlying = c.underlying
       |  AND c.call_start <= p.put_end AND p.put_start <= c.call_end"""
      .stripMargin
  }

  def a21SizeQuantiles(s: SparkSession, dir: String): DataFrame =
    OrderFlow.sizeQuantiles(trades(s, dir))

  /** Integer-rank quantile selection — both engines pick the exact
    * element at ceil(q·n) under (amount, trade_id) order; `//` is
    * DuckDB's integer division, `div` Spark's. */
  val a21Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |ranked AS (
       |  SELECT underlying, amount,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY amount, trade_id) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM trades
       |)
       |SELECT underlying, max(n) AS n_trades,
       |  max(CASE WHEN rn = (n * 1 + 1) // 2 THEN amount END) AS p50,
       |  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN amount END) AS p90,
       |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN amount END) AS p99
       |FROM ranked
       |WHERE rn = (n * 1 + 1) // 2 OR rn = (n * 9 + 9) // 10
       |   OR rn = (n * 99 + 99) // 100
       |GROUP BY underlying""".stripMargin

  private val ContQs = Seq((1, 4, "p25_cont"), (1, 2, "p50_cont"),
    (3, 4, "p75_cont"), (9, 10, "p90_cont"))

  def a32PercentileCont(s: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedSelection.quantilesCont(
      trades(s, dir).select("underlying", "amount"),
      "underlying", "amount", ContQs)

  /** ANSI PERCENTILE_CONT on the distributed-selection scaffolding
    * (a21 is the discrete rank pick; this interpolates). The oracle
    * restates the integer rank math (lo = 1 + (a·(n−1)) // b,
    * remainder mod b) over a rank window and runs the IDENTICAL
    * interpolation doubles — deliberately NOT DuckDB's own
    * quantile_cont, whose internal arithmetic order is unspecified;
    * both engines interpolate the same two exactly-selected
    * elements the same way. */
  val a32Oracle: String = {
    val selects = ContQs.map { case (a, b, name) =>
      val lo = s"(1 + ((n - 1) * $a) // $b)"
      val rem = s"(((n - 1) * $a) % $b)"
      val hi = s"($lo + CASE WHEN $rem > 0 THEN 1 ELSE 0 END)"
      s"""  max(CASE WHEN rn = $lo THEN amount END)
         |    + (CAST(max($rem) AS DOUBLE)
         |       * (max(CASE WHEN rn = $hi THEN amount END)
         |          - max(CASE WHEN rn = $lo THEN amount END)))
         |      / CAST($b AS DOUBLE) AS $name""".stripMargin
    }.mkString(",\n")
    val anyHit = ContQs.map { case (a, b, _) =>
      val lo = s"(1 + ((n - 1) * $a) // $b)"
      val hi = s"($lo + CASE WHEN (((n - 1) * $a) % $b) > 0 THEN 1 ELSE 0 END)"
      s"rn = $lo OR rn = $hi"
    }.mkString(" OR ")
    s"""WITH ${SyntheticTrades.tradesCte},
       |ranked AS (
       |  SELECT underlying, amount,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY amount, trade_id) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM trades
       |)
       |SELECT underlying, max(n) AS n_trades,
       |$selects
       |FROM ranked
       |WHERE $anyHit
       |GROUP BY underlying""".stripMargin
  }

  def a22TrimmedMean(s: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedSelection.trimmedMean(
      trades(s, dir).select("underlying", "amount"),
      "underlying", "amount", trimNum = 5, trimDen = 100)

  /** Exact 5%-each-side trimmed mean of trade size — the robust-stats
    * twin of a21: same integer-rank machinery (lo = floor(0.05·n)
    * ranks dropped per side), the kept mass summed in exact DECIMAL
    * on both engines, one identical double division at the end. The
    * oracle states it row-wise over a rank window; the Spark side is
    * the distributed rank-range-overlap fold over the frequency
    * table — same kept multiset by construction. */
  val a22Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |ranked AS (
       |  SELECT underlying, amount,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY amount, trade_id) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM trades
       |)
       |SELECT underlying, max(n) AS n_rows,
       |  max(n - 2 * ((n * 5) // 100)) AS n_kept,
       |  CAST(sum(CAST(amount AS DECIMAL(28,6))) AS DOUBLE)
       |    / CAST(max(n - 2 * ((n * 5) // 100)) AS DOUBLE)
       |    AS trimmed_mean
       |FROM ranked
       |WHERE rn > (n * 5) // 100 AND rn <= n - (n * 5) // 100
       |GROUP BY underlying""".stripMargin

  def m10SmileFit(s: SparkSession, dir: String): DataFrame =
    graft.operators.SmileFit.quadraticSmile(trades(s, dir))

  /** The oracle rebuilds the same normal-equation sums — inputs
    * quantized once to DECIMAL(16,6), the power/cross ladder then
    * pure decimal arithmetic with the same pinned scales as the
    * Spark plan (exact on both engines, zero per-term rounding) —
    * and solves Cramer's rule from the SAME expression strings
    * [[graft.operators.SmileFit]] feeds to `expr`: shared spelling,
    * not re-derived algebra, so the doubles match bit-for-bit (no
    * libm anywhere: moneyness is a plain ratio). */
  val m10Oracle: String = {
    import graft.operators.SmileFit
    s"""WITH ${SyntheticTrades.tradesCte},
       |v AS (
       |  SELECT underlying, option_type,
       |    CAST(strike / index_price AS DECIMAL(16,6)) AS mq,
       |    CAST(iv AS DECIMAL(16,6)) AS ivq
       |  FROM trades
       |  WHERE iv IS NOT NULL AND index_price IS NOT NULL
       |    AND strike > 0 AND index_price > 0
       |),
       |v2 AS (SELECT *, CAST(mq*mq AS DECIMAL(16,12)) AS m2 FROM v),
       |v3 AS (SELECT *, CAST(m2*mq AS DECIMAL(20,18)) AS m3 FROM v2),
       |v4 AS (SELECT *, m3*mq AS m4, ivq*mq AS t1r, ivq*m2 AS t2r
       |       FROM v3),
       |agg AS (
       |  SELECT underlying, option_type,
       |    count(*) AS n_fit,
       |    CAST(CAST(round(sum(mq), 8) AS DECIMAL(22,8)) AS DOUBLE) AS s1,
       |    CAST(CAST(round(sum(m2), 8) AS DECIMAL(22,8)) AS DOUBLE) AS s2,
       |    CAST(CAST(round(sum(m3), 8) AS DECIMAL(22,8)) AS DOUBLE) AS s3,
       |    CAST(CAST(round(sum(m4), 8) AS DECIMAL(22,8)) AS DOUBLE) AS s4,
       |    CAST(CAST(round(sum(ivq), 8) AS DECIMAL(22,8)) AS DOUBLE) AS t0,
       |    CAST(CAST(round(sum(t1r), 8) AS DECIMAL(22,8)) AS DOUBLE) AS t1,
       |    CAST(CAST(round(sum(t2r), 8) AS DECIMAL(22,8)) AS DOUBLE) AS t2
       |  FROM v4 GROUP BY 1, 2
       |),
       |solved AS (
       |  SELECT underlying, option_type, n_fit,
       |    ${SmileFit.aExpr} AS a_coef,
       |    ${SmileFit.bExpr} AS b_coef,
       |    ${SmileFit.cExpr} AS c_coef
       |  FROM (SELECT *, CAST(n_fit AS DOUBLE) AS s0 FROM agg)
       |)
       |SELECT underlying, option_type, n_fit, a_coef, b_coef, c_coef,
       |  ${SmileFit.vertexExpr} AS vertex_m
       |FROM solved""".stripMargin
  }

  def m11RealizedCorr(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpotCorr.realizedCorr(
      SyntheticTrades.spotTicks(s, dir))

  /** Daily-close lag returns aligned BTC×ETH, Pearson + beta from
    * exact DECIMAL(12,8)-quantized sums and decimal cross products;
    * same shared-spelling discipline as m10 (sqrt is IEEE-exact on
    * both engines, so outputs stay raw doubles). */
  val m11Oracle: String = {
    import graft.operators.SpotCorr
    s"""WITH ${SyntheticTrades.spotCte},
       |daily AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 86400 AS day,
       |    arg_max(close, "timestamp") AS close
       |  FROM spot_ticks
       |  GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT symbol, day, close,
       |    lag(close) OVER (PARTITION BY symbol ORDER BY day) AS prev
       |  FROM daily
       |),
       |j AS (
       |  SELECT b.day,
       |    CAST(b.close / b.prev - 1.0 AS DECIMAL(12,8)) AS xq,
       |    CAST(e.close / e.prev - 1.0 AS DECIMAL(12,8)) AS yq
       |  FROM rets b JOIN rets e USING (day)
       |  WHERE b.symbol = 'BTC' AND e.symbol = 'ETH'
       |    AND b.prev IS NOT NULL AND e.prev IS NOT NULL
       |),
       |agg AS (
       |  SELECT count(*) AS n_days,
       |    CAST(CAST(sum(xq) AS DECIMAL(24,16)) AS DOUBLE) AS sx,
       |    CAST(CAST(sum(yq) AS DECIMAL(24,16)) AS DOUBLE) AS sy,
       |    CAST(CAST(sum(xq * yq) AS DECIMAL(24,16)) AS DOUBLE) AS sxy,
       |    CAST(CAST(sum(xq * xq) AS DECIMAL(24,16)) AS DOUBLE) AS sxx,
       |    CAST(CAST(sum(yq * yq) AS DECIMAL(24,16)) AS DOUBLE) AS syy
       |  FROM j
       |)
       |SELECT n_days, ${SpotCorr.corrExpr} AS corr_btc_eth,
       |  ${SpotCorr.betaExpr} AS beta_eth_on_btc
       |FROM (SELECT *, CAST(n_days AS DOUBLE) AS nd FROM agg)""".stripMargin
  }

  def m41LeadLag(s: SparkSession, dir: String): DataFrame =
    graft.operators.SpotCorr.leadLagCorr(
      SyntheticTrades.spotTicks(s, dir))

  /** 15-min bar closes, strict-adjacency returns via a bucket−1
    * self-join (no window — missing buckets yield no return), the
    * ±3-lag pair table from a lag dimension, then m11's exact
    * decimal-sum Pearson per lag with the SAME shared corr algebra. */
  val m41Oracle: String = {
    import graft.operators.SpotCorr
    s"""WITH ${SyntheticTrades.spotCte},
       |bars AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 900 AS bucket,
       |    arg_max(close, "timestamp") AS close
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT a.symbol, a.bucket,
       |    CAST(a.close / b.close - 1.0 AS DECIMAL(12,8)) AS rq
       |  FROM bars a JOIN bars b
       |    ON a.symbol = b.symbol AND b.bucket = a.bucket - 1
       |),
       |x AS (SELECT bucket, rq AS xq FROM rets WHERE symbol = 'BTC'),
       |y AS (SELECT bucket, rq AS yq FROM rets WHERE symbol = 'ETH'),
       |lags AS (SELECT unnest(range(-3, 4)) AS lag),
       |pairs AS (
       |  SELECT l.lag, x.xq, y.yq
       |  FROM x JOIN lags l ON true
       |  JOIN y ON y.bucket = x.bucket + l.lag
       |),
       |agg AS (
       |  SELECT lag, count(*) AS n_pairs,
       |    CAST(CAST(sum(xq) AS DECIMAL(24,16)) AS DOUBLE) AS sx,
       |    CAST(CAST(sum(yq) AS DECIMAL(24,16)) AS DOUBLE) AS sy,
       |    CAST(CAST(sum(xq * yq) AS DECIMAL(24,16)) AS DOUBLE) AS sxy,
       |    CAST(CAST(sum(xq * xq) AS DECIMAL(24,16)) AS DOUBLE) AS sxx,
       |    CAST(CAST(sum(yq * yq) AS DECIMAL(24,16)) AS DOUBLE) AS syy
       |  FROM pairs GROUP BY 1
       |)
       |SELECT CAST(lag AS INT) AS lag, n_pairs,
       |  ${SpotCorr.corrExpr} AS corr_lag
       |FROM (SELECT *, CAST(n_pairs AS DOUBLE) AS nd FROM agg)""".stripMargin
  }

  def a23MaxPain(s: SparkSession, dir: String): DataFrame =
    graft.operators.MaxPain.maxPain(trades(s, dir))

  /** Candidate×ladder payout table restated over the exact decimal
    * OI sums; argmin ordered by the exact payout (identical decimal
    * order on both engines), output payout rendered through a 2-dp
    * gate (int value < 2^53 — see the Parity notes). */
  val a23Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |oi AS (
       |  SELECT underlying, expiry, strike, option_type,
       |    CAST(sum(CAST(amount AS DECIMAL(28,6))) AS DECIMAL(20,6))
       |      AS oi
       |  FROM trades WHERE strike > 0
       |  GROUP BY 1, 2, 3, 4
       |),
       |cands AS (SELECT DISTINCT underlying, expiry, strike AS s FROM oi),
       |pay AS (
       |  SELECT c.underlying, c.expiry, c.s,
       |    sum(CASE
       |      WHEN o.option_type = 'C' AND c.s > o.strike
       |        THEN o.oi * CAST(c.s - o.strike AS DECIMAL(6,0))
       |      WHEN o.option_type = 'P' AND c.s < o.strike
       |        THEN o.oi * CAST(o.strike - c.s AS DECIMAL(6,0))
       |      ELSE CAST(0 AS DECIMAL(27,6)) END) AS payout
       |  FROM cands c
       |  JOIN oi o ON o.underlying = c.underlying AND o.expiry = c.expiry
       |  GROUP BY 1, 2, 3
       |),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY underlying, expiry
       |      ORDER BY payout, s) AS rn,
       |    count(*) OVER (PARTITION BY underlying, expiry) AS n_strikes
       |  FROM pay
       |)
       |SELECT underlying, strftime(expiry, '%Y-%m-%d') AS expiry_date,
       |  s AS max_pain_strike,
       |  CAST(CAST(round(payout, 2) AS DECIMAL(22,2)) AS DOUBLE)
       |    AS total_payout,
       |  n_strikes
       |FROM ranked WHERE rn = 1""".stripMargin

  def a24MadOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.MadOutliers.madOutliers(trades(s, dir))

  /** Exact integer-rank medians (ceil(n/2), same rule as a21) for
    * both the size median and the MAD; the k·MAD threshold is the
    * identical double expression on both engines. */
  val a24Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |r1 AS (
       |  SELECT underlying, amount, trade_id,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY amount, trade_id) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM trades
       |),
       |med AS (
       |  SELECT underlying, max(n) AS n_trades,
       |    max(CASE WHEN rn = (n * 1 + 1) // 2 THEN amount END) AS med
       |  FROM r1 GROUP BY 1
       |),
       |dev AS (
       |  SELECT t.underlying, abs(t.amount - m.med) AS d, t.trade_id
       |  FROM trades t JOIN med m ON m.underlying = t.underlying
       |),
       |r2 AS (
       |  SELECT underlying, d,
       |    row_number() OVER (PARTITION BY underlying
       |      ORDER BY d, trade_id) AS rn,
       |    count(*) OVER (PARTITION BY underlying) AS n
       |  FROM dev
       |),
       |mad AS (
       |  SELECT underlying,
       |    max(CASE WHEN rn = (n * 1 + 1) // 2 THEN d END) AS mad
       |  FROM r2 GROUP BY 1
       |)
       |SELECT m.underlying, m.n_trades, m.med, a.mad,
       |  count(CASE WHEN abs(t.amount - m.med) > 5.0 * a.mad
       |        THEN 1 END) AS n_outliers,
       |  CAST(count(CASE WHEN abs(t.amount - m.med) > 5.0 * a.mad
       |        THEN 1 END) AS DOUBLE)
       |    / CAST(m.n_trades AS DOUBLE) AS outlier_frac
       |FROM trades t
       |JOIN med m ON m.underlying = t.underlying
       |JOIN mad a ON a.underlying = t.underlying
       |GROUP BY m.underlying, m.n_trades, m.med, a.mad""".stripMargin

  def m17KyleLambda(s: SparkSession, dir: String): DataFrame =
    OrderFlow.kyleLambda(trades(s, dir))

  val m17Oracle: String = {
    def gate(e: String) =
      s"CAST(CAST(round(sum($e), 8) AS DECIMAL(22,8)) AS DOUBLE)"
    s"""WITH ${SyntheticTrades.tradesCte},
       |bars AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    arg_min(price, "timestamp") AS open,
       |    arg_max(price, "timestamp") AS close,
       |    CAST(coalesce(sum(CASE WHEN direction = 'buy'
       |        THEN CAST(amount AS DECIMAL(18,6)) END), 0)
       |      - coalesce(sum(CASE WHEN direction <> 'buy'
       |        THEN CAST(amount AS DECIMAL(18,6)) END), 0)
       |      AS DECIMAL(18,6)) AS flow
       |  FROM (SELECT *, ${graft.util.Parity.duckEpochS("\"timestamp\"")}
       |        AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |),
       |q AS (
       |  SELECT underlying, bucket_start // 86400 AS day,
       |    flow AS xq, CAST(close - open AS DECIMAL(12,6)) AS yq
       |  FROM bars
       |),
       |aggd AS (
       |  SELECT underlying, day, count(*) AS n_bars,
       |    ${gate("xq")} AS sx, ${gate("yq")} AS sy,
       |    ${gate("xq * yq")} AS sxy,
       |    ${gate("xq * xq")} AS sxx, ${gate("yq * yq")} AS syy
       |  FROM q GROUP BY 1, 2
       |)
       |SELECT underlying, day, n_bars,
       |  ${graft.operators.SpotCorr.betaExpr} AS kyle_lambda,
       |  ${graft.operators.TextAnalysis.zipfR2Expr} AS r2
       |FROM (SELECT *, CAST(n_bars AS DOUBLE) AS nd FROM aggd)"""
      .stripMargin
  }

  private val VpinBucketVol = 1000L
  private val VpinWindow = 50

  /** M35: VPIN flow toxicity ([[OrderFlow.vpin]]). The oracle
    * restates the whole chain — micro-unit quantization, the running
    * cumulative volume (a plain per-symbol ordered window at oracle
    * scale; the Spark side is the two-level day stitch), start-bucket
    * assignment, integer ppb imbalance, BIGINT rolling sum — in SQL.
    */
  def m35Vpin(s: SparkSession, dir: String): DataFrame =
    OrderFlow.vpin(trades(s, dir), VpinBucketVol, VpinWindow)

  val m35Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |t AS (
       |  SELECT underlying, ${duckEpochS("\"timestamp\"")} AS ep,
       |    CAST(trade_id AS BIGINT) AS tid,
       |    CAST(CAST(amount AS DECIMAL(28,6)) * 1000000 AS BIGINT)
       |      AS vol_u,
       |    direction = 'buy' AS is_buy
       |  FROM trades
       |),
       |c AS (
       |  SELECT *,
       |    CAST(sum(vol_u) OVER (PARTITION BY underlying
       |      ORDER BY ep, tid ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      - vol_u AS cum_prev
       |  FROM t
       |),
       |b AS (
       |  SELECT underlying,
       |    cum_prev // ${VpinBucketVol * 1000000L} AS bucket,
       |    min(ep) AS bucket_start_ep, count(*) AS n_trades,
       |    CAST(sum(CASE WHEN is_buy THEN vol_u ELSE 0 END) AS BIGINT)
       |      AS buy_u,
       |    CAST(sum(CASE WHEN NOT is_buy THEN vol_u ELSE 0 END) AS BIGINT)
       |      AS sell_u
       |  FROM c GROUP BY 1, 2
       |),
       |o AS (
       |  SELECT *, CAST(CAST(abs(buy_u - sell_u) AS HUGEINT) * 1000000000
       |    // nullif(buy_u + sell_u, 0) AS BIGINT) AS oi_e9
       |  FROM b
       |)
       |SELECT underlying, bucket, bucket_start_ep, n_trades,
       |  buy_u, sell_u, oi_e9,
       |  CAST(sum(oi_e9) OVER w AS DOUBLE)
       |    / (CAST(count(oi_e9) OVER w AS DOUBLE) * 1.0E9) AS vpin
       |FROM o
       |WINDOW w AS (PARTITION BY underlying ORDER BY bucket
       |  ROWS BETWEEN ${VpinWindow - 1} PRECEDING AND CURRENT ROW)"""
      .stripMargin

  def m18Amihud(s: SparkSession, dir: String): DataFrame =
    OrderFlow.amihudIlliq(trades(s, dir))

  val m18Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |bars AS (
       |  SELECT underlying, ep - ep % 900 AS bucket_start,
       |    arg_min(price, "timestamp") AS open,
       |    arg_max(price, "timestamp") AS close,
       |    ${duckDsum("price * amount")} AS notional
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |  WHERE price > 0
       |  GROUP BY 1, 2
       |)
       |SELECT underlying, bucket_start // 86400 AS day,
       |  count(*) AS n_bars,
       |  CAST(CAST(sum(CAST(floor(abs(close / open - 1.0) / notional
       |      * 1.0E9 * 1.0E6) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |    / 1.0E6 / count(*) AS amihud_e9
       |FROM bars WHERE notional > 0
       |GROUP BY 1, 2""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "m18_amihud" -> QueryDef(m18Amihud _, m18Oracle),
    "m35_vpin" -> QueryDef(m35Vpin _, m35Oracle),
    "m17_kyle_lambda" -> QueryDef(m17KyleLambda _, m17Oracle),
    "a21_size_quantiles" -> QueryDef(a21SizeQuantiles _, a21Oracle),
    "a32_percentile_cont" -> QueryDef(a32PercentileCont _, a32Oracle),
    "a22_trimmed_mean" -> QueryDef(a22TrimmedMean _, a22Oracle),
    "a23_max_pain" -> QueryDef(a23MaxPain _, a23Oracle),
    "a24_mad_outliers" -> QueryDef(a24MadOutliers _, a24Oracle),
    "m10_smile_fit" -> QueryDef(m10SmileFit _, m10Oracle),
    "m11_realized_corr" -> QueryDef(m11RealizedCorr _, m11Oracle),
    "m41_lead_lag" -> QueryDef(m41LeadLag _, m41Oracle),
    "m7_realized_vol" -> QueryDef(m7RealizedVol _, m7Oracle),
    "m48_har_rv" -> QueryDef(m48HarRv _, m48Oracle),
    "m49_kalman_level" -> QueryDef(m49Kalman _, m49Oracle),
    "m51_holt_linear" -> QueryDef(m51Holt _, m51Oracle),
    "m50_mz_eval" -> QueryDef(m50MzEval _, m50Oracle),
    "m39_jump_test" -> QueryDef(m39JumpTest _, m39Oracle),
    "m42_semivariance" -> QueryDef(m42Semivariance _, m42Oracle),
    "m43_signature_plot" -> QueryDef(m43SignaturePlot _, m43Oracle),
    "m44_overnight_intraday" ->
      QueryDef(m44OvernightIntraday _, m44Oracle),
    "m45_var_es" -> QueryDef(m45VarEs _, m45Oracle),
    "m47_downside_beta" -> QueryDef(m47DownsideBeta _, m47Oracle),
    "m40_vol_of_vol" -> QueryDef(m40VolOfVol _, m40Oracle),
    "m8_ewma_vol" -> QueryDef(m8EwmaVol _, m8Oracle),
    "m9_iv_rv_spread" -> QueryDef(m9IvRvSpread _, m9Oracle),
    "a19_flow_imbalance" -> QueryDef(a19FlowImbalance _, a19Oracle),
    "a20_vwap" -> QueryDef(a20Vwap _, a20Oracle),
    "j6_interval_join" -> QueryDef(j6IntervalJoin _, j6Oracle),
    "j9_overlap_join" -> QueryDef(j9OverlapJoin _, j9Oracle))
}
