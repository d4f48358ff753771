package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Microstructure
import graft.options.SyntheticTrades
import graft.util.Parity._

/** Round-11 microstructure additions beyond the reference: Roll's
  * implied spread, the Corwin–Schultz high–low spread, and the
  * Lo–MacKinlay variance ratio, all on the spot tape. Oracles spell
  * the identical arithmetic chains (exact decimal sums; the one
  * ln/exp chain is 9-dp grid-quantized per day on both engines). */
object MicroQueries {

  private def ticks(s: SparkSession, dir: String): DataFrame =
    SyntheticTrades.spotTicks(s, dir)

  private val dailyCte: String =
    s"""${SyntheticTrades.spotCte},
       |daily AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 86400 AS day,
       |    arg_max(close, "timestamp") AS close
       |  FROM spot_ticks GROUP BY 1, 2
       |)""".stripMargin

  // ---- M25: Roll implied spread ----

  def m25RollSpread(s: SparkSession, dir: String): DataFrame =
    Microstructure.rollSpread(ticks(s, dir))

  val m25Oracle: String =
    s"""WITH $dailyCte,
       |d1 AS (
       |  SELECT symbol, day, close - lag(close) OVER (
       |    PARTITION BY symbol ORDER BY day) AS dp
       |  FROM daily
       |),
       |d2 AS (
       |  SELECT symbol, dp, lag(dp) OVER (
       |    PARTITION BY symbol ORDER BY day) AS dl
       |  FROM d1
       |),
       |aggd AS (
       |  SELECT symbol, count(*) AS n_pairs,
       |    ${duckDsum("dp")} AS sx,
       |    ${duckDsum("dl")} AS sy,
       |    ${duckDsum("dp * dl")} AS sxy
       |  FROM d2 WHERE dp IS NOT NULL AND dl IS NOT NULL
       |  GROUP BY 1
       |)
       |SELECT symbol, n_pairs,
       |  (sxy - sx * sy / nd) / nd AS autocov,
       |  CASE WHEN (sxy - sx * sy / nd) / nd < 0
       |       THEN 2.0 * sqrt(-((sxy - sx * sy / nd) / nd)) END
       |    AS roll_spread
       |FROM (SELECT *, CAST(n_pairs AS DOUBLE) AS nd FROM aggd)"""
      .stripMargin

  // ---- M26: Corwin–Schultz high–low spread ----

  def m26CsSpread(s: SparkSession, dir: String): DataFrame =
    Microstructure.corwinSchultz(ticks(s, dir))

  val m26Oracle: String = {
    val k = duckDoubleLit(3.0 - 2.0 * math.sqrt(2.0))
    s"""WITH ${SyntheticTrades.spotCte},
       |hl AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 86400 AS day,
       |    max(close) AS hi, min(close) AS lo
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |p AS (
       |  SELECT symbol, day, hi, lo,
       |    lag(hi) OVER w AS hp, lag(lo) OVER w AS lp,
       |    lag(day) OVER w AS pd
       |  FROM hl WINDOW w AS (PARTITION BY symbol ORDER BY day)
       |),
       |t AS (
       |  SELECT symbol,
       |    ln(hi / lo) AS l1, ln(hp / lp) AS l2,
       |    ln(greatest(hi, hp) / least(lo, lp)) AS lg
       |  FROM p WHERE pd IS NOT NULL AND day = pd + 1
       |),
       |al AS (
       |  SELECT symbol,
       |    (sqrt(2.0 * (l1 * l1 + l2 * l2)) - sqrt(l1 * l1 + l2 * l2))
       |      / $k - sqrt((lg * lg) / $k) AS alpha
       |  FROM t
       |),
       |sp AS (
       |  SELECT symbol, ${duckRoundTo(
              "2.0 * (exp(alpha) - 1.0) / (exp(alpha) + 1.0)", 9)} AS sp
       |  FROM al
       |)
       |SELECT symbol, count(*) AS n_days,
       |  ${duckDsum("sp * 1.0E3")} / 1.0E3 / count(*) AS cs_spread_mean,
       |  max(sp) AS cs_spread_max,
       |  CAST(count(CASE WHEN sp > 0 THEN 1 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS pos_rate
       |FROM sp GROUP BY 1""".stripMargin
  }

  // ---- M27: Lo–MacKinlay variance ratio ----

  def m27VarianceRatio(s: SparkSession, dir: String): DataFrame =
    Microstructure.varianceRatio(ticks(s, dir))

  val m27Oracle: String = {
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,16)) AS DOUBLE)"
    def roll(q: Int) =
      s"""CAST(sum(rq) OVER (PARTITION BY symbol ORDER BY day
         |      RANGE BETWEEN ${q - 1} PRECEDING AND CURRENT ROW)
         |      AS DECIMAL(12,8)) AS rt_$q,
         |    count(*) OVER (PARTITION BY symbol ORDER BY day
         |      RANGE BETWEEN ${q - 1} PRECEDING AND CURRENT ROW) AS nw_$q"""
        .stripMargin
    s"""WITH $dailyCte,
       |rets AS (
       |  SELECT symbol, day,
       |    CAST(close / lag(close) OVER (
       |      PARTITION BY symbol ORDER BY day) - 1.0
       |      AS DECIMAL(12,8)) AS rq
       |  FROM daily
       |  QUALIFY rq IS NOT NULL
       |),
       |base AS (
       |  SELECT symbol, count(*) AS n_base,
       |    ${d24("sum(rq)")} AS b_s,
       |    ${d24("sum(rq * rq)")} AS b_s2
       |  FROM rets GROUP BY 1
       |),
       |basev AS (
       |  SELECT symbol, n_base,
       |    (b_s2 - b_s * b_s / nd) / nd AS var1
       |  FROM (SELECT *, CAST(n_base AS DOUBLE) AS nd FROM base)
       |),
       |roll AS (
       |  SELECT symbol, day,
       |    ${roll(2)},
       |    ${roll(5)}
       |  FROM rets
       |),
       |long AS (
       |  SELECT symbol, 2 AS q, nw_2 AS nw, rt_2 AS rt FROM roll
       |  UNION ALL
       |  SELECT symbol, 5 AS q, nw_5 AS nw, rt_5 AS rt FROM roll
       |),
       |qv AS (
       |  SELECT symbol, q, count(*) AS n_q,
       |    ${d24("sum(rt)")} AS q_s,
       |    ${d24("sum(rt * rt)")} AS q_s2
       |  FROM long WHERE nw = q GROUP BY 1, 2
       |)
       |SELECT symbol, q, n_base, n_q, var1,
       |  (q_s2 - q_s * q_s / qnd) / qnd AS varq,
       |  ((q_s2 - q_s * q_s / qnd) / qnd)
       |    / (CAST(q AS DOUBLE) * var1) AS vr
       |FROM (SELECT *, CAST(n_q AS DOUBLE) AS qnd FROM qv)
       |JOIN basev USING (symbol)""".stripMargin
  }

  // ---- M28: triple-barrier labels ----

  def m28TripleBarrier(s: SparkSession, dir: String): DataFrame =
    Microstructure.tripleBarrier(ticks(s, dir))

  /** Barrier logic re-derived with a bounded range join (the oracle
    * may range-join; the Spark side pairs via an exploded equi-join).
    * First-hit extraction via FILTERed min/arg_min — k is unique per
    * entry so arg_min ties cannot occur. All-exact double compares,
    * no grid. */
  val m28Oracle: String =
    s"""WITH $dailyCte,
       |j AS (
       |  SELECT e.symbol, e.day, e.close AS c0,
       |    f.day - e.day AS k, f.close AS cf
       |  FROM daily e JOIN daily f ON f.symbol = e.symbol
       |    AND f.day BETWEEN e.day + 1 AND e.day + 10
       |),
       |h AS (
       |  SELECT *, CASE WHEN cf >= c0 * (1.0 + 0.02) THEN 1
       |                 WHEN cf <= c0 * (1.0 - 0.02) THEN -1
       |                 ELSE 0 END AS hd
       |  FROM j
       |),
       |g AS (
       |  SELECT symbol, day, c0, count(*) AS n_future,
       |    min(k) FILTER (WHERE hd != 0) AS hit_k,
       |    arg_min(hd, k) FILTER (WHERE hd != 0) AS hit_hd,
       |    arg_min(cf, k) FILTER (WHERE hd != 0) AS hit_cf,
       |    max(k) AS last_k,
       |    arg_max(cf, k) AS last_cf
       |  FROM h GROUP BY 1, 2, 3
       |)
       |SELECT symbol, day, n_future,
       |  coalesce(hit_hd, 0) AS label,
       |  coalesce(hit_k, last_k) AS days_to_exit,
       |  coalesce(hit_cf, last_cf) / c0 - 1.0 AS exit_ret
       |FROM g""".stripMargin

  // ---- M30: Parkinson / Garman–Klass range vol ----

  def m30RangeVol(s: SparkSession, dir: String): DataFrame =
    Microstructure.rangeVol(ticks(s, dir))

  val m30Oracle: String = {
    val gkC = duckDoubleLit(2.0 * math.log(2.0) - 1.0)
    val pk4 = duckDoubleLit(4.0 * math.log(2.0))
    s"""WITH ${SyntheticTrades.spotCte},
       |bars AS (
       |  SELECT symbol, ${duckEpochS("\"timestamp\"")} // 86400 AS day,
       |    max(close) AS hi, min(close) AS lo,
       |    arg_min(close, "timestamp") AS op,
       |    arg_max(close, "timestamp") AS cl
       |  FROM spot_ticks GROUP BY 1, 2
       |),
       |t AS (
       |  SELECT symbol, ${duckRoundTo("ln(hi / lo)", 9)} AS l,
       |    ${duckRoundTo("ln(cl / op)", 9)} AS lc
       |  FROM bars
       |),
       |t2 AS (
       |  SELECT symbol, l * l AS park_t,
       |    0.5 * (l * l) - $gkC * (lc * lc) AS gk_t
       |  FROM t
       |),
       |a AS (
       |  SELECT symbol, count(*) AS n_days,
       |    ${duckDsum("park_t * 1.0E6")} / 1.0E6 / count(*) AS park_var,
       |    ${duckDsum("gk_t * 1.0E6")} / 1.0E6 / count(*) AS gk_var
       |  FROM t2 GROUP BY 1
       |)
       |SELECT symbol, n_days, park_var, gk_var,
       |  sqrt(park_var / $pk4 * 365.0) AS parkinson_vol,
       |  sqrt(CASE WHEN gk_var < 0 THEN 0.0 ELSE gk_var END * 365.0)
       |    AS gk_vol
       |FROM a""".stripMargin
  }

  // ---- M29: Hurst exponent (aggregated-variance method) ----

  private val HurstQs = Seq(1, 2, 4, 8)

  def m29Hurst(s: SparkSession, dir: String): DataFrame =
    Microstructure.hurstExponent(ticks(s, dir), HurstQs)

  val m29Oracle: String = {
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,16)) AS DOUBLE)"
    def roll(q: Int) =
      s"""CAST(sum(rq) OVER (PARTITION BY symbol ORDER BY day
         |      RANGE BETWEEN ${q - 1} PRECEDING AND CURRENT ROW)
         |      AS DECIMAL(12,8)) AS rt_$q,
         |    count(*) OVER (PARTITION BY symbol ORDER BY day
         |      RANGE BETWEEN ${q - 1} PRECEDING AND CURRENT ROW) AS nw_$q"""
        .stripMargin
    val unions = HurstQs.map {
      case 1 => "SELECT symbol, 1 AS q, CAST(1 AS BIGINT) AS nw, rq AS rt FROM rets"
      case q => s"SELECT symbol, $q AS q, nw_$q AS nw, rt_$q AS rt FROM roll"
    }.mkString("\n  UNION ALL\n  ")
    val xCase = HurstQs.map(q =>
      s"WHEN $q THEN ${duckDoubleLit(math.log(q.toDouble))}")
      .mkString("CASE q ", " ", " END")
    s"""WITH $dailyCte,
       |rets AS (
       |  SELECT symbol, day,
       |    CAST(close / lag(close) OVER (
       |      PARTITION BY symbol ORDER BY day) - 1.0
       |      AS DECIMAL(12,8)) AS rq
       |  FROM daily
       |  QUALIFY rq IS NOT NULL
       |),
       |roll AS (
       |  SELECT symbol, day,
       |    ${HurstQs.filter(_ > 1).map(roll).mkString(",\n    ")}
       |  FROM rets
       |),
       |long AS (
       |  $unions
       |),
       |qv AS (
       |  SELECT symbol, q, count(*) AS n_q,
       |    ${d24("sum(rt)")} AS q_s,
       |    ${d24("sum(rt * rt)")} AS q_s2
       |  FROM long WHERE nw = q GROUP BY 1, 2
       |),
       |v AS (
       |  SELECT symbol, q,
       |    (q_s2 - q_s * q_s / qnd) / qnd AS vq
       |  FROM (SELECT *, CAST(n_q AS DOUBLE) AS qnd FROM qv)
       |),
       |pts AS (
       |  SELECT symbol, $xCase AS x, ${duckRoundTo("ln(vq)", 9)} AS y
       |  FROM v WHERE vq > 0
       |),
       |a AS (
       |  SELECT symbol, count(*) AS n_points,
       |    ${duckDsum("x")} AS sx, ${duckDsum("y")} AS sy,
       |    ${duckDsum("x * y")} AS sxy, ${duckDsum("x * x")} AS sxx
       |  FROM pts GROUP BY 1
       |)
       |SELECT symbol, n_points,
       |  (sxy - sx * sy / nd) / nullif(sxx - sx * sx / nd, 0.0) AS slope,
       |  (sxy - sx * sy / nd) / nullif(sxx - sx * sx / nd, 0.0) / 2.0
       |    AS hurst
       |FROM (SELECT *, CAST(n_points AS DOUBLE) AS nd FROM a)"""
      .stripMargin
  }

  // ---- M31: realized skewness / kurtosis ----

  def m31SkewKurt(s: SparkSession, dir: String): DataFrame =
    Microstructure.realizedMoments(ticks(s, dir))

  /** Raw moments re-rendered exactly as the Spark side: r² at
    * DECIMAL(16,12) via round-then-cast (≡ Spark's HALF_UP cast for
    * the non-negative square), deep-scale sums rounded to 16 dp
    * before the DECIMAL(28,16)→DOUBLE render. */
  val m31Oracle: String =
    s"""WITH $dailyCte,
       |rets AS (
       |  SELECT symbol, day,
       |    CAST(close / lag(close) OVER (
       |      PARTITION BY symbol ORDER BY day) - 1.0
       |      AS DECIMAL(12,8)) AS rq
       |  FROM daily
       |  QUALIFY rq IS NOT NULL
       |),
       |t AS (
       |  SELECT symbol, rq,
       |    CAST(round(rq * rq, 12) AS DECIMAL(16,12)) AS r2
       |  FROM rets
       |),
       |t2 AS (
       |  SELECT symbol, rq, r2, rq * r2 AS r3, r2 * r2 AS r4 FROM t
       |),
       |a AS (
       |  SELECT symbol, count(*) AS n_obs,
       |    CAST(CAST(round(sum(rq), 16) AS DECIMAL(28,16)) AS DOUBLE)
       |      AS s1,
       |    CAST(CAST(round(sum(r2), 16) AS DECIMAL(28,16)) AS DOUBLE)
       |      AS s2,
       |    CAST(CAST(round(sum(r3), 16) AS DECIMAL(28,16)) AS DOUBLE)
       |      AS s3,
       |    CAST(CAST(round(sum(r4), 16) AS DECIMAL(28,16)) AS DOUBLE)
       |      AS s4
       |  FROM t2 GROUP BY 1
       |),
       |b AS (SELECT *, CAST(n_obs AS DOUBLE) AS nd FROM a),
       |c AS (SELECT *, s1 / nd AS mean FROM b),
       |d AS (
       |  SELECT *,
       |    s2 / nd - mean * mean AS m2,
       |    s3 / nd - 3.0 * mean * (s2 / nd)
       |      + 2.0 * (mean * mean * mean) AS m3,
       |    s4 / nd - 4.0 * mean * (s3 / nd)
       |      + 6.0 * (mean * mean) * (s2 / nd)
       |      - 3.0 * (mean * mean * mean * mean) AS m4
       |  FROM c
       |)
       |SELECT symbol, n_obs, mean, m2,
       |  m3 / nullif(m2 * sqrt(m2), 0.0) AS skewness,
       |  m4 / nullif(m2 * m2, 0.0) - 3.0 AS ex_kurtosis
       |FROM d""".stripMargin

  // ---- M46: Cornish-Fisher modified VaR ----

  /** M46: Cornish–Fisher modified VaR
    * ([[Microstructure.cornishFisherVar]]) — the oracle wraps the
    * full m31 moment derivation as a subquery and applies the SAME
    * shared expansion text at both confidence levels. */
  def m46CornishFisher(s: SparkSession, dir: String): DataFrame =
    Microstructure.cornishFisherVar(ticks(s, dir))

  val m46Oracle: String = {
    import graft.operators.Microstructure.{cfVarExpr, Z01, Z05}
    s"""SELECT symbol, n_obs, mean, m2, skewness, ex_kurtosis,
       |  ${cfVarExpr(Z05)} AS cf_var_95,
       |  ${cfVarExpr(Z01)} AS cf_var_99
       |FROM (
       |  $m31Oracle
       |)""".stripMargin
  }

  // ---- M32: Sortino / Omega downside-risk panel ----

  def m32Sortino(s: SparkSession, dir: String): DataFrame =
    Microstructure.sortinoOmega(ticks(s, dir))

  val m32Oracle: String = {
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,16)) AS DOUBLE)"
    s"""WITH $dailyCte,
       |rets AS (
       |  SELECT symbol, day,
       |    CAST(close / lag(close) OVER (
       |      PARTITION BY symbol ORDER BY day) - 1.0
       |      AS DECIMAL(12,8)) AS rq
       |  FROM daily
       |  QUALIFY rq IS NOT NULL
       |),
       |a AS (
       |  SELECT symbol, count(*) AS n_obs,
       |    ${d24("sum(rq)")} AS s1,
       |    ${d24("sum(CASE WHEN rq < 0 THEN rq * rq END)")} AS dsq,
       |    ${d24("sum(CASE WHEN rq > 0 THEN rq END)")} AS gains,
       |    ${d24("sum(CASE WHEN rq < 0 THEN -rq END)")} AS losses,
       |    count(CASE WHEN rq > 0 THEN 1 END) AS n_wins
       |  FROM rets GROUP BY 1
       |),
       |b AS (
       |  SELECT *, CAST(n_obs AS DOUBLE) AS nd, s1 / CAST(n_obs AS DOUBLE)
       |    AS mean_ret FROM a
       |),
       |c AS (
       |  SELECT *, sqrt(coalesce(dsq, 0.0) / nd) AS downside_dev FROM b
       |)
       |SELECT symbol, n_obs, mean_ret, downside_dev,
       |  mean_ret / nullif(downside_dev, 0.0) AS sortino,
       |  coalesce(gains, 0.0) / nullif(losses, 0.0) AS omega,
       |  CAST(n_wins AS DOUBLE) / nd AS win_rate
       |FROM c""".stripMargin
  }

  // ---- M34: drawdown spells (time under water) ----

  def m34DrawdownSpells(s: SparkSession, dir: String): DataFrame =
    Microstructure.drawdownSpells(ticks(s, dir))

  val m34Oracle: String =
    s"""WITH $dailyCte,
       |d AS (
       |  SELECT symbol, day, close,
       |    max(close) OVER (PARTITION BY symbol ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
       |  FROM daily
       |),
       |e AS (
       |  SELECT *, CAST(sum(CASE WHEN close >= peak THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY symbol ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS spell
       |  FROM d
       |),
       |g AS (
       |  SELECT symbol, spell, count(*) AS dd_days,
       |    min(close / peak - 1.0) AS depth
       |  FROM e WHERE close < peak GROUP BY 1, 2
       |)
       |SELECT symbol, count(*) AS n_spells, max(dd_days) AS max_dd_days,
       |  min(depth) AS worst_depth
       |FROM g GROUP BY 1""".stripMargin

  // ---- M37: OU/AR(1) mean-reversion half-life ----

  def m37OuHalflife(s: SparkSession, dir: String): DataFrame =
    graft.operators.TailDynamics.ouHalfLife(ticks(s, dir))

  val m37Oracle: String = {
    def d24(e: String) = s"CAST(CAST(($e) AS DECIMAL(24,10)) AS DOUBLE)"
    val center = duckDoubleLit(graft.operators.TailDynamics.OuCenter)
    s"""WITH $dailyCte,
       |x AS (
       |  SELECT symbol, day,
       |    CAST(${duckRoundTo(s"ln(close) - $center", 5)}
       |      AS DECIMAL(14,5)) AS xq
       |  FROM daily
       |),
       |p AS (
       |  SELECT symbol, xq,
       |    lag(xq) OVER (PARTITION BY symbol ORDER BY day) AS xp
       |  FROM x QUALIFY xp IS NOT NULL
       |),
       |a AS (
       |  SELECT symbol, count(*) AS n_pairs,
       |    ${d24("sum(xp)")} AS sx, ${d24("sum(xq)")} AS sy,
       |    ${d24("sum(xp * xq)")} AS sxy, ${d24("sum(xp * xp)")} AS sxx
       |  FROM p GROUP BY 1
       |),
       |r AS (
       |  SELECT symbol, n_pairs,
       |    (nd*sxy - sx*sy) / nullif(nd*sxx - sx*sx, 0.0) AS rho
       |  FROM (SELECT *, CAST(n_pairs AS DOUBLE) AS nd FROM a)
       |)
       |SELECT symbol, n_pairs, rho,
       |  CASE WHEN rho > 0.0 AND rho < 1.0
       |    THEN ${duckRoundTo(s"${duckDoubleLit(-math.log(2.0))} / ln(rho)", 6)}
       |  END AS half_life_days
       |FROM r""".stripMargin
  }

  // ---- M38: Hill tail-index estimator ----

  def m38HillTail(s: SparkSession, dir: String): DataFrame =
    graft.operators.TailDynamics.hillTail(ticks(s, dir))

  val m38Oracle: String =
    s"""WITH ${SyntheticTrades.spotCte},
       |bars AS (
       |  SELECT symbol, ep - ep % 900 AS bucket,
       |    arg_max(close, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep
       |        FROM spot_ticks)
       |  GROUP BY 1, 2
       |),
       |rets AS (
       |  SELECT symbol,
       |    CAST(abs(close / lag(close) OVER (
       |      PARTITION BY symbol ORDER BY bucket) - 1.0)
       |      AS DECIMAL(12,8)) AS aq
       |  FROM bars QUALIFY aq IS NOT NULL AND aq > 0
       |),
       |ranked AS (
       |  SELECT symbol, aq,
       |    row_number() OVER (PARTITION BY symbol ORDER BY aq) AS rn,
       |    count(*) OVER (PARTITION BY symbol) AS n
       |  FROM rets
       |),
       |th AS (
       |  SELECT symbol, max(n) AS n_returns,
       |    max(CASE WHEN rn = (n * 9 + 9) // 10 THEN aq END) AS u
       |  FROM ranked GROUP BY 1
       |),
       |exc AS (
       |  SELECT r.symbol, t.n_returns, t.u,
       |    ${duckRoundTo(
             "ln(CAST(r.aq AS DOUBLE) / CAST(t.u AS DOUBLE))", 9)} AS lt
       |  FROM rets r JOIN th t USING (symbol)
       |  WHERE r.aq > t.u
       |)
       |SELECT symbol, max(n_returns) AS n_returns,
       |  count(*) AS k_tail,
       |  CAST(max(u) AS DOUBLE) AS u_threshold,
       |  CAST(count(*) AS DOUBLE) / nullif(${duckDsum("lt")}, 0.0) AS alpha
       |FROM exc GROUP BY symbol""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "m37_ou_halflife" -> QueryDef(m37OuHalflife _, m37Oracle),
    "m38_hill_tail" -> QueryDef(m38HillTail _, m38Oracle),
    "m34_drawdown_spells" -> QueryDef(m34DrawdownSpells _, m34Oracle),
    "m32_sortino" -> QueryDef(m32Sortino _, m32Oracle),
    "m31_skew_kurt" -> QueryDef(m31SkewKurt _, m31Oracle),
    "m46_cornish_fisher" -> QueryDef(m46CornishFisher _, m46Oracle),
    "m30_range_vol" -> QueryDef(m30RangeVol _, m30Oracle),
    "m29_hurst" -> QueryDef(m29Hurst _, m29Oracle),
    "m28_triple_barrier" -> QueryDef(m28TripleBarrier _, m28Oracle),
    "m25_roll_spread" -> QueryDef(m25RollSpread _, m25Oracle),
    "m26_cs_spread" -> QueryDef(m26CsSpread _, m26Oracle),
    "m27_variance_ratio" -> QueryDef(m27VarianceRatio _, m27Oracle))
}
