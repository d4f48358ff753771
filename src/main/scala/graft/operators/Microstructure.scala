package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes.createDecimalType

import graft.util.Parity

/** Classic microstructure estimators over the spot feed (the
  * reference samples its `ohlcv` table only for enrichment,
  * reference `features/spot_provider.py:90-95` — it never estimates
  * effective spreads or tests the random walk): Roll's implied
  * spread from first-difference serial covariance (Roll 1984),
  * the Corwin–Schultz high–low spread estimator (2012), and the
  * Lo–MacKinlay variance-ratio statistic (1988).
  *
  * Distributed shape shared with [[PricePath]]: tick tape → daily
  * table is ONE hash aggregate keyed (symbol, day); every estimator
  * after runs per-symbol windows over day-count-sized partitions —
  * one key per asset, thousands of parallel keys in a real
  * universe, never a global sort, never a re-scan of the tape.
  *
  * Exactness: daily closes/highs/lows are exact doubles; price
  * first-differences are single exactly-rounded IEEE subtractions;
  * covariance terms go through DECIMAL(28,6) sums (order-free) and
  * close over doubles with the same spelled-out formula as the
  * oracle. The one transcendental chain (Corwin–Schultz's ln/exp)
  * is quantized per-day at 9 dp before any aggregation, the
  * [[Parity.roundTo]] contract. */
object Microstructure {

  private val d8 = createDecimalType(12, 8)
  private def d24(c: Column): Column =
    c.cast(createDecimalType(24, 16)).cast("double")

  /** M25: Roll's implied effective spread, per symbol.
    * s = 2·√(−cov(Δp_t, Δp_{t−1})) when the serial covariance is
    * negative (bid-ask bounce), null otherwise. Population
    * covariance from exact decimal sums. */
  def rollSpread(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    val dp = PricePath.dailyCloses(ticks)
      .withColumn("dp", col("close") - lag(col("close"), 1).over(w))
      .withColumn("dl", lag(col("dp"), 1).over(w))
      .filter(col("dp").isNotNull && col("dl").isNotNull)
    dp.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_pairs"),
        Parity.dsum(col("dp")).as("sx"),
        Parity.dsum(col("dl")).as("sy"),
        Parity.dsum(col("dp") * col("dl")).as("sxy"))
      .withColumn("nd", col("n_pairs").cast("double"))
      .withColumn("autocov",
        (col("sxy") - col("sx") * col("sy") / col("nd")) / col("nd"))
      .withColumn("roll_spread",
        when(col("autocov") < 0, lit(2.0) * sqrt(-col("autocov"))))
      .select("symbol", "n_pairs", "autocov", "roll_spread")
  }

  /** M26: Corwin–Schultz high–low spread, per symbol. Daily spread
    * estimates from adjacent-day high/low ranges (calendar-adjacent
    * only), 9-dp quantized, then summarized: n_days, mean, max and
    * positive-estimate rate (the estimator goes negative in quiet
    * pairs — reported, not clamped). */
  def corwinSchultz(ticks: DataFrame): DataFrame = {
    val k = 3.0 - 2.0 * math.sqrt(2.0)
    val daily = ticks
      .withColumn("day", expr("unix_timestamp(timestamp) div 86400L"))
      .groupBy(col("symbol"), col("day"))
      .agg(max(col("close")).as("hi"), min(col("close")).as("lo"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    val paired = daily
      .withColumn("hp", lag(col("hi"), 1).over(w))
      .withColumn("lp", lag(col("lo"), 1).over(w))
      .withColumn("pd", lag(col("day"), 1).over(w))
      .filter(col("pd").isNotNull && col("day") === col("pd") + 1)
    // squares spelled as products (not pow) so the oracle's DuckDB
    // arithmetic is op-for-op identical
    val l1 = log(col("hi") / col("lo"))
    val l2 = log(col("hp") / col("lp"))
    val lg = log(greatest(col("hi"), col("hp")) /
      least(col("lo"), col("lp")))
    val beta = l1 * l1 + l2 * l2
    val gamma = lg * lg
    val alpha = (sqrt(lit(2.0) * col("beta")) - sqrt(col("beta"))) /
      lit(k) - sqrt(col("gamma") / lit(k))
    val spread = lit(2.0) * (exp(col("alpha")) - 1.0) /
      (exp(col("alpha")) + 1.0)
    paired
      .withColumn("beta", beta)
      .withColumn("gamma", gamma)
      .withColumn("alpha", alpha)
      .withColumn("sp", Parity.roundTo(spread, 9))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_days"),
        (Parity.dsum(col("sp") * lit(1e3)) / lit(1e3) /
          count(lit(1))).as("cs_spread_mean"),
        max(col("sp")).as("cs_spread_max"),
        (count(when(col("sp") > 0, 1)).cast("double") /
          count(lit(1)).cast("double")).as("pos_rate"))
  }

  /** M27: Lo–MacKinlay variance ratio VR(q) = Var(r_q)/(q·Var(r_1))
    * per symbol for each q, on the shared DECIMAL(12,8) daily simple
    * returns. q-period returns are overlapping calendar-range window
    * sums (full windows only); both variances are population
    * variances closed over exact decimal sums. VR ≈ 1 under a random
    * walk; < 1 signals mean reversion. Both horizons come out of ONE
    * pass (two range windows + stack); the base-variance table is
    * symbols-sized and broadcast into the final join. */
  def varianceRatio(ticks: DataFrame, qs: Seq[Int] = Seq(2, 5)): DataFrame = {
    val daily = graft.util.Caches.materialize(PricePath.dailyCloses(ticks))
    val rets = PricePath.quantRet(daily)

    val base = rets.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_base"),
        d24(sum(col("rq"))).as("b_s"),
        d24(sum(col("rq") * col("rq"))).as("b_s2"))
      .withColumn("nd", col("n_base").cast("double"))
      .withColumn("var1",
        (col("b_s2") - col("b_s") * col("b_s") / col("nd")) / col("nd"))
      .select("symbol", "n_base", "var1")

    val withRoll = qs.foldLeft(rets) { (df, q) =>
      val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
        .rangeBetween(-(q - 1).toLong, 0L)
      df.withColumn(s"rt_$q", sum(col("rq")).over(w).cast(d8))
        .withColumn(s"nw_$q", count(lit(1)).over(w))
    }
    val stackArgs = qs.map(q => s"$q, nw_$q, rt_$q").mkString(", ")
    val qvar = withRoll
      .select(col("symbol"),
        expr(s"stack(${qs.size}, $stackArgs) as (q, nw, rt)"))
      .filter(col("nw") === col("q"))
      .groupBy(col("symbol"), col("q"))
      .agg(
        count(lit(1)).as("n_q"),
        d24(sum(col("rt"))).as("q_s"),
        d24(sum(col("rt") * col("rt"))).as("q_s2"))
      .withColumn("qnd", col("n_q").cast("double"))
      .withColumn("varq",
        (col("q_s2") - col("q_s") * col("q_s") / col("qnd")) / col("qnd"))

    qvar.join(broadcast(base), "symbol")
      .withColumn("vr", col("varq") /
        (col("q").cast("double") * col("var1")))
      .select("symbol", "q", "n_base", "n_q", "var1", "varq", "vr")
  }

  /** M30: range-based daily volatility — Parkinson (1980) and
    * Garman–Klass (1980) estimators from daily OHLC bars, annualized.
    * One (symbol, day)-keyed hash aggregate builds the bars
    * (min/max + first/last by timestamp, all map-side-combinable);
    * the per-day terms then reduce per symbol.
    *
    * Exactness: ln(H/L) and ln(C/O) are 9-dp-quantized (the ≤1-ulp
    * transcendental contract), squares/products are then exact
    * doubles, and the term sums ride a ×1e6-scaled decimal grid
    * (terms are ~1e-6..1e-2; a raw 6-dp dsum would flush them). */
  def rangeVol(ticks: DataFrame): DataFrame = {
    val gkC = 2.0 * math.log(2.0) - 1.0
    val bars = ticks
      .withColumn("day", expr("unix_timestamp(timestamp) div 86400L"))
      .groupBy(col("symbol"), col("day"))
      .agg(
        max(col("close")).as("hi"), min(col("close")).as("lo"),
        min_by(col("close"), col("timestamp")).as("op"),
        max_by(col("close"), col("timestamp")).as("cl"))
    val terms = bars
      .withColumn("l", Parity.roundTo(log(col("hi") / col("lo")), 9))
      .withColumn("lc", Parity.roundTo(log(col("cl") / col("op")), 9))
      .withColumn("park_t", col("l") * col("l"))
      .withColumn("gk_t",
        lit(0.5) * (col("l") * col("l")) - lit(gkC) * (col("lc") * col("lc")))
    terms.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_days"),
        (Parity.dsum(col("park_t") * lit(1e6)) / lit(1e6) /
          count(lit(1))).as("park_var"),
        (Parity.dsum(col("gk_t") * lit(1e6)) / lit(1e6) /
          count(lit(1))).as("gk_var"))
      .withColumn("parkinson_vol",
        sqrt(col("park_var") / (4.0 * math.log(2.0)) * 365.0))
      .withColumn("gk_vol",
        sqrt(when(col("gk_var") < 0, 0.0).otherwise(col("gk_var")) * 365.0))
  }

  /** M29: Hurst exponent by the aggregated-variance method —
    * Var(r_q) ~ q^{2H}, so H is half the OLS slope of ln Var(r_q) on
    * ln q over q ∈ {1,2,4,8}. Reuses the m27 window machinery (range
    * windows over the DECIMAL(12,8) daily returns, full windows
    * only); the regression runs over 4 points per symbol with
    * order-free decimal sums, so the hash is stable under any row
    * order. H ≈ 0.5 is a random walk; < 0.5 mean reversion. */
  def hurstExponent(ticks: DataFrame,
      qs: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val daily = graft.util.Caches.materialize(PricePath.dailyCloses(ticks))
    val rets = PricePath.quantRet(daily)
    val withRoll = qs.filter(_ > 1).foldLeft(rets) { (df, q) =>
      val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
        .rangeBetween(-(q - 1).toLong, 0L)
      df.withColumn(s"rt_$q", sum(col("rq")).over(w).cast(d8))
        .withColumn(s"nw_$q", count(lit(1)).over(w))
    }
    val stackArgs = qs.map {
      case 1 => "1, 1L, rq"
      case q => s"$q, nw_$q, rt_$q"
    }.mkString(", ")
    // x = ln q enters as a driver literal so both engines see the
    // identical IEEE double (no engine-side ln of the same constant)
    val lnq = qs.map(q => q -> math.log(q.toDouble)).toMap
    val xCol = qs.tail.foldLeft(when(col("q") === qs.head, lnq(qs.head))) {
      (c, q) => c.when(col("q") === q, lnq(q))
    }
    val varPts = withRoll
      .select(col("symbol"),
        expr(s"stack(${qs.size}, $stackArgs) as (q, nw, rt)"))
      .filter(col("nw") === col("q"))
      .groupBy(col("symbol"), col("q"))
      .agg(
        count(lit(1)).as("n_q"),
        d24(sum(col("rt"))).as("q_s"),
        d24(sum(col("rt") * col("rt"))).as("q_s2"))
      .withColumn("qnd", col("n_q").cast("double"))
      .withColumn("vq",
        (col("q_s2") - col("q_s") * col("q_s") / col("qnd")) / col("qnd"))
      .filter(col("vq") > 0)
      .withColumn("y", Parity.roundTo(log(col("vq")), 9))
      .withColumn("x", xCol)
    varPts.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_points"),
        Parity.dsum(col("x")).as("sx"),
        Parity.dsum(col("y")).as("sy"),
        Parity.dsum(col("x") * col("y")).as("sxy"),
        Parity.dsum(col("x") * col("x")).as("sxx"))
      .withColumn("nd", col("n_points").cast("double"))
      .withColumn("slope",
        (col("sxy") - col("sx") * col("sy") / col("nd"))
          / nullif(col("sxx") - col("sx") * col("sx") / col("nd"),
            lit(0.0)))
      .withColumn("hurst", col("slope") / 2.0)
      .select("symbol", "n_points", "slope", "hurst")
  }

  /** M32: downside-risk panel — Sortino ratio (mean over downside
    * deviation), Omega ratio (gross gains over gross losses at a zero
    * threshold) and win rate, per symbol. One symbol-keyed aggregate
    * over the shared DECIMAL(12,8) returns; every sum is conditional
    * decimal arithmetic (scale ≤ 16 — no deep-scale renders needed),
    * ratios are single double divisions with nullif guards. */
  def sortinoOmega(ticks: DataFrame): DataFrame = {
    val rets = PricePath.quantRet(PricePath.dailyCloses(ticks))
    rets.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_obs"),
        d24(sum(col("rq"))).as("s1"),
        d24(sum(when(col("rq") < 0, col("rq") * col("rq")))).as("dsq"),
        d24(sum(when(col("rq") > 0, col("rq")))).as("gains"),
        d24(sum(when(col("rq") < 0, -col("rq")))).as("losses"),
        count(when(col("rq") > 0, 1)).as("n_wins"))
      .withColumn("nd", col("n_obs").cast("double"))
      .withColumn("mean_ret", col("s1") / col("nd"))
      .withColumn("downside_dev",
        sqrt(coalesce(col("dsq"), lit(0.0)) / col("nd")))
      .withColumn("sortino",
        col("mean_ret") / nullif(col("downside_dev"), lit(0.0)))
      .withColumn("omega",
        coalesce(col("gains"), lit(0.0))
          / nullif(col("losses"), lit(0.0)))
      .withColumn("win_rate",
        col("n_wins").cast("double") / col("nd"))
      .select("symbol", "n_obs", "mean_ret", "downside_dev", "sortino",
        "omega", "win_rate")
  }

  /** M34: drawdown spells — the islands-and-gaps dual of a26's
    * single max drawdown: every run of days strictly under the
    * running peak is a spell (a re-touch of the peak closes it);
    * per symbol, the spell count, the longest time-under-water and
    * the deepest trough. Two stacked per-symbol windows over the
    * calendar-bounded daily table, then two tiny aggregates — all
    * exact double compares/divisions, no grid. */
  def drawdownSpells(ticks: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("symbol")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    PricePath.dailyCloses(ticks)
      .withColumn("peak", max(col("close")).over(wCum))
      .withColumn("spell", sum(
        when(col("close") >= col("peak"), 1).otherwise(0)
          .cast("long")).over(wCum))
      .filter(col("close") < col("peak"))
      .groupBy(col("symbol"), col("spell"))
      .agg(count(lit(1)).as("dd_days"),
        min(col("close") / col("peak") - 1.0).as("depth"))
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_spells"),
        max(col("dd_days")).as("max_dd_days"),
        min(col("depth")).as("worst_depth"))
  }

  /** M31: realized higher moments — skewness and excess kurtosis of
    * daily returns per symbol, the crash-risk panel (negative skew /
    * fat tails) the vol estimators can't see. One symbol-keyed
    * aggregate over the shared DECIMAL(12,8) returns; central moments
    * close over four raw-moment sums on the driver-free double chain
    * both engines spell identically.
    *
    * Exactness (the SmileFit pinned-scale contract): r² is re-rendered
    * at DECIMAL(16,12) (positive → Spark's HALF_UP cast ≡ DuckDB
    * round-then-cast), r³ = r·r² and r⁴ = r²·r² stay exact; the
    * deep-scale sums (scale 20/24) are rendered at DECIMAL(28,16)
    * before the double cast so their integer value fits 2⁵³ — raw
    * scale-24 decimal→double conversion differs by 1 ulp between
    * engines. */
  def realizedMoments(ticks: DataFrame): DataFrame = {
    val d16r = createDecimalType(16, 12)
    val rets = PricePath.quantRet(PricePath.dailyCloses(ticks))
      .withColumn("r2", (col("rq") * col("rq")).cast(d16r))
      .withColumn("r3", col("rq") * col("r2"))
      .withColumn("r4", col("r2") * col("r2"))
    def render(c: Column): Column =
      sum(c).cast(createDecimalType(28, 16)).cast("double")
    val agg = rets.groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_obs"),
        render(col("rq")).as("s1"),
        render(col("r2")).as("s2"),
        render(col("r3")).as("s3"),
        render(col("r4")).as("s4"))
      .withColumn("nd", col("n_obs").cast("double"))
      .withColumn("mean", col("s1") / col("nd"))
    val m = col("mean")
    agg
      .withColumn("m2",
        col("s2") / col("nd") - m * m)
      .withColumn("m3",
        col("s3") / col("nd") - lit(3.0) * m * (col("s2") / col("nd"))
          + lit(2.0) * (m * m * m))
      .withColumn("m4",
        col("s4") / col("nd") - lit(4.0) * m * (col("s3") / col("nd"))
          + lit(6.0) * (m * m) * (col("s2") / col("nd"))
          - lit(3.0) * (m * m * m * m))
      .withColumn("skewness",
        col("m3") / nullif(col("m2") * sqrt(col("m2")), lit(0.0)))
      .withColumn("ex_kurtosis",
        col("m4") / nullif(col("m2") * col("m2"), lit(0.0)) - 3.0)
      .select("symbol", "n_obs", "mean", "m2", "skewness", "ex_kurtosis")
  }

  /** Φ⁻¹(0.05) and Φ⁻¹(0.01) — the left-tail normal quantiles of the
    * standard VaR confidence levels, full-precision literals shared
    * with the oracle text. */
  val Z05: Double = -1.6448536269514722
  val Z01: Double = -2.3263478740408408

  /** The Cornish–Fisher expansion of a quantile under skew s and
    * excess kurtosis k: z_cf = z + (z²−1)s/6 + (z³−3z)k/24 −
    * (2z³−5z)s²/36 — shared text over [[realizedMoments]]'s output
    * columns. The z literal goes through a string→DOUBLE cast (valid
    * in BOTH engines): a bare 17-digit literal parses as DECIMAL in
    * DuckDB and z³ then overflows the 38-digit scale. */
  def cfVarExpr(z: Double): String = {
    val zl = graft.util.Parity.duckDoubleLit(z)
    s"""(mean + sqrt(m2) * ($zl
       | + ($zl * $zl - 1.0) * skewness / 6.0
       | + ($zl * $zl * $zl - 3.0 * $zl) * ex_kurtosis / 24.0
       | - (2.0 * $zl * $zl * $zl - 5.0 * $zl)
       |   * skewness * skewness / 36.0))""".stripMargin
  }

  /** M46: Cornish–Fisher modified VaR per symbol — the parametric
    * companion to the rank-based historical VaR (m45): expand the
    * normal quantile with the realized skew and excess kurtosis
    * (Cornish–Fisher), so fat left tails and negative skew push the
    * VaR level further out than the plain mean + σ·z Gaussian read.
    * Runs entirely on [[realizedMoments]]'s gated moment panel — no
    * new scan shape, pure shared-text double algebra. */
  def cornishFisherVar(ticks: DataFrame): DataFrame =
    realizedMoments(ticks)
      .withColumn("cf_var_95", expr(cfVarExpr(Z05)))
      .withColumn("cf_var_99", expr(cfVarExpr(Z01)))
      .select(col("symbol"), col("n_obs"), col("mean"), col("m2"),
        col("skewness"), col("ex_kurtosis"), col("cf_var_95"),
        col("cf_var_99"))

  /** M28: triple-barrier labeling (López de Prado) — the standard
    * supervised-learning label generator for financial ML: every day
    * is an entry; the label is which barrier the path hits first
    * within the horizon — upper (+1, at entry·(1+up)), lower (−1, at
    * entry·(1−dn)), or the vertical time barrier (0, exit at the
    * last available day ≤ horizon).
    *
    * Scale shape: entry×future pairing is NOT a range self-join — the
    * entry side explodes into `horizon` (day+k) probe keys and the
    * pairing is a hash EQUI-join on (symbol, day), bounded fan-out of
    * `horizon` rows per entry, shuffle-partitioned on the join key.
    * At 100 TB this is a fixed 10× map amplification feeding a
    * standard shuffle join — no per-symbol cartesian anywhere.
    *
    * Exactness: closes are exact doubles; barrier levels and exit
    * returns are single exactly-rounded IEEE ops (mul/div/sub), so
    * raw doubles hash-match the oracle with no grid. */
  def tripleBarrier(ticks: DataFrame, upPct: Double = 0.02,
      dnPct: Double = 0.02, horizon: Int = 10): DataFrame = {
    val daily = graft.util.Caches.materialize(PricePath.dailyCloses(ticks))
    val entries = daily
      .select(col("symbol"), col("day"), col("close").as("c0"))
      .withColumn("k", explode(lit((1 to horizon).toArray)))
      .withColumn("fday", col("day") + col("k"))
    val future = daily.select(col("symbol"), col("day").as("fday"),
      col("close").as("cf"))
    val hits = entries.join(future, Seq("symbol", "fday"))
      .withColumn("hd",
        when(col("cf") >= col("c0") * (1.0 + upPct), 1)
          .when(col("cf") <= col("c0") * (1.0 - dnPct), -1)
          .otherwise(0))
    hits.groupBy(col("symbol"), col("day"), col("c0"))
      .agg(
        count(lit(1)).as("n_future"),
        min(when(col("hd") =!= 0,
          struct(col("k"), col("hd"), col("cf")))).as("hit"),
        max(col("k")).as("last_k"),
        max_by(col("cf"), col("k")).as("last_cf"))
      .select(
        col("symbol"), col("day"), col("n_future"),
        coalesce(col("hit.hd"), lit(0)).as("label"),
        coalesce(col("hit.k"), col("last_k")).as("days_to_exit"),
        (coalesce(col("hit.cf"), col("last_cf")) / col("c0") - 1.0)
          .as("exit_ret"))
  }
}
