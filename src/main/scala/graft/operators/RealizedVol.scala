package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Realized-volatility estimators over intraday price bars — the
  * natural extension of the reference's IV-bar family (SURVEY §2.4
  * A2/A3, `features/resampler.py:25-111`) to the *price* path: where
  * the reference resamples implied vol, the same OHLC machinery over
  * trade prices yields the classical daily realized-variance
  * estimators (close-to-close RV, Parkinson range, Garman-Klass,
  * Rogers-Satchell) that an options desk runs next to the implied
  * series (the IV-vs-realized spread is the EGARCH family's whole
  * point, `egarch.py:302-308`).
  *
  * Numerics: every per-bar term is an ln-product, quantized to the
  * Parity 1e-6 grid before the order-free DECIMAL sum, so the DuckDB
  * oracle hash-matches despite 1-ulp libm differences. Daily ratios
  * are (exact sum / bar count) — identical IEEE ops on both engines.
  *
  * Scale: bars are one hash aggregate keyed (underlying, bucket) —
  * map-side partials, no skew (bar cardinality grows with the time
  * range, not the data volume). The day roll-up re-keys to the
  * coarser (underlying, day): one more exchange whose input is
  * already bar-sized (~5 orders smaller than the trades), and the
  * lag() window shares that day partitioning, so window + final
  * aggregate run inside a single exchange.
  */
object RealizedVol {

  /** 1 / (4 ln 2) — Parkinson (1980) range-variance coefficient. */
  val ParkinsonCoef: Double = 1.0 / (4.0 * math.log(2.0))

  /** 2 ln 2 − 1 — Garman-Klass (1980) cross-term coefficient. */
  val GkCoef: Double = 2.0 * math.log(2.0) - 1.0

  /** Price OHLC bars per (underlying, `intervalSec` bucket).
    * Open/close are min_by/max_by on the trade timestamp (the a2
    * argMin/argMax discipline — deterministic, timestamps are unique
    * in the fact table). Non-positive prices are dropped up front:
    * every estimator below is a log-price functional. */
  def priceBars(trades: DataFrame, intervalSec: Long = 900L): DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    trades
      .filter(col("price") > 0)
      .withColumn("bucket_start", ep - ep % intervalSec)
      .groupBy(col("underlying"), col("bucket_start"))
      .agg(
        min_by(col("price"), col("timestamp")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("timestamp")).as("close"),
        count(lit(1)).as("n_trades"))
  }

  /** Daily realized-variance estimators per underlying from intraday
    * bars: `rv_cc` (sum of squared intra-day bar-close log returns),
    * `parkinson`, `garman_klass`, `rogers_satchell` (per-bar range
    * terms averaged over the day's bars), plus `rv_vol` = sqrt(rv_cc).
    * A one-bar day has rv_cc = 0 (no return inside the day) and
    * n_returns = 0. */
  def dailyEstimators(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val h = col("high"); val l = col("low")
    val o = col("open"); val c = col("close")
    val lhl = log(h / l)
    val lco = log(c / o)
    val terms = priceBars(trades, intervalSec)
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .withColumn("_lhl2", Parity.roundTo(lhl * lhl, 6))
      .withColumn("_gk",
        Parity.roundTo(lit(0.5) * lhl * lhl - lit(GkCoef) * lco * lco, 6))
      .withColumn("_rs",
        Parity.roundTo(
          log(h / c) * log(h / o) + log(l / c) * log(l / o), 6))
    val byDay = Window
      .partitionBy(col("underlying"), col("day_start"))
      .orderBy(col("bucket_start"))
    val n = count(lit(1))
    terms
      .withColumn("_r", log(c / lag(c, 1).over(byDay)))
      .withColumn("_r2", Parity.roundTo(col("_r") * col("_r"), 6))
      .groupBy(col("underlying"), col("day_start"))
      .agg(
        n.as("n_bars"),
        count(col("_r")).as("n_returns"),
        coalesce(Parity.dsum(col("_r2")), lit(0.0)).as("rv_cc"),
        ((Parity.dsum(col("_lhl2")) / n) * lit(ParkinsonCoef))
          .as("parkinson"),
        (Parity.dsum(col("_gk")) / n).as("garman_klass"),
        (Parity.dsum(col("_rs")) / n).as("rogers_satchell"))
      .withColumn("rv_vol", sqrt(col("rv_cc")))
  }

  /** RiskMetrics-style EWMA variance over intra-day bar returns, one
    * row per return bar: ewma_t = Σ_{i<=t} λ^{t-i} r_i² · (1−λ) /
    * (1−λ^t) (truncated-weight normalization, so t=1 gives r²).
    *
    * Exact-parity shape: the closed form λ^t · Σ λ^{-i} r_i² turns
    * the recursion into ONE running DECIMAL sum per day partition —
    * no recursion, no O(n²) window. λ^{-i} is bounded by the day
    * length (λ^{-96} ≈ 382 at 15-min bars), so nothing overflows at
    * any corpus size. Every pow() output is quantized before use —
    * Java and libm pow disagree by 1 ulp, and a raw pow inside the
    * summed term would hash-diverge; after quantization every
    * multiply/divide is identical IEEE on both engines. */
  def ewmaSeries(trades: DataFrame, lambda: Double = 0.94,
      intervalSec: Long = 900L): DataFrame = {
    val byDay = Window
      .partitionBy(col("underlying"), col("day_start"))
      .orderBy(col("bucket_start"))
    val running = byDay
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = col("close")
    priceBars(trades, intervalSec)
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .withColumn("_r", log(c / lag(c, 1).over(byDay)))
      .filter(col("_r").isNotNull)
      .withColumn("bar_rn", row_number().over(byDay))
      .withColumn("r2", Parity.roundTo(col("_r") * col("_r"), 6))
      .withColumn("_pneg",
        Parity.roundTo(pow(lit(lambda), -col("bar_rn")), 6))
      .withColumn("_s",
        sum((col("_pneg") * col("r2"))
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(28, 6))).over(running).cast("double"))
      .withColumn("_ppos",
        Parity.roundTo(pow(lit(lambda), col("bar_rn")), 12))
      .withColumn("ewma_var",
        Parity.roundTo(
          col("_ppos") * lit(1.0 - lambda) * col("_s")
            / (lit(1.0) - col("_ppos")), 9))
      .withColumn("ewma_vol", sqrt(col("ewma_var")))
      .select(col("underlying"), col("day_start"), col("bucket_start"),
        col("bar_rn"), col("r2"), col("ewma_var"), col("ewma_vol"))
  }

  /** M40: vol-of-vol panel per underlying — the volatility-clustering
    * read on top of [[dailyEstimators]]: the daily rv_vol series'
    * count, mean, sample stddev and lag-1 autocorrelation (persistent
    * vol ⇒ acf1 ≫ 0, the stylized fact EGARCH exists to model).
    * Everything runs on the TINY (underlyings × days) daily table;
    * the only corpus-sized work is m7's bar aggregate. Parity: rv_vol
    * is quantized once to DECIMAL(10,6), all moment/cross sums are
    * exact decimal gated through DECIMAL(24,12) (unscaled < 2^53 —
    * the m37 lesson), and the Pearson algebra is the shared SpotCorr
    * spelling on identical doubles. acf1 is null with < 3 days. */
  def volOfVol(trades: DataFrame, intervalSec: Long = 900L): DataFrame = {
    val d6 = org.apache.spark.sql.types.DataTypes.createDecimalType(10, 6)
    val d24 = org.apache.spark.sql.types.DataTypes.createDecimalType(24, 12)
    val w = Window.partitionBy(col("underlying")).orderBy(col("day_start"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast(d24).cast("double")
    dailyEstimators(trades, intervalSec)
      .select(col("underlying"), col("day_start"),
        Parity.roundTo(col("rv_vol"), 6).cast(d6).as("rq"))
      .withColumn("rp", lag(col("rq"), 1).over(w))
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_days"),
        dbl(sum(col("rq"))).as("_s"),
        dbl(sum(col("rq") * col("rq"))).as("_s2"),
        count(col("rp")).as("_np"),
        dbl(sum(col("rp"))).as("_px"),
        dbl(sum(when(col("rp").isNotNull, col("rq")))).as("_py"),
        dbl(sum(col("rp") * col("rq"))).as("_pxy"),
        dbl(sum(col("rp") * col("rp"))).as("_pxx"),
        dbl(sum(when(col("rp").isNotNull, col("rq") * col("rq"))))
          .as("_pyy"))
      .withColumn("nd", col("n_days").cast("double"))
      .withColumn("npd", col("_np").cast("double"))
      .withColumn("mean_rv", expr("_s / nd"))
      .withColumn("std_rv", expr(
        "sqrt(CASE WHEN (_s2 - _s*_s/nd) / nullif(nd - 1.0, 0.0) < 0" +
          " THEN 0.0 ELSE (_s2 - _s*_s/nd) / nullif(nd - 1.0, 0.0) END)"))
      .withColumn("acf1_rv", when(col("_np") >= 2, expr(
        "(npd*_pxy - _px*_py) / nullif(" +
          "sqrt((npd*_pxx - _px*_px) * (npd*_pyy - _py*_py)), 0.0)")))
      .select(col("underlying"), col("n_days"), col("mean_rv"),
        col("std_rv"), col("acf1_rv"))
  }

  /** μ₁⁻² = π/2 — the bipower-variation scaling constant
    * (E|Z| = √(2/π) for standard normal Z). */
  val BipowerCoef: Double = math.Pi / 2.0

  /** M39: Barndorff–Nielsen–Shephard jump panel per (underlying,
    * day): realized variance rv = Σ r², bipower variation
    * bv = (π/2)·Σ|r_i||r_{i−1}| over ADJACENT intraday bar returns
    * (robust to jumps — a single jump inflates rv through r² but
    * touches bv only via two |r|·|r| cross terms), and
    * `jump_frac` = max(0, 1 − bv/rv), the relative jump contribution
    * (Huang–Tauchen). No small-sample n/(n−1) correction —
    * documented, matched by the oracle. Parity: each |r|·|r| product
    * is 6-dp-quantized before the exact decimal sum; the π/2
    * constant multiplies the SUM once (bit-identical literal both
    * engines). Same two-exchange shape as [[dailyEstimators]]: bar
    * aggregate, then a day-partitioned lag chain and one grouped
    * aggregate. Days with <2 returns have bv = 0 and a null
    * jump_frac (no adjacent pair to compare). */
  def jumpTest(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val byDay = Window
      .partitionBy(col("underlying"), col("day_start"))
      .orderBy(col("bucket_start"))
    val c = col("close")
    priceBars(trades, intervalSec)
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .withColumn("_r", log(c / lag(c, 1).over(byDay)))
      .withColumn("_r2", Parity.roundTo(col("_r") * col("_r"), 6))
      .withColumn("_bp",
        Parity.roundTo(abs(col("_r")) * abs(lag(col("_r"), 1).over(byDay)), 6))
      .groupBy(col("underlying"), col("day_start"))
      .agg(
        count(col("_r")).as("n_returns"),
        coalesce(Parity.dsum(col("_r2")), lit(0.0)).as("rv_cc"),
        (coalesce(Parity.dsum(col("_bp")), lit(0.0)) * lit(BipowerCoef))
          .as("bv"))
      .withColumn("jump_frac",
        when(col("rv_cc") > 0.0 && col("n_returns") >= 2,
          greatest(lit(0.0), lit(1.0) - col("bv") / col("rv_cc"))))
  }

  /** M42: realized semivariance per (underlying, day) —
    * Barndorff-Nielsen, Kinnebrock & Shephard (2010): rv splits
    * EXACTLY into the upside leg rsv⁺ = Σ r²·1{r>0} and the downside
    * leg rsv⁻ = Σ r²·1{r<0} (zero returns contribute to neither leg
    * and nothing to rv — the split is an identity on the quantized
    * decimal sums; the three double renderings can differ by a few
    * ulps), and the signed jump
    * variation sjv = rsv⁺ − rsv⁻ isolates jump asymmetry — the
    * downside leg is the one that forecasts (bad-news vol).
    * `down_share` = rsv⁻/rv is null on zero-variance days.
    *
    * Same two-exchange shape and quantize-then-decimal-sum parity
    * contract as [[dailyEstimators]]; the up/down split is a
    * conditional sum inside the SAME aggregate, not a second pass. */
  def semivariance(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val byDay = Window
      .partitionBy(col("underlying"), col("day_start"))
      .orderBy(col("bucket_start"))
    val c = col("close")
    priceBars(trades, intervalSec)
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .withColumn("_r", log(c / lag(c, 1).over(byDay)))
      .withColumn("_r2", Parity.roundTo(col("_r") * col("_r"), 6))
      .groupBy(col("underlying"), col("day_start"))
      .agg(
        count(col("_r")).as("n_returns"),
        coalesce(Parity.dsum(col("_r2")), lit(0.0)).as("rv_cc"),
        coalesce(Parity.dsum(when(col("_r") > 0, col("_r2"))), lit(0.0))
          .as("rsv_up"),
        coalesce(Parity.dsum(when(col("_r") < 0, col("_r2"))), lit(0.0))
          .as("rsv_down"))
      .withColumn("signed_jump", col("rsv_up") - col("rsv_down"))
      .withColumn("down_share",
        col("rsv_down") / nullif(col("rv_cc"), lit(0.0)))
  }

  /** M44: overnight/intraday variance split per underlying — the
    * classic French–Roll decomposition: the overnight return
    * r_on = ln(open_d / close_{d−1}) carries news with no trading;
    * the intraday return r_id = ln(close_d / open_d) carries trading.
    * `overnight_share` = var_on/(var_on + var_id) reads how much of
    * total variance accrues while the book is closed (for crypto:
    * across the daily boundary). Sample variances come from
    * DECIMAL(10,6)-quantized returns via DECIMAL(24,12)-gated moment
    * sums (the m40 idiom) with the shared Welch variance spelling.
    *
    * Shape: ONE corpus-sized aggregate to daily open/close, then a
    * days-sized lag window and a per-underlying aggregate. Days with
    * no previous close contribute only the intraday leg (count
    * asymmetry stated by n_on vs n_days, restated by the oracle). */
  def overnightIntraday(trades: DataFrame): DataFrame = {
    val d6 = org.apache.spark.sql.types.DataTypes.createDecimalType(10, 6)
    val d24 = org.apache.spark.sql.types.DataTypes.createDecimalType(24, 12)
    val ep = unix_timestamp(col("timestamp"))
    val daily = trades
      .filter(col("price") > 0)
      .withColumn("day_start", ep - ep % 86400L)
      .groupBy(col("underlying"), col("day_start"))
      .agg(min_by(col("price"), col("timestamp")).as("open"),
        max_by(col("price"), col("timestamp")).as("close"))
    val w = Window.partitionBy(col("underlying")).orderBy(col("day_start"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast(d24).cast("double")
    daily
      .withColumn("_pc", lag(col("close"), 1).over(w))
      .withColumn("on_q",
        Parity.roundTo(log(col("open") / col("_pc")), 6).cast(d6))
      .withColumn("id_q",
        Parity.roundTo(log(col("close") / col("open")), 6).cast(d6))
      .groupBy(col("underlying"))
      .agg(
        count(lit(1)).as("n_days"),
        count(col("on_q")).as("n_on"),
        dbl(sum(col("on_q"))).as("_so"),
        dbl(sum(col("on_q") * col("on_q"))).as("_qo"),
        dbl(sum(col("id_q"))).as("_si"),
        dbl(sum(col("id_q") * col("id_q"))).as("_qi"))
      .withColumn("no", col("n_on").cast("double"))
      .withColumn("nd", col("n_days").cast("double"))
      .withColumn("var_overnight",
        expr(EventsAnalytics.welchVarExpr("_qo", "_so", "no")))
      .withColumn("var_intraday",
        expr(EventsAnalytics.welchVarExpr("_qi", "_si", "nd")))
      .withColumn("overnight_share", expr(
        "var_overnight / nullif(var_overnight + var_intraday, 0.0)"))
      .select(col("underlying"), col("n_days"), col("n_on"),
        col("var_overnight"), col("var_intraday"), col("overnight_share"))
  }

  /** M45: historical VaR / Expected Shortfall per underlying over the
    * daily close-to-close return series — the desk risk read on top
    * of the m7 family. Rank-based definitions so both engines pick
    * identical elements: VaR_q = the return at rank ceil(q·n) under
    * (return, day) order; ES_q = the exact decimal mean of the
    * returns at ranks 1..ceil(q·n) (the tail AT OR BELOW the VaR
    * element by rank, not by value — deterministic under ties).
    * Returns are 6-dp-quantized at birth (the ln contract), so every
    * later comparison and mean is engine-identical.
    *
    * Shape: one corpus-sized aggregate to daily closes; the rank
    * window runs on the (underlyings × days) daily table —
    * calendar-bounded, so the per-key sort is bounded by the
    * retention window, never by data volume (the a21 distributed
    * selection is the path if the grain ever becomes per-trade). */
  def varEs(trades: DataFrame, qs: Seq[(Int, Int, String)] =
      Seq((1, 20, "95"), (1, 100, "99"))): DataFrame = {
    val w = Window.partitionBy(col("underlying")).orderBy(col("day_start"))
    val byRet = Window.partitionBy(col("underlying"))
      .orderBy(col("rq"), col("day_start"))
    val ep = unix_timestamp(col("timestamp"))
    val rets = trades
      .filter(col("price") > 0)
      .withColumn("day_start", ep - ep % 86400L)
      .groupBy(col("underlying"), col("day_start"))
      .agg(max_by(col("price"), col("timestamp")).as("close"))
      .withColumn("_r", log(col("close") / lag(col("close"), 1).over(w)))
      .filter(col("_r").isNotNull)
      .withColumn("rq", Parity.roundTo(col("_r"), 6))
      .withColumn("rn", row_number().over(byRet))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("underlying"))))
    val aggs = qs.flatMap { case (a, b, name) =>
      val cut = expr(s"(n * $a + ${b - 1}) div $b")
      Seq(
        max(when(col("rn") === cut, col("rq"))).as(s"var_$name"),
        (Parity.dsum(when(col("rn") <= cut, col("rq")))
          / max(when(col("rn") === cut, col("rn"))).cast("double"))
          .as(s"es_$name"))
    }
    rets.groupBy(col("underlying"))
      .agg(max(col("n")).as("n_returns"), aggs: _*)
  }

  /** M43: RV signature plot per underlying — realized variance as a
    * function of the sampling interval (Andersen, Bollerslev, Diebold
    * & Labys 2000). For a semimartingale price, RV is flat in the
    * interval; microstructure noise bends it up at fine grids — the
    * plot IS how a desk picks the m7 bar width.
    *
    * Scale shape: ONE corpus-sized aggregate builds the finest
    * (min(intervals)) bar table; every coarser frequency re-derives
    * from those bars — the coarse close is the close of the last
    * non-empty fine bar (`max_by(close, fine_bucket)`), exact because
    * the coarse bucket's last trade lives in its last non-empty fine
    * bar. The fine-bar frame is materialized once and each coarser
    * pass is bar-sized, so adding frequencies costs no extra corpus
    * scans. Returns are m7's day-partitioned lag chain; r² terms are
    * 6-dp-quantized before the exact decimal sum. */
  def signaturePlot(trades: DataFrame,
      intervals: Seq[Long] = Seq(60L, 300L, 900L, 3600L)): DataFrame = {
    val fine = intervals.min
    val bars = graft.util.Caches.materialize(
      priceBars(trades, fine)
        .select(col("underlying"), col("bucket_start").as("fb"),
          col("close")))
    val frames = intervals.map { iv =>
      val byDay = Window
        .partitionBy(col("underlying"),
          (col("cb") - col("cb") % 86400L))
        .orderBy(col("cb"))
      bars
        .groupBy(col("underlying"), (col("fb") - col("fb") % iv).as("cb"))
        .agg(max_by(col("close"), col("fb")).as("close"))
        .withColumn("_r", log(col("close") / lag(col("close"), 1).over(byDay)))
        .withColumn("_r2", Parity.roundTo(col("_r") * col("_r"), 6))
        .groupBy(col("underlying"))
        .agg(
          count(col("_r")).as("n_returns"),
          coalesce(Parity.dsum(col("_r2")), lit(0.0)).as("rv"))
        .withColumn("interval_sec", lit(iv))
    }
    frames.reduce(_.unionByName(_))
      .select(col("underlying"), col("interval_sec"), col("n_returns"),
        col("rv"))
  }
}
