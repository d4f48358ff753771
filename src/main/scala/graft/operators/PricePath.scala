package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes.createDecimalType

/** Price-path analytics over the spot feed (the reference's `ohlcv`
  * table, reference `features/spot_provider.py:90-95`, which it only
  * ever samples for enrichment): maximum drawdown, the realized-vol
  * cone, and daily-return autocorrelation.
  *
  * Shared distributed shape: tick tape → daily close is ONE
  * corpus-sized hash aggregate keyed (symbol, day) with
  * `max_by(close, timestamp)` map-side partials; everything after
  * runs on the TINY (symbols × days) table — per-symbol windows over
  * day-count-sized partitions, one key per asset (thousands of
  * assets in a real universe — parallel; never a global sort). The
  * daily table is materialized once so multi-branch consumers don't
  * re-scan the tape.
  *
  * Exactness: daily closes are exact doubles; simple returns
  * close/prev − 1 are single exactly-rounded IEEE ops (no ln — the
  * cone and ACF are stated on simple returns precisely so no
  * transcendental enters a sum); returns are quantized ONCE to
  * DECIMAL(12,8) (the SpotCorr gate) and every sum is pure decimal
  * arithmetic. */
object PricePath {

  private val d8 = createDecimalType(12, 8)

  /** (symbol, day, close) daily closes — last tick of day. */
  def dailyCloses(ticks: DataFrame): DataFrame =
    ticks
      .withColumn("day", expr("unix_timestamp(timestamp) div 86400L"))
      .groupBy(col("symbol"), col("day"))
      .agg(max_by(col("close"), col("timestamp")).as("close"))

  /** A26: maximum drawdown per symbol — running peak via an
    * expanding-max window, trough = lexicographic min of
    * (drawdown, day) so ties break on the earliest day. */
  def maxDrawdown(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyCloses(ticks)
      .withColumn("peak", max(col("close")).over(w))
      .withColumn("dd", col("close") / col("peak") - 1.0)
      .groupBy(col("symbol"))
      .agg(
        count(lit(1)).as("n_days"),
        min(struct(col("dd").as("dd"), col("day").as("day"),
          col("peak").as("peak"))).as("m"))
      .select(col("symbol"), col("n_days"),
        col("m.dd").as("max_drawdown"),
        col("m.day").as("trough_day"),
        col("m.peak").as("peak_close"))
  }

  /** Daily simple returns quantized ONCE to DECIMAL(12,8) — the shared
    * exactness gate for every consumer (cone, ACF, variance ratio). */
  def quantRet(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    daily
      .withColumn("prev", lag(col("close"), 1).over(w))
      .withColumn("rq", (col("close") / col("prev") - 1.0).cast(d8))
      .filter(col("rq").isNotNull)
  }

  /** M13: realized-vol cone — rolling RV over trailing day-range
    * windows (full windows only), summarized per (symbol, horizon).
    * Both horizons come out of ONE pass over the return series
    * (two range windows + an unpivot, no union re-scan). */
  def volCone(ticks: DataFrame, horizons: Seq[Int] = Seq(7, 30)): DataFrame = {
    val daily = graft.util.Caches.materialize(dailyCloses(ticks))
    val rets = quantRet(daily)
    val withRoll = horizons.foldLeft(rets) { (df, h) =>
      val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
        .rangeBetween(-(h - 1).toLong, 0L)
      df.withColumn(s"s2_$h", sum(col("rq") * col("rq")).over(w))
        .withColumn(s"nw_$h", count(lit(1)).over(w))
    }
    val stackArgs = horizons
      .map(h => s"$h, nw_$h, s2_$h").mkString(", ")
    val long = withRoll
      .select(col("symbol"), expr(
        s"stack(${horizons.size}, $stackArgs) as (horizon, nw, s2)"))
      .filter(col("nw") === col("horizon"))
      .withColumn("vol", sqrt(
        col("s2").cast(createDecimalType(24, 16)).cast("double")
          * 365.0 / col("horizon")))
    long.groupBy(col("symbol"), col("horizon"))
      .agg(
        count(lit(1)).as("n_windows"),
        min(col("vol")).as("vol_min"),
        max(col("vol")).as("vol_max"),
        (graft.util.Parity.dsum(col("vol") * lit(1e3)) / lit(1e3) /
          count(lit(1))).as("vol_avg"))
  }

  /** M14: daily-return autocorrelation at lags 1..k — Pearson corr
    * of (r_t, r_{t−L}) pairs, exact decimal sums, the SpotCorr
    * algebra. All lags from ONE pass (k lag windows + unpivot). */
  def returnAcf(ticks: DataFrame, maxLag: Int = 3): DataFrame = {
    val lags = 1 to maxLag
    val rets = quantRet(dailyCloses(ticks))
    val w = Window.partitionBy(col("symbol")).orderBy(col("day"))
    val withLags = lags.foldLeft(rets) { (df, l) =>
      df.withColumn(s"rl_$l", lag(col("rq"), l).over(w))
    }
    val stackArgs = lags.map(l => s"$l, rl_$l").mkString(", ")
    val dbl = (c: Column) => c.cast(createDecimalType(24, 16)).cast("double")
    withLags
      .select(col("symbol"), col("rq"),
        expr(s"stack($maxLag, $stackArgs) as (lag, rl)"))
      .filter(col("rl").isNotNull)
      .groupBy(col("symbol"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        dbl(sum(col("rq"))).as("sx"),
        dbl(sum(col("rl"))).as("sy"),
        dbl(sum(col("rq") * col("rl"))).as("sxy"),
        dbl(sum(col("rq") * col("rq"))).as("sxx"),
        dbl(sum(col("rl") * col("rl"))).as("syy"))
      .withColumn("nd", col("n_pairs").cast("double"))
      .withColumn("acf", expr(SpotCorr.corrExpr))
      .select("symbol", "lag", "n_pairs", "acf")
  }

  /** χ²(3) upper 5% critical value — the m36 reject threshold, a
    * literal on both engines. */
  val Chi2Crit95Df3 = 7.814727903251179

  /** M36: Ljung–Box portmanteau test on the m14 ACF frame — the
    * "are returns white noise" read, Q = n(n+2)·Σ ρ_k²/(n−k) with
    * reject at the χ²(maxLag) 5% critical value. Because the lags
    * are ROW lags, n_pairs at lag k IS n−k exactly (n recovered as
    * n_pairs₁+1), so the whole statistic is a pivot + one fixed
    * expression over the per-lag ACF rows — the term sum is spelled
    * with explicit left-to-right association (t1 + t2 + t3), never a
    * SQL aggregate over doubles whose order an engine could pick. */
  def ljungBox(ticks: DataFrame, maxLag: Int = 3): DataFrame = {
    val acf = returnAcf(ticks, maxLag)
    val terms = (1 to maxLag).map(l =>
      max(when(col("lag") === l,
        col("acf") * col("acf") / col("n_pairs").cast("double")))
        .as(s"_t$l"))
    val np1 = max(when(col("lag") === 1, col("n_pairs"))).as("_np1")
    acf.groupBy(col("symbol"))
      .agg(np1, terms: _*)
      .withColumn("n_obs", col("_np1") + 1)
      .withColumn("q_lb",
        col("n_obs").cast("double") * (col("n_obs").cast("double") + 2.0)
          * expr((1 to maxLag).map(l => s"_t$l").mkString(" + ")))
      .select(col("symbol"), col("n_obs"), col("q_lb"),
        (col("q_lb") > Chi2Crit95Df3).as("reject_5pct"))
  }
}
