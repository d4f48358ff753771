package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Order-flow imbalance — the standard microstructure read on the
  * trades tape the reference stores (`direction` is first-class in
  * its schema, `options_trades.yaml:107-109`, but the reference never
  * aggregates it beyond PCR): per (underlying, 15-min bucket),
  * buy/sell volume and count and the signed imbalance
  * (buy − sell) / (buy + sell).
  *
  * One hash aggregate with map-side partials (conditional sums, no
  * second scan per side); ratios are exact-DECIMAL sums divided
  * identically on both engines, zero-total buckets null via nullif.
  */
object OrderFlow {

  def flowImbalance(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val isBuy = col("direction") === "buy"
    val buyVol = Parity.dsum(when(isBuy, col("amount"))).as("buy_volume")
    val sellVol = Parity.dsum(when(!isBuy, col("amount"))).as("sell_volume")
    trades
      .withColumn("bucket_start", ep - ep % intervalSec)
      .groupBy(col("underlying"), col("bucket_start"))
      .agg(
        count(when(isBuy, 1)).as("n_buys"),
        count(when(!isBuy, 1)).as("n_sells"),
        buyVol, sellVol)
      .withColumn("imbalance",
        (coalesce(col("buy_volume"), lit(0.0))
          - coalesce(col("sell_volume"), lit(0.0)))
          / nullif(coalesce(col("buy_volume"), lit(0.0))
            + coalesce(col("sell_volume"), lit(0.0)), lit(0.0)))
  }

  /** Exact trade-size quantiles per underlying by integer-rank
    * selection: the q-quantile is the element at rank ceil(q·n)
    * under amount order — no interpolation arithmetic, so both
    * engines pick the identical element (engine quantile functions
    * interpolate differently and can never hash-match). Ranks are
    * pure integer math: ceil(a·n/b) = (a·n + b − 1) div b.
    *
    * Scale path: [[DistributedSelection.quantiles]] — frequency
    * table + range-partitioned prefix sums, so no task ever sorts a
    * whole underlying's rows (the old row_number-over-2-keys plan
    * was a per-key global sort). a18's KLL quantiles remain the
    * sketch path for interactive use; this is the exact answer
    * (billing, audits) at the same scale. */
  def sizeQuantiles(trades: DataFrame,
      qs: Seq[(Int, Int, String)] = Seq((1, 2, "p50"), (9, 10, "p90"),
        (99, 100, "p99"))): DataFrame =
    DistributedSelection.quantiles(
      trades.select(col("underlying"), col("amount")),
      "underlying", "amount", qs)

  /** Intraday cumulative VWAP per (underlying, day): per-bar exact
    * notional and volume sums, then DECIMAL running sums over the
    * day partition — order-free, so DuckDB's segment-tree window
    * aggregation and Spark's sequential one agree bit-for-bit. The
    * bar aggregate and the day window share one exchange lineage
    * (bar key ⊂ day key never holds, so this is two exchanges — the
    * same shape as the realized-vol roll-up). */
  def vwapSeries(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val bars = trades
      .withColumn("bucket_start", ep - ep % intervalSec)
      .groupBy(col("underlying"), col("bucket_start"))
      .agg(
        Parity.dsum(col("price") * col("amount")).as("bar_pv"),
        Parity.dsum(col("amount")).as("bar_volume"),
        count(lit(1)).as("n_trades"))
    val running = org.apache.spark.sql.expressions.Window
      .partitionBy(col("underlying"), col("day_start"))
      .orderBy(col("bucket_start"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bars
      .withColumn("day_start",
        col("bucket_start") - col("bucket_start") % 86400L)
      .withColumn("cum_pv",
        sum(col("bar_pv").cast(dec)).over(running).cast("double"))
      .withColumn("cum_volume",
        sum(col("bar_volume").cast(dec)).over(running).cast("double"))
      .withColumn("vwap",
        col("cum_pv") / nullif(col("cum_volume"), lit(0.0)))
  }

  /** M18: Amihud illiquidity — mean(|bar return| / bar notional) per
    * (underlying, day), the price-impact-per-dollar measure (Amihud
    * 2002) that complements [[kyleLambda]]'s regression slope with a
    * ratio robust to sparse bars. Terms span many magnitudes (a
    * near-zero open price makes a huge ratio), so the usual 6-dp
    * double→decimal quantization is NOT cross-engine-safe here —
    * Spark rounds the shortest string repr, DuckDB the exact binary,
    * and at 1e7 magnitude they disagree for ~1e-3 of values. The sum
    * instead runs on a FLOOR grid: floor(term·1e15) is a pure IEEE
    * op both engines compute bit-identically at any magnitude, and
    * the integer sum is order-free. One tape-sized bar aggregate,
    * then a day-keyed aggregate of the bar table. */
  def amihudIlliq(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val bars = trades
      .filter(col("price") > 0)
      .withColumn("bucket_start", ep - ep % intervalSec)
      .groupBy(col("underlying"), col("bucket_start"))
      .agg(
        min_by(col("price"), col("timestamp")).as("open"),
        max_by(col("price"), col("timestamp")).as("close"),
        Parity.dsum(col("price") * col("amount")).as("notional"))
      .filter(col("notional") > 0)
    val term = abs(col("close") / col("open") - 1.0) / col("notional") *
      lit(1e9)
    val q = floor(term * lit(1e6)).cast("long")
    bars
      .withColumn("day", expr("bucket_start div 86400L"))
      .groupBy(col("underlying"), col("day"))
      .agg(
        count(lit(1)).as("n_bars"),
        (sum(q).cast("double") / lit(1e6) / count(lit(1)))
          .as("amihud_e9"))
  }

  /** M17: Kyle's lambda — per (underlying, day) price-impact slope:
    * OLS of the bar's price move (close − open) on its signed flow
    * (buy − sell volume), over 15-min bars. λ is THE microstructure
    * liquidity read the tape's `direction` column enables (Kyle 1985;
    * the reference never regresses its flow).
    *
    * Shape: ONE corpus-sized bar aggregate (arg-min/max open/close +
    * conditional decimal flow sums, map-side partials), then a
    * day-keyed hash aggregate of the bar table. Exactness: prices are
    * exact 2-dp values so close−open quantizes losslessly to
    * DECIMAL(12,6); flow is already an exact decimal; products are
    * pinned-scale decimal arithmetic rendered through the HALF-UP
    * DECIMAL(22,8) gate (sign-safe: HALF_UP == half-away-from-zero);
    * slope/corr from the shared Pearson algebra with the clamped-r²
    * guard for zero-variance days. */
  def kyleLambda(trades: DataFrame, intervalSec: Long = 900L)
      : DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val d18 = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)
    val d12 = org.apache.spark.sql.types.DataTypes.createDecimalType(12, 6)
    val d22 = org.apache.spark.sql.types.DataTypes.createDecimalType(22, 8)
    val isBuy = col("direction") === "buy"
    val bars = trades
      .filter(col("price") > 0)
      .withColumn("bucket_start", ep - ep % intervalSec)
      .groupBy(col("underlying"), col("bucket_start"))
      .agg(
        // unique per-bucket timestamps (the m7 bar convention)
        min_by(col("price"), col("timestamp")).as("open"),
        max_by(col("price"), col("timestamp")).as("close"),
        (coalesce(sum(when(isBuy, col("amount")).cast(d18)), lit(0).cast(d18))
          - coalesce(sum(when(!isBuy, col("amount")).cast(d18)),
            lit(0).cast(d18))).cast(d18).as("flow"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast(d22).cast("double")
    bars
      .withColumn("day", expr("bucket_start div 86400L"))
      .withColumn("xq", col("flow"))
      .withColumn("yq", (col("close") - col("open")).cast(d12))
      .groupBy(col("underlying"), col("day"))
      .agg(
        count(lit(1)).as("n_bars"),
        dbl(sum(col("xq"))).as("sx"),
        dbl(sum(col("yq"))).as("sy"),
        dbl(sum(col("xq") * col("yq"))).as("sxy"),
        dbl(sum(col("xq") * col("xq"))).as("sxx"),
        dbl(sum(col("yq") * col("yq"))).as("syy"))
      .withColumn("nd", col("n_bars").cast("double"))
      .withColumn("kyle_lambda", expr(SpotCorr.betaExpr))
      .withColumn("r2", expr(TextAnalysis.zipfR2Expr))
      .select("underlying", "day", "n_bars", "kyle_lambda", "r2")
  }

  /** M35: VPIN flow toxicity (Easley, López de Prado, O'Hara 2012) —
    * volume-synchronized order imbalance: the tape is cut into
    * equal-VOLUME buckets and the per-bucket |buy − sell| share,
    * rolling-averaged, is the toxicity read. The hard part at scale
    * is the running cumulative volume (inherently sequential per
    * symbol); it runs as the W1 two-level stitch — within-(symbol,
    * day) running sums (partition-bounded windows) plus a day-prefix
    * offset over the calendar-bounded day table — never one global
    * per-symbol ordered window over the tape.
    *
    * Exactness: volume is quantized once to integer micro-units
    * (×1e6 through DECIMAL, the 6-dp contract), so every running
    * sum, bucket id, and imbalance numerator is BIGINT math; the
    * per-bucket imbalance is rendered as an integer ppb ratio
    * (|b−s|·1e9 div (b+s), exact in both engines). The ×1e9 multiply
    * runs in DECIMAL(20,0) — a pure BIGINT product would wrap once a
    * bucket holds >~9.2e3 units (one whale trade lands whole in its
    * start bucket, so bucketVol does NOT bound |b−s|); the quotient
    * itself is ≤1e9 so the final `div` back to BIGINT is always
    * exact. The rolling VPIN is a
    * BIGINT window sum divided ONCE — a rolling average of doubles
    * would ride DuckDB's segment-tree association and never
    * hash-match. Simplification vs the paper: trades are not split
    * across bucket boundaries — each trade lands in the bucket its
    * cumulative START falls in (deterministic, and boundary error is
    * one trade per bucket). The rolling window runs over the bucket
    * table — volume-compressed ~(trades/bucket)× vs the tape, the
    * same bounded-frame argument the bar-level windows make. */
  def vpin(trades: DataFrame, bucketVol: Long = 1000L,
      window: Int = 50): DataFrame = {
    val d28 = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val ep = unix_timestamp(col("timestamp"))
    val t = trades.select(
      col("underlying"),
      ep.as("ep"),
      col("trade_id").cast("long").as("tid"),
      (col("amount").cast(d28) * 1000000).cast("long").as("vol_u"),
      (col("direction") === "buy").as("is_buy"))
      .withColumn("day", expr("ep div 86400L"))
    val wDay = Window.partitionBy(col("underlying"), col("day"))
      .orderBy(col("ep"), col("tid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.partitionBy(col("underlying")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayTot = t.groupBy(col("underlying"), col("day"))
      .agg(sum(col("vol_u")).as("_dtot"))
      .withColumn("_doff", coalesce(sum(col("_dtot")).over(wOff), lit(0L)))
      .select(col("underlying"), col("day"), col("_doff"))
    val cum = t
      .join(dayTot, Seq("underlying", "day"))
      .withColumn("cum_prev",
        col("_doff") + sum(col("vol_u")).over(wDay) - col("vol_u"))
      .withColumn("bucket",
        expr(s"cum_prev div ${bucketVol * 1000000L}"))
    val buckets = cum
      .groupBy(col("underlying"), col("bucket"))
      .agg(
        min(col("ep")).as("bucket_start_ep"),
        count(lit(1)).as("n_trades"),
        sum(when(col("is_buy"), col("vol_u")).otherwise(0L)).as("buy_u"),
        sum(when(!col("is_buy"), col("vol_u")).otherwise(0L)).as("sell_u"))
      .withColumn("oi_e9", expr(
        "cast(abs(buy_u - sell_u) as decimal(20,0)) * 1000000000" +
          " div nullif(buy_u + sell_u, 0L)"))
    val wRoll = Window.partitionBy(col("underlying")).orderBy(col("bucket"))
      .rowsBetween(-(window - 1).toLong, 0L)
    buckets
      .withColumn("vpin",
        sum(col("oi_e9")).over(wRoll).cast("double")
          / (count(col("oi_e9")).over(wRoll).cast("double") * 1.0e9))
      .select(col("underlying"), col("bucket"), col("bucket_start_ep"),
        col("n_trades"), col("buy_u"), col("sell_u"), col("oi_e9"),
        col("vpin"))
  }
}
