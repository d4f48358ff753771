package graft.operators

import org.apache.spark.sql.DataFrame
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
}
