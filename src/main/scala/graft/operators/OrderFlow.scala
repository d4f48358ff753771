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
}
