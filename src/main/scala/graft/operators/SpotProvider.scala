package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spot-price enrichment (SURVEY §2.4 A17, §2.3 J2/J3, §2.7 P5/P6) —
  * the reference's `features/spot_provider.py:43-205` +
  * `schema/clickhouse/spot_prices_dict.sql:13-38`.
  *
  * ClickHouse models the spot series as an in-memory dictionary and
  * does O(1) `dictGet` per row; Spark's equivalent of a hash dictionary
  * probed per-row IS a broadcast hash join — the dict/join distinction
  * of the reference (J2 vs fallback J3) collapses into one operator.
  *
  * Scale: spot bars are bounded (~12M rows for 6 years per
  * `spot_prices_dict.sql:33` ≈ a few hundred MB), safely broadcastable;
  * the fact side never shuffles.
  */
object SpotProvider {

  /** A17: 15-min close bars via `max_by(close, timestamp)` — the exact
    * analog of the dict DDL's `argMax(close, timestamp)`. */
  def spotBars(ticks: DataFrame, intervalSec: Int = 900): DataFrame =
    ticks
      .groupBy(
        col("symbol"),
        ContractSelector.bucketS(col("timestamp"), intervalSec)
          .as("ts_bucket"))
      .agg(max_by(col("close"), col("timestamp")).as("close"))

  /** J2: left-join spot close onto trades by (underlying, 15-min
    * bucket); adds `binance_spot`, hybrid `spot_price` =
    * coalesce(index_price, binance_spot), and P5 `moneyness` =
    * strike / spot_price. */
  def enrichWithSpot(
      trades: DataFrame,
      bars: DataFrame,
      intervalSec: Int = 900): DataFrame = {
    val dim = bars.select(
      col("symbol").as("_spot_symbol"),
      col("ts_bucket").as("_spot_bucket"),
      col("close").as("binance_spot"))
    trades
      .withColumn("ts_bucket",
        ContractSelector.bucketS(col("timestamp"), intervalSec))
      .join(broadcast(dim),
        col("underlying") === col("_spot_symbol") &&
          col("ts_bucket") === col("_spot_bucket"),
        "left")
      .drop("_spot_symbol", "_spot_bucket")
      .withColumn("spot_price", coalesce(col("index_price"), col("binance_spot")))
      .withColumn("moneyness", col("strike") / col("spot_price"))
  }

  /** P6: moneyness bucket CASE (thresholds `config.py:85-90`); null
    * moneyness stays null (the reference filters invalid rows before
    * bucketing — moneyness.py:52-53). */
  def moneynessBucket(
      m: Column,
      thresholds: (Double, Double, Double, Double) = (0.90, 0.95, 1.05, 1.10))
      : Column = {
    val (t0, t1, t2, t3) = thresholds
    when(m.isNull, lit(null).cast("string"))
      .when(m < t0, "deep_otm_put")
      .when(m < t1, "otm_put")
      .when(m < t2, "atm")
      .when(m < t3, "otm_call")
      .otherwise("deep_otm_call")
  }
}
