package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Moneyness-bucket aggregations + smile metrics (SURVEY §2.4 A8/A9,
  * §2.7 P12) — the reference's `features/moneyness.py:33-170,267-300`.
  *
  * Both forms are ONE hash-aggregate pass over spot-enriched trades;
  * the wide form uses conditional aggregation (`avg(when(...))` =
  * ClickHouse `avgIf`) instead of a pivot node, so whole-stage codegen
  * keeps everything in one fused stage. Keyed by 15-min bar →
  * uniform distribution at scale.
  */
object Moneyness {

  /** F4 validity gate + P6 bucket column (moneyness.py:41-53). */
  def bucketed(enriched: DataFrame, intervalSec: Int = 900): DataFrame =
    enriched
      .filter(col("moneyness") > 0 && col("iv") > 0)
      .withColumn("ts",
        ContractSelector.bucketS(col("timestamp"), intervalSec))
      .withColumn("moneyness_bucket",
        SpotProvider.moneynessBucket(col("moneyness")))

  /** A8 long format: one row per (bar, bucket). */
  def aggregateLong(enriched: DataFrame, intervalSec: Int = 900): DataFrame =
    bucketed(enriched, intervalSec)
      .groupBy(col("ts"), col("moneyness_bucket"))
      .agg(
        Parity.davg(col("iv")).as("iv_mean"),
        Parity.dstddevPop(col("iv")).as("iv_std"),
        count(lit(1)).as("trade_count"),
        Parity.dsum(col("amount")).as("total_volume"),
        count(when(col("option_type") === "C", lit(1))).as("call_count"),
        count(when(col("option_type") === "P", lit(1))).as("put_count"))

  /** A9 wide format for ML + derived skew/curvature/wings + P12 smile
    * slopes. Sums of empty buckets are 0 (ClickHouse `sumIf`
    * semantics); means of empty buckets are null. */
  def aggregateWide(enriched: DataFrame, intervalSec: Int = 900): DataFrame = {
    val b = col("moneyness_bucket")
    def ivIf(bucket: String): Column = when(b === bucket, col("iv"))
    def amtIf(bucket: String): Column = when(b === bucket, col("amount"))
    def cntIf(bucket: String): Column = count(when(b === bucket, lit(1)))

    val wide = bucketed(enriched, intervalSec)
      .groupBy(col("ts"))
      .agg(
        Parity.davg(ivIf("atm")).as("atm_iv_mean"),
        Parity.dstddevPop(ivIf("atm")).as("atm_iv_std"),
        cntIf("atm").as("atm_count"),
        coalesce(Parity.dsum(amtIf("atm")), lit(0.0)).as("atm_volume"),
        Parity.davg(ivIf("otm_put")).as("otm_put_iv_mean"),
        Parity.dstddevPop(ivIf("otm_put")).as("otm_put_iv_std"),
        cntIf("otm_put").as("otm_put_count"),
        coalesce(Parity.dsum(amtIf("otm_put")), lit(0.0)).as("otm_put_volume"),
        Parity.davg(ivIf("otm_call")).as("otm_call_iv_mean"),
        Parity.dstddevPop(ivIf("otm_call")).as("otm_call_iv_std"),
        cntIf("otm_call").as("otm_call_count"),
        coalesce(Parity.dsum(amtIf("otm_call")), lit(0.0)).as("otm_call_volume"),
        Parity.davg(ivIf("deep_otm_put")).as("deep_otm_put_iv_mean"),
        cntIf("deep_otm_put").as("deep_otm_put_count"),
        Parity.davg(ivIf("deep_otm_call")).as("deep_otm_call_iv_mean"),
        cntIf("deep_otm_call").as("deep_otm_call_count"))
      .filter(col("atm_count") > 0) // HAVING atm_count > 0
    withSmileMetrics(wide)
  }

  /** Derived features of the wide form (moneyness.py:112-127 server-side
    * + compute_smile_metrics :267-300). */
  def withSmileMetrics(wide: DataFrame): DataFrame =
    wide
      .withColumn("put_call_skew",
        col("otm_put_iv_mean") - col("otm_call_iv_mean"))
      .withColumn("smile_curvature",
        (col("otm_put_iv_mean") + col("otm_call_iv_mean")) / 2.0
          - col("atm_iv_mean"))
      .withColumn("wing_ratio",
        Parity.ratio(col("deep_otm_put_iv_mean"), col("deep_otm_call_iv_mean")))
      .withColumn("smile_slope_put",
        (col("otm_put_iv_mean") - col("atm_iv_mean")) / 0.05)
      .withColumn("smile_slope_call",
        (col("otm_call_iv_mean") - col("atm_iv_mean")) / 0.05)
      .withColumn("smile_asymmetry",
        col("smile_slope_put") - col("smile_slope_call"))
}
