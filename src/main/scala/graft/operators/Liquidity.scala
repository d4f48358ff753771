package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes.createDecimalType

/** Liquidity-structure analytics on the options tape (the reference
  * aggregates per-contract volume for its liquidity ranking,
  * reference `features/contract_selector.py:60-75`, but never
  * summarizes concentration or cross-checks quote consistency).
  *
  *  - A27: Herfindahl–Hirschman concentration of daily volume across
  *    contracts — how much of a day's flow sits in the top names.
  *  - A28: put–call parity audit — C̄ − P̄ vs S̄ − K per
  *    (underlying, expiry, strike, 15-min bucket), summarized per
  *    (underlying, expiry).
  *
  * Distributed shape: both start with ONE corpus-sized hash
  * aggregate (per-contract-day / per-quote-bucket); everything after
  * runs on the aggregate (contract-count / bucket-count sized). HHI
  * avoids a window entirely: Σshareᵢ² = Σvᵢ²/(Σvᵢ)², so a second
  * hash aggregate of (v, v²) suffices. The parity check's C/P
  * pairing is a conditional-aggregation combine on the bucket table,
  * not a self-join of the tape.
  *
  * Exactness: per-contract volumes are exact DECIMAL sums rendered
  * to double through a 2^53-safe gate; v² sums re-quantize on dsum's
  * 6-dp grid; HHI is one division of exact sums. Parity gaps are
  * davg differences — exactly-rounded IEEE chains spelled
  * identically in both engines. */
object Liquidity {

  /** A27: per (underlying, day): HHI = Σ vᵢ²/(Σ vᵢ)² over contracts
    * i, plus top-share and contract count. Top share is the max
    * exact-decimal volume over the sum. */
  def volumeHhi(trades: DataFrame): DataFrame = {
    val d6 = createDecimalType(20, 6)
    val perContract = trades
      .withColumn("day", expr("unix_timestamp(timestamp) div 86400L"))
      .groupBy(col("underlying"), col("day"), col("instrument_name"))
      .agg(sum(col("amount").cast(createDecimalType(28, 6))).cast(d6)
        .as("v"))
      .withColumn("vd", col("v").cast("double"))
    perContract
      .groupBy(col("underlying"), col("day"))
      .agg(
        count(lit(1)).as("n_contracts"),
        sum(col("v")).cast("double").as("total_volume"),
        graft.util.Parity.dsum(col("vd") * col("vd")).as("ssq"),
        max(col("v")).cast("double").as("top_volume"))
      .withColumn("hhi",
        col("ssq") / (col("total_volume") * col("total_volume")))
      .withColumn("top_share", col("top_volume") / col("total_volume"))
      .select("underlying", "day", "n_contracts", "total_volume",
        "hhi", "top_share")
  }

  /** A30: price-level volume profile + point of control — traded
    * volume binned by price level per underlying, with each bin's
    * share and the POC (max-volume bin, ties → lowest bin). The
    * market-profile read of the tape (the reference bins by strike
    * and DTE but never by traded price).
    *
    * Shape: ONE corpus-sized hash aggregate keyed (underlying, bin);
    * share/POC windows run over the bin-count-sized profile.
    * Exactness: bins are integer `div`; volumes exact decimal sums;
    * the POC rank compares exact decimals. */
  def volumeProfile(trades: DataFrame, binWidth: Double = 1.0)
      : DataFrame = {
    val d = createDecimalType(28, 6)
    val byKey = Window.partitionBy(col("underlying"))
    trades
      .filter(col("price") > 0)
      .withColumn("bin", floor(col("price") / binWidth).cast("long"))
      .groupBy(col("underlying"), col("bin"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(col("amount").cast(d)).as("vol_dec"))
      .withColumn("volume", col("vol_dec").cast("double"))
      .withColumn("volume_share",
        col("vol_dec").cast("double")
          / sum(col("vol_dec")).over(byKey).cast("double"))
      .withColumn("is_poc",
        row_number().over(
          byKey.orderBy(col("vol_dec").desc, col("bin"))) === 1)
      .select("underlying", "bin", "n_trades", "volume", "volume_share",
        "is_poc")
  }

  /** A28: put–call parity audit. Quote = davg(price) per
    * (underlying, expiry, strike, option_type) over the whole tape;
    * spot = davg(index_price) over the same strike's trades (any
    * type). gap = (C̄ − P̄) − (S̄ − K); a strike violates at |gap| >
    * threshold. Summarized per (underlying, expiry). (No time
    * bucket: parity is a static relation, and pairing at the ladder
    * level keeps every strike two-sided.) */
  def parityViolations(trades: DataFrame, threshold: Double = 25.0)
      : DataFrame = {
    val quotes = trades
      .filter(col("price") > 0 && col("strike") > 0)
      .groupBy(col("underlying"), col("expiry"), col("strike"))
      .agg(
        graft.util.Parity.davg(when(col("option_type") === "C",
          col("price"))).as("c_avg"),
        graft.util.Parity.davg(when(col("option_type") === "P",
          col("price"))).as("p_avg"),
        graft.util.Parity.davg(col("index_price")).as("s_avg"))
      .filter(col("c_avg").isNotNull && col("p_avg").isNotNull &&
        col("s_avg").isNotNull)
      .withColumn("gap",
        (col("c_avg") - col("p_avg")) - (col("s_avg") - col("strike")))
    quotes
      .groupBy(col("underlying"), col("expiry"))
      .agg(
        count(lit(1)).as("n_strikes"),
        count(when(abs(col("gap")) > threshold, 1)).as("n_violations"),
        max(abs(col("gap"))).as("max_abs_gap"),
        (graft.util.Parity.dsum(abs(col("gap"))) / count(lit(1)))
          .as("mean_abs_gap"))
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_strikes").cast("double"))
      .select(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"),
        col("n_strikes"), col("n_violations"), col("violation_rate"),
        col("max_abs_gap"), col("mean_abs_gap"))
  }
}
