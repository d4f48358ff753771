package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes.createDecimalType

/** Calendar-seasonality profile of the options tape — hour-of-day
  * activity shares and the peak hour per underlying (the intraday
  * roll-up the reference's daily/15-min resamples skip over;
  * reference `features/iv_resampler.py` stops at bucket grain).
  *
  * Shape: ONE corpus-sized hash aggregate keyed (underlying, hour)
  * — 24 rows per key — then share/rank windows over those 24-row
  * partitions. Exactness: volume is an exact DECIMAL sum; shares are
  * one double division of exact decimal renders; the peak is a
  * deterministic (count desc, hour) rank. */
object Seasonality {

  def hourProfile(trades: DataFrame): DataFrame = {
    val d = createDecimalType(28, 6)
    val byKey = Window.partitionBy(col("underlying"))
    val hourly = trades
      .withColumn("hour",
        (expr("unix_timestamp(timestamp) div 3600L") % 24L).cast("int"))
      .groupBy(col("underlying"), col("hour"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum(col("amount").cast(d)).as("vol_dec"))
    hourly
      .withColumn("volume", col("vol_dec").cast("double"))
      .withColumn("volume_share",
        col("vol_dec").cast("double")
          / sum(col("vol_dec")).over(byKey).cast("double"))
      .withColumn("is_peak",
        row_number().over(
          byKey.orderBy(col("n_trades").desc, col("hour"))) === 1)
      .select("underlying", "hour", "n_trades", "volume",
        "volume_share", "is_peak")
  }
}
