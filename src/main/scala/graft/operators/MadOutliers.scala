package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection on trade sizes — median / MAD (median
  * absolute deviation) flagging, the standard heavy-tail-safe
  * alternative to z-scores (stddev is itself dragged by the outliers
  * it is meant to find).
  *
  * Composes [[DistributedSelection]] twice: the per-key exact median
  * (integer-rank, no interpolation — both engines pick the same
  * element), then the exact median of absolute deviations, then one
  * counting pass with the k·MAD threshold. Three tape scans total —
  * deliberately NOT cached: at 100 TB re-scanning a columnar tape
  * twice more beats materializing a tape-sized deviation table, and
  * each pass is the selection shape that never sorts a whole key.
  * The medians broadcast back (one row per key). */
object MadOutliers {

  def madOutliers(trades: DataFrame, k: Double = 5.0): DataFrame = {
    val t = trades.select(col("underlying"), col("amount"))
    val med = DistributedSelection
      .quantiles(t, "underlying", "amount", Seq((1, 2, "med")))
      .select(col("underlying"), col("n_trades"), col("med"))
    val dev = t.join(broadcast(med), Seq("underlying"))
      .withColumn("d", abs(col("amount") - col("med")))
    val mad = DistributedSelection
      .quantiles(dev.select(col("underlying"), col("d")),
        "underlying", "d", Seq((1, 2, "mad")))
      .select(col("underlying"), col("mad"))
    dev.join(broadcast(mad), Seq("underlying"))
      .groupBy(col("underlying"))
      .agg(
        max(col("n_trades")).as("n_trades"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        count(when(col("d") > lit(k) * col("mad"), 1)).as("n_outliers"))
      .withColumn("outlier_frac",
        col("n_outliers").cast("double") / col("n_trades").cast("double"))
  }
}
