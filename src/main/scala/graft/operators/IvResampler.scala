package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Parity

/** 15-minute IV OHLC resampling — the reference's
  * `features/resampler.py:25-111` (SURVEY §2.4 A2/A3).
  *
  * Irregular trade ticks -> regular tumbling bars:
  * iv first/max/min/last per bar + volume. "first"/"last" are
  * `min_by`/`max_by` on the trade timestamp (deterministic, unlike
  * Spark's order-dependent `first`/`last`), mirroring the reference's
  * argMin/argMax discipline (`contract_selector.py:10-15`).
  *
  * Scale notes: one hash-aggregate with map-side partial aggregation;
  * grouping key (window, groupCols...) distributes evenly at 100 TB —
  * no per-key skew because bar cardinality grows with time range.
  */
object IvResampler {

  /** OHLC bars per `interval` (e.g. "15 minutes") and per `groupCols`
    * (e.g. underlying). Rows with null iv are dropped pre-aggregation
    * (resampler.py:77-80) which also makes empty bars vanish
    * (resampler.py:109). */
  def resample(trades: DataFrame, interval: String, groupCols: Column*): DataFrame = {
    trades
      .filter(col("iv").isNotNull)
      .groupBy(window(col("timestamp"), interval) +: groupCols: _*)
      .agg(
        min_by(col("iv"), col("timestamp")).as("iv_open"),
        max(col("iv")).as("iv_high"),
        min(col("iv")).as("iv_low"),
        max_by(col("iv"), col("timestamp")).as("iv_close"),
        Parity.dsum(col("amount")).as("volume"),
        count(lit(1)).as("n_trades"))
      .withColumn("bucket_start", unix_timestamp(col("window.start")))
      .drop("window")
  }

  /** A3: per-DTE-bucket resample in ONE pass (the reference loops buckets
    * client-side, `resampler.py:114-170`) — add the bucket as a grouping
    * column instead of N scans. */
  def resampleByDteBucket(trades: DataFrame, interval: String): DataFrame = {
    val withDte = trades.withColumn(
      "dte", datediff(col("expiry"), to_date(col("timestamp"))))
    resample(
      withDte.withColumn("dte_bucket", DteBuckets.bucketExpr(col("dte"))),
      interval, col("dte_bucket"))
  }
}
