package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Days-to-expiry bucketing + per-bucket metrics — the reference's
  * `features/dte_buckets.py` (SURVEY §2.4 A4/A5, §2.7 P4/P6/F5).
  *
  * The reference runs one resample per bucket client-side; here the
  * bucket is a derived column and the whole thing is a single
  * hash-aggregate pass (SURVEY A3 note).
  */
object DteBuckets {

  /** Reference bucket edges (features/dte_buckets.py DEFAULT_DTE_BUCKETS,
    * same set in pcr.py): label by lower-upper. */
  val buckets: Seq[(Int, Int)] =
    Seq((0, 7), (8, 14), (15, 30), (31, 60), (61, 90), (91, 999))

  def dteExpr(ts: Column, expiry: Column): Column =
    datediff(expiry, to_date(ts))

  /** CASE bucket column: 'dte_{lo}_{hi}'; out-of-range -> null. */
  def bucketExpr(dte: Column): Column =
    buckets.foldLeft(lit(null).cast("string")) { case (acc, (lo, hi)) =>
      when(dte.between(lo, hi), s"dte_${lo}_$hi").otherwise(acc)
    }

  /** A4: per (bar, dte_bucket): iv mean+std, volume, trade count, price
    * mean (`dte_buckets.py:27-129`) in long format. NaN handling is
    * per-metric like the reference (dte_buckets.py:106): volume /
    * n_trades / price_mean include trades whose iv is null; the iv
    * stats skip nulls (count(c) counts non-null). */
  def bucketMetrics(trades: DataFrame, interval: String): DataFrame = {
    trades
      .withColumn("dte", dteExpr(col("timestamp"), col("expiry")))
      .withColumn("dte_bucket", bucketExpr(col("dte")))
      .filter(col("dte_bucket").isNotNull)
      .groupBy(window(col("timestamp"), interval), col("dte_bucket"))
      .agg(
        Parity.davg(col("iv")).as("iv_mean"),
        Parity.dstddevSamp(col("iv")).as("iv_std"),
        Parity.dsum(col("amount")).as("volume"),
        count(lit(1)).as("n_trades"),
        Parity.davg(col("price")).as("price_mean"))
      .withColumn("bucket_start", unix_timestamp(col("window.start")))
      .drop("window")
  }

  /** A4 wide form: one row per bar, `dte_{lo}_{hi}_{metric}` columns —
    * the reference's output shape (`dte_buckets.py:117-129`). A pivot
    * over the long form would need a second aggregate; conditional
    * aggregation produces it in the SAME single hash-aggregate pass. */
  def bucketMetricsWide(trades: DataFrame, interval: String): DataFrame = {
    val base = trades
      .withColumn("dte", dteExpr(col("timestamp"), col("expiry")))
      .withColumn("dte_bucket", bucketExpr(col("dte")))
      .filter(col("dte_bucket").isNotNull)
    val aggs = buckets.flatMap { case (lo, hi) =>
      val b = s"dte_${lo}_$hi"
      val in = col("dte_bucket") === b
      Seq(
        Parity.davg(when(in, col("iv"))).as(s"${b}_iv_mean"),
        Parity.dsum(when(in, col("amount"))).as(s"${b}_volume"),
        count(when(in, lit(1))).as(s"${b}_n_trades"))
    }
    base
      .groupBy(window(col("timestamp"), interval))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", unix_timestamp(col("window.start")))
      .drop("window")
  }

  /** A5/W5: volume share of each DTE bucket within its bar, in percent —
    * bucket sums + a window total over the bar (no second scan,
    * `dte_buckets.py:132-198`). */
  def volumeDistribution(trades: DataFrame, interval: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sums = trades
      .withColumn("dte", dteExpr(col("timestamp"), col("expiry")))
      .withColumn("dte_bucket", bucketExpr(col("dte")))
      .filter(col("dte_bucket").isNotNull)
      .groupBy(window(col("timestamp"), interval), col("dte_bucket"))
      .agg(Parity.dsum(col("amount")).as("bucket_volume"))
      .withColumn("bucket_start", unix_timestamp(col("window.start")))
      .drop("window")
    val total = Window.partitionBy(col("bucket_start"))
    // exact (order-free) total via decimal, same spelling in the oracle
    val barTotal = sum(col("bucket_volume")
      .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      .over(total).cast("double")
    sums.withColumn(
      "volume_pct", Parity.ratio(col("bucket_volume") * 100.0, barTotal))
  }
}
