package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.options.SyntheticTrades
import graft.util.Parity._

/** Options-domain operators (the reference's alpha-feature engine) run
  * over the deterministic trades derivation, each with a DuckDB oracle
  * performing the same derivation + aggregation. */
object OptionsQueries {

  private val enrichedCte: String = OracleCtes.enriched
  private val duckDteBucket: String = OracleCtes.dteBucketCase

  // ---- A2: 15-min IV OHLC resample ----
  def a2Resample(s: SparkSession, dir: String): DataFrame =
    IvResampler.resample(
      SyntheticTrades.trades(s, dir), "15 minutes",
      org.apache.spark.sql.functions.col("underlying"))

  val a2Oracle: String =
    s"""WITH $enrichedCte
       |SELECT underlying,
       |  arg_min(iv, "timestamp") AS iv_open,
       |  max(iv) AS iv_high,
       |  min(iv) AS iv_low,
       |  arg_max(iv, "timestamp") AS iv_close,
       |  ${duckDsum("amount")} AS volume,
       |  count(*) AS n_trades,
       |  bucket_start
       |FROM enriched
       |WHERE iv IS NOT NULL
       |GROUP BY underlying, bucket_start""".stripMargin

  // ---- A4: per-(bar, DTE bucket) metrics ----
  def a4DteMetrics(s: SparkSession, dir: String): DataFrame =
    DteBuckets.bucketMetrics(SyntheticTrades.trades(s, dir), "15 minutes")

  val a4Oracle: String =
    s"""WITH $enrichedCte
       |SELECT dte_bucket,
       |  ${duckDavg("iv")} AS iv_mean,
       |  ${duckStddevSamp("iv")} AS iv_std,
       |  ${duckDsum("amount")} AS volume,
       |  count(*) AS n_trades,
       |  ${duckDavg("price")} AS price_mean,
       |  bucket_start
       |FROM (SELECT *, $duckDteBucket AS dte_bucket FROM enriched)
       |WHERE dte_bucket IS NOT NULL
       |GROUP BY dte_bucket, bucket_start""".stripMargin

  // ---- A5/W5: DTE-bucket volume share per bar ----
  def a5VolumeDist(s: SparkSession, dir: String): DataFrame =
    DteBuckets.volumeDistribution(SyntheticTrades.trades(s, dir), "15 minutes")

  val a5Oracle: String =
    s"""WITH $enrichedCte,
       |sums AS (
       |  SELECT dte_bucket, bucket_start, ${duckDsum("amount")} AS bucket_volume
       |  FROM (SELECT *, $duckDteBucket AS dte_bucket FROM enriched)
       |  WHERE dte_bucket IS NOT NULL
       |  GROUP BY dte_bucket, bucket_start
       |)
       |SELECT dte_bucket, bucket_volume, bucket_start,
       |  (bucket_volume * 100.0) / nullif(
       |    CAST(sum(CAST(bucket_volume AS DECIMAL(28,6)))
       |         OVER (PARTITION BY bucket_start) AS DOUBLE), 0.0) AS volume_pct
       |FROM sums""".stripMargin

  // ---- A4 wide: per-bar dte_{lo}_{hi}_{metric} columns ----
  def a4Wide(s: SparkSession, dir: String): DataFrame =
    DteBuckets.bucketMetricsWide(SyntheticTrades.trades(s, dir), "15 minutes")

  val a4WideOracle: String = {
    val cols = DteBuckets.buckets.flatMap { case (lo, hi) =>
      val b = s"dte_${lo}_$hi"
      val in = s"dte_bucket = '$b'"
      Seq(
        s"${duckDavg(s"CASE WHEN $in THEN iv END")} AS ${b}_iv_mean",
        s"${duckDsum(s"CASE WHEN $in THEN amount END")} AS ${b}_volume",
        s"count(CASE WHEN $in THEN 1 END) AS ${b}_n_trades")
    }
    s"""WITH $enrichedCte
       |SELECT ${cols.mkString(",\n  ")}, bucket_start
       |FROM (SELECT *, $duckDteBucket AS dte_bucket FROM enriched)
       |WHERE dte_bucket IS NOT NULL
       |GROUP BY bucket_start""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "a4_wide_pivot" -> QueryDef(a4Wide _, a4WideOracle),
    "a2_resample_ohlc" -> QueryDef(a2Resample _, a2Oracle),
    "a4_dte_bucket_metrics" -> QueryDef(a4DteMetrics _, a4Oracle),
    "a5_volume_distribution" -> QueryDef(a5VolumeDist _, a5Oracle))
}
