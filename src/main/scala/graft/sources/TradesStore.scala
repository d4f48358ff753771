package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout (SURVEY §1.2 mapping) — the ClickHouse
  * `PARTITION BY toYYYYMM(timestamp)` + `ORDER BY (underlying, expiry,
  * timestamp, strike, option_type, trade_id)` primary index becomes:
  *
  *  - `partitionBy("month")` -> dynamic partition pruning for
  *    time-range queries (the 10-100x index-seek claim in BASELINE.md)
  *  - `sortWithinPartitions(sort key)` -> tight parquet row-group
  *    min/max stats, so predicate pushdown skips row groups the way
  *    the ClickHouse sparse index skips granules
  *  - zstd codec (the reference's column codecs)
  *
  * At 100 TB each month partition is further split by Spark's
  * maxPartitionBytes on read; writes repartition by month so each
  * partition directory is produced by one task set with sorted runs.
  */
object TradesStore {

  val SortKey: Seq[String] =
    Seq("underlying", "expiry", "timestamp", "strike", "option_type",
      "trade_id")

  def withMonth(trades: DataFrame): DataFrame =
    trades.withColumn("month", date_format(col("timestamp"), "yyyyMM"))

  def write(trades: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    withMonth(trades)
      .repartition(col("month"))
      .sortWithinPartitions(SortKey.map(col): _*)
      .write
      .mode(mode)
      .option("compression", "zstd")
      .partitionBy("month")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
