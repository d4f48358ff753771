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

  /** Default layout: monthly partitions (reference `toYYYYMM`). Pass
    * `partKey = ("date", "yyyyMMdd")` when the corpus spans less than
    * a few months — same design, partition granularity matched to the
    * data so time-range pruning still has directories to skip.
    *
    * Range-partitioned by (partition key, sort key) rather than
    * hash-partitioned by the partition key alone: hashing by month
    * funnels an entire month — terabytes at the target scale — through
    * ONE write task, while the range shuffle spreads a month across
    * many tasks and gives files with non-overlapping sort-key ranges
    * (tighter row-group stats, same skipping effect as the ClickHouse
    * sparse index). */
  def write(trades: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite,
      partKey: (String, String) = ("month", "yyyyMM")): Unit = {
    val (partCol, fmt) = partKey
    // The sort leads with the partition column: the dynamic-partition
    // writer requires its input ordered by [partCol], and a sort that
    // satisfies that requirement by prefix means Spark plans exactly
    // ONE sort — otherwise it inserts its own partCol-only sort around
    // the write and the within-file sort-key order is no longer
    // guaranteed.
    trades.withColumn(partCol, date_format(col("timestamp"), fmt))
      .repartitionByRange((partCol +: SortKey).map(col): _*)
      .sortWithinPartitions((partCol +: SortKey).map(col): _*)
      .write
      .mode(mode)
      .option("compression", "zstd")
      .partitionBy(partCol)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Partition predicate for a [start, endExclusive) time range.
    * ClickHouse infers `toYYYYMM(timestamp)` bounds from a timestamp
    * range automatically; Spark prunes only on predicates stated
    * against the partition column, so the derived bounds must be added
    * alongside the precise timestamp filter. */
  def timeRangePartitionFilter(
      start: java.time.LocalDate, endExclusive: java.time.LocalDate,
      partKey: (String, String) = ("month", "yyyyMM"))
      : org.apache.spark.sql.Column = {
    val (partCol, fmt) = partKey
    val f = java.time.format.DateTimeFormatter.ofPattern(fmt)
    col(partCol).between(
      start.format(f), endExclusive.minusDays(1).format(f))
  }
}
