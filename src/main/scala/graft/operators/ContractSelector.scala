package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Systematic contract selection (SURVEY §2.4 A1, §2.2 F6, §2.3 J1) —
  * the reference's `features/contract_selector.py:34-191`.
  *
  * Strategy chain (each a `DataFrame => DataFrame`, composable with
  * `.transform`): front-month (nearest expiry per 15-min bar) → ATM
  * band → daily-liquidity floor.
  *
  * Scale notes:
  *  - Front-month is ONE hash aggregate keyed (bar, underlying) —
  *    mirrors the reference's deliberate argMin-not-ROW_NUMBER choice
  *    (`contract_selector.py:10-15`); cardinality grows with time
  *    range, so it shards evenly at 100 TB.
  *  - The liquidity filter is the window-function rewrite of the
  *    reference's self-join (`contract_selector.py:74-93`): one shuffle
  *    by (instrument, day) instead of scanning the base twice.
  */
object ContractSelector {

  val DefaultAtmWidth = 0.05 // config.py atm_width
  val DefaultMinVolume = 10.0 // config.py min_volume

  /** Seconds-epoch floored to `sec`-second buckets. */
  def bucketS(ts: Column, sec: Int): Column = {
    val e = unix_timestamp(ts)
    e - e % sec
  }

  /** A1: per (bar, underlying), the whole row of the trade with minimum
    * DTE. `tieBreak` must be row-unique so ties on DTE resolve
    * deterministically (the reference's argMin keeps an arbitrary row;
    * we keep the one with the smallest tieBreak — documented
    * determinism, needed for oracle parity). */
  def frontMonth(
      trades: DataFrame,
      tieBreak: Column,
      intervalSec: Int = 900): DataFrame = {
    val dte = datediff(col("expiry"), to_date(col("timestamp")))
    // unique selection key: dte in the high digits, tiebreak below
    val key = dte.cast("long") * lit(10000000000000L) + tieBreak.cast("long")
    trades
      .groupBy(
        bucketS(col("timestamp"), intervalSec).as("bucket_start"),
        col("underlying"))
      .agg(min_by(
        struct(
          col("timestamp"), col("instrument_name"), col("strike"),
          col("expiry"), col("option_type"), col("iv"), col("price"),
          col("amount"), col("direction"), col("index_price")),
        key).as("sel"))
      .select(col("bucket_start"), col("underlying"), col("sel.*"))
  }

  /** F6: strike within ±width of spot (`contract_selector.py:64-72`);
    * null index_price rows drop (null comparison is never true). */
  def atmFilter(df: DataFrame, width: Double = DefaultAtmWidth): DataFrame =
    df.filter((col("strike") / col("index_price"))
      .between(1.0 - width, 1.0 + width))

  /** J1 (window form): keep rows whose instrument traded at least
    * `minVolume` notional that day. Day = epoch-floored from the bar so
    * the whole chain stays integer arithmetic. Adds `daily_volume`. */
  def liquidityFilter(
      df: DataFrame, minVolume: Double = DefaultMinVolume): DataFrame = {
    val day = col("bucket_start") - col("bucket_start") % 86400
    val w = Window.partitionBy(col("instrument_name"), day)
    df.withColumn("daily_volume",
        sum(col("amount").cast(DecimalType(28, 6))).over(w).cast("double"))
      .filter(col("daily_volume") >= minVolume)
  }
}
