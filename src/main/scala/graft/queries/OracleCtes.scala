package graft.queries

import graft.operators.DteBuckets
import graft.options.SyntheticTrades
import graft.util.Parity._

/** Shared DuckDB CTE fragments for the options-domain oracles. All
  * bucketing is integer epoch arithmetic (`ep - ep % sec`) so both
  * engines agree bit-for-bit and no raw timestamps reach the
  * comparator. */
object OracleCtes {

  /** trades + ep (epoch s) + bucket_start (15-min) + dte. */
  val enriched: String =
    s"""${SyntheticTrades.tradesCte},
       |enriched AS (
       |  SELECT *, ep - ep % 900 AS bucket_start,
       |    expiry - CAST("timestamp" AS DATE) AS dte
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep FROM trades)
       |)""".stripMargin

  /** CASE bucket over the reference 6-bucket DTE set. */
  val dteBucketCase: String =
    DteBuckets.buckets
      .map { case (lo, hi) => s"WHEN dte BETWEEN $lo AND $hi THEN 'dte_${lo}_$hi'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  /** CASE bucket over the PCR tenor set (LEAPS excluded). */
  val pcrBucketCase: String =
    DteBuckets.buckets.filter(_._2 <= 90)
      .map { case (lo, hi) => s"WHEN dte BETWEEN $lo AND $hi THEN 'pcr_${lo}_${hi}d'" }
      .mkString("CASE ", " ", " ELSE NULL END")

  /** 15-min spot close bars from the spot tick series (A17). */
  val spotBars: String =
    s"""${SyntheticTrades.spotCte},
       |spot_bars AS (
       |  SELECT symbol, ep2 - ep2 % 900 AS ts_bucket,
       |    arg_max(close, "timestamp") AS close
       |  FROM (SELECT *, ${duckEpochS("\"timestamp\"")} AS ep2 FROM spot_ticks)
       |  GROUP BY symbol, ts_bucket
       |)""".stripMargin

  /** enriched trades LEFT JOIN spot bars + hybrid spot + moneyness
    * (J2/P5). */
  val enrichedSpot: String =
    s"""$enriched,
       |$spotBars,
       |enriched_spot AS (
       |  SELECT e.*, s.close AS binance_spot,
       |    coalesce(e.index_price, s.close) AS spot_price,
       |    e.strike / coalesce(e.index_price, s.close) AS moneyness
       |  FROM enriched e
       |  LEFT JOIN spot_bars s
       |    ON s.symbol = e.underlying AND s.ts_bucket = e.bucket_start
       |)""".stripMargin

  /** P6 moneyness bucket CASE (null-safe like the Spark expr). */
  def moneynessBucketCase(m: String): String =
    s"""CASE
       |  WHEN $m IS NULL THEN NULL
       |  WHEN $m < 0.90 THEN 'deep_otm_put'
       |  WHEN $m < 0.95 THEN 'otm_put'
       |  WHEN $m < 1.05 THEN 'atm'
       |  WHEN $m < 1.10 THEN 'otm_call'
       |  ELSE 'deep_otm_call'
       |END""".stripMargin
}
