package graft.options

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Deterministic derivation of an options-trades fact table (the
  * reference's `deribit.options_trades` schema — see
  * reference `schema/clickhouse/options_trades.yaml:49-189`) from the
  * driver-generated `events` table, so every options-domain operator can
  * be verified against a DuckDB oracle running the *same* derivation.
  *
  * Every expression is integer/exact-double arithmetic that evaluates
  * bit-identically in Spark and DuckDB. Columns mirror §1.2 of SURVEY.md:
  * trade_id, instrument_name, timestamp, price, amount, direction, iv,
  * index_price, mark_price, underlying, expiry, strike, option_type.
  */
object SyntheticTrades {

  private val monthNames = graft.functions.Instruments.months

  /** Spark-side derivation. Pure narrow projection over events — no
    * shuffle; at 100 TB this is a map stage fused into whatever consumes
    * it by whole-stage codegen. */
  def trades(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val e = col("event_id")
    val u = col("user_id")
    val v = col("value")

    val underlying = when(u % 2 === 0, "BTC").otherwise("ETH")
    val optionType = when(e % 3 === 0, "P").otherwise("C")
    val expiry = date_add(to_date(col("ts")), (lit(7) + e % 60).cast("int"))
    val strike = lit(8000.0) + lit(250.0) * (e % 17).cast("double")
    val instrument =
      graft.functions.Instruments.formatCol(underlying, expiry, strike, optionType)

    ev.select(
      e.cast("string").as("trade_id"),
      instrument.as("instrument_name"),
      col("ts").as("timestamp"),
      (v / 100.0).as("price"),
      v.as("amount"),
      when(e % 5 < 2, "buy").otherwise("sell").as("direction"),
      when(e % 19 === 0, lit(null).cast("double"))
        .otherwise(lit(0.2) + (e % 100).cast("double") / 250.0).as("iv"),
      when(e % 23 === 0, lit(null).cast("double"))
        .otherwise(lit(9500.0) + u.cast("double") * 7.0).as("index_price"),
      (v / 100.0 * 1.01).as("mark_price"),
      underlying.as("underlying"),
      expiry.as("expiry"),
      strike.as("strike"),
      optionType.as("option_type"))
  }

  /** Spot price series (the reference's `ohlcv` feed,
    * `features/spot_provider.py:90-95`): 'view' events as ticks. */
  def spotTicks(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(col("event_type") === "view").select(
      when(col("user_id") % 2 === 0, "BTC").otherwise("ETH").as("symbol"),
      col("ts").as("timestamp"),
      (lit(9400.0) + col("user_id").cast("double") * 7.0
        + (col("event_id") % 11).cast("double") * 3.0).as("close"))
  }

  /** DuckDB CTE producing the identical trades table. Embed as
    * `WITH $tradesCte SELECT ...`. */
  val tradesCte: String = {
    val monthCase = monthNames.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
      .mkString("CASE extract(month FROM expiry) ", " ", " END")
    s"""trades AS (
       |  SELECT
       |    CAST(event_id AS VARCHAR) AS trade_id,
       |    underlying || '-' ||
       |      CAST(extract(day FROM expiry) AS VARCHAR) ||
       |      $monthCase ||
       |      lpad(CAST(extract(year FROM expiry) % 100 AS VARCHAR), 2, '0') ||
       |      '-' || CAST(CAST(strike AS BIGINT) AS VARCHAR) ||
       |      '-' || option_type AS instrument_name,
       |    ts AS "timestamp",
       |    value / 100.0 AS price,
       |    value AS amount,
       |    CASE WHEN event_id % 5 < 2 THEN 'buy' ELSE 'sell' END AS direction,
       |    CASE WHEN event_id % 19 = 0 THEN NULL
       |         ELSE 0.2 + CAST(event_id % 100 AS DOUBLE) / 250.0 END AS iv,
       |    CASE WHEN event_id % 23 = 0 THEN NULL
       |         ELSE 9500.0 + CAST(user_id AS DOUBLE) * 7.0 END AS index_price,
       |    value / 100.0 * 1.01 AS mark_price,
       |    underlying,
       |    expiry,
       |    strike,
       |    option_type
       |  FROM (
       |    SELECT *,
       |      CASE WHEN user_id % 2 = 0 THEN 'BTC' ELSE 'ETH' END AS underlying,
       |      CASE WHEN event_id % 3 = 0 THEN 'P' ELSE 'C' END AS option_type,
       |      CAST(ts AS DATE) + CAST(7 + event_id % 60 AS INTEGER) AS expiry,
       |      8000.0 + 250.0 * CAST(event_id % 17 AS DOUBLE) AS strike
       |    FROM events
       |  )
       |)""".stripMargin
  }

  /** DuckDB CTE for the spot tick series. */
  val spotCte: String =
    """spot_ticks AS (
      |  SELECT
      |    CASE WHEN user_id % 2 = 0 THEN 'BTC' ELSE 'ETH' END AS symbol,
      |    ts AS "timestamp",
      |    9400.0 + CAST(user_id AS DOUBLE) * 7.0
      |      + CAST(event_id % 11 AS DOUBLE) * 3.0 AS close
      |  FROM events WHERE event_type = 'view'
      |)""".stripMargin
}
