package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{FetchParams, TradesApi}
import graft.functions.Instruments
import graft.options.SyntheticTrades
import graft.util.Parity

/** Correctness entries for the instrument parser (P1-P3) and the
  * fetch read API (S8 + F1-F3 + O4). */
object FetchQueries {

  /** Known-bad names that must parse to nulls with valid=false. */
  private val invalidNames = Seq(
    "XRP-27DEC24-100-C",   // unknown underlying
    "BTC-99ZZZ99-100-C",   // in-pattern but impossible month
    "BTC-27DEC24-100-X",   // bad option type
    "btc-27dec24-100-c",   // case-sensitive
    "BTC-27DEC24--C",      // missing strike
    "garbage")

  // ---- P1/P2: parse instrument_name back out of the derivation ----
  def p1Parse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = SyntheticTrades.trades(s, dir)
      .select(col("instrument_name")).distinct()
    val bad = invalidNames.toDF("instrument_name")
    val n = col("instrument_name")
    names.unionAll(bad).select(
      n,
      Instruments.underlyingCol(n).as("p_underlying"),
      Instruments.expiryCol(n).cast("string").as("p_expiry"),
      Instruments.strikeCol(n).as("p_strike"),
      Instruments.optionTypeCol(n).as("p_option_type"),
      Instruments.isValidCol(n).as("p_valid"))
  }

  val p1Oracle: String = {
    val vals = invalidNames.map(x => s"('$x')").mkString(", ")
    s"""WITH ${SyntheticTrades.tradesCte},
       |names AS (
       |  SELECT DISTINCT instrument_name FROM trades
       |  UNION ALL
       |  SELECT * FROM (VALUES $vals) t(instrument_name)
       |)
       |SELECT instrument_name,
       |  ${Instruments.duckUnderlying("instrument_name")} AS p_underlying,
       |  CAST((${Instruments.duckExpiry("instrument_name")}) AS VARCHAR) AS p_expiry,
       |  ${Instruments.duckStrike("instrument_name")} AS p_strike,
       |  ${Instruments.duckOptionType("instrument_name")} AS p_option_type,
       |  ${Instruments.duckIsValid("instrument_name")} AS p_valid
       |FROM names""".stripMargin
  }

  // ---- S8: fetch with filters + FINAL dedup + newest-first top-k ----
  def s8Fetch(s: SparkSession, dir: String): DataFrame = {
    val t = SyntheticTrades.trades(s, dir)
    // Synthesize exact-duplicate rows (a re-ingested page) so the
    // FINAL dedup stage has real work to do.
    val dups = t.filter(col("trade_id").cast("long") % 7 === 0)
    val fetched = TradesApi.fetch(
      t.unionAll(dups),
      FetchParams(
        underlying = Some("BTC"),
        start = Some("2024-01-02"),
        end = Some("2024-01-04"), // date-only: expands to < 01-05 00:00
        limit = Some(500)))
    fetched.select(
      col("trade_id"), col("instrument_name"),
      Parity.epochS(col("timestamp")).as("ep"),
      col("price"), col("amount"), col("direction"), col("iv"),
      col("index_price"), col("mark_price"), col("underlying"),
      col("expiry").cast("string").as("expiry"),
      col("strike"), col("option_type"))
  }

  val s8Oracle: String =
    s"""WITH ${SyntheticTrades.tradesCte},
       |with_dups AS (
       |  SELECT * FROM trades
       |  UNION ALL
       |  SELECT * FROM trades WHERE CAST(trade_id AS BIGINT) % 7 = 0
       |),
       |dedup AS (
       |  SELECT * FROM with_dups
       |  QUALIFY row_number() OVER (PARTITION BY trade_id ORDER BY trade_id) = 1
       |)
       |SELECT trade_id, instrument_name,
       |  ${Parity.duckEpochS("\"timestamp\"")} AS ep,
       |  price, amount, direction, iv, index_price, mark_price,
       |  underlying, CAST(expiry AS VARCHAR) AS expiry, strike, option_type
       |FROM dedup
       |WHERE underlying = 'BTC'
       |  AND "timestamp" >= TIMESTAMP '2024-01-02 00:00:00'
       |  AND "timestamp" < TIMESTAMP '2024-01-05 00:00:00'
       |ORDER BY "timestamp" DESC, trade_id ASC
       |LIMIT 500""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "p1_parse_instrument" -> QueryDef(p1Parse _, p1Oracle),
    "s8_fetch_final" -> QueryDef(s8Fetch _, s8Oracle))
}
