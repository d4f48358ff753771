package graft.api

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optional fetch filters — the reference's `fetch_trades` keyword args
  * (`api.py:100-124`). `start` inclusive, `end` exclusive after
  * normalization; date-only `end` expands to next-day midnight
  * (`api.py:67-97`). */
final case class FetchParams(
    underlying: Option[String] = None,
    start: Option[String] = None,
    end: Option[String] = None,
    optionType: Option[String] = None,
    expiry: Option[String] = None,
    strike: Option[Double] = None,
    limit: Option[Int] = None,
    useFinal: Boolean = true)

/** The read API (SURVEY §2.1 S8 + §2.2 F1-F3 + §2.6 O1/O4): validate →
  * compose optional conjunctive filters → FINAL-style dedup → newest
  * first → optional top-k. The whole thing is ONE lazy Catalyst plan:
  * filters and the projection push into the parquet scan; `orderBy
  * +limit` plans TakeOrderedAndProject (per-partition top-k, no global
  * sort); dedup is a hash-aggregate on trade_id — the only shuffle, and
  * it shards by trade_id which is unique → no skew at any scale.
  */
object TradesApi {

  private val outFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")

  private def check(ok: Boolean, msg: => String): Unit =
    if (!ok) throw new graft.QueryError(msg)

  /** F2 fail-fast validation (`api.py:29-64`): ≥1 of start/end/limit,
    * no empty strings, start<=end, limit>=0. Violations raise the
    * typed [[graft.QueryError]] (reference `exceptions.py` QueryError)
    * so a library consumer can branch on the error class. */
  def validateFetchParams(p: FetchParams): Unit = {
    check(p.start.isDefined || p.end.isDefined || p.limit.isDefined,
      "At least one of start, end, or limit is required " +
        "(unbounded full-table fetch refused)")
    Seq("start" -> p.start, "end" -> p.end, "underlying" -> p.underlying,
        "option_type" -> p.optionType, "expiry" -> p.expiry)
      .foreach { case (n, v) =>
        v.foreach(s => check(s.trim.nonEmpty, s"$n must be non-empty"))
      }
    p.limit.foreach(l => check(l >= 0, s"limit must be >= 0, got $l"))
    for (s <- p.start; e <- p.end)
      check(!parseTs(s, isEnd = false).isAfter(parseTs(e, isEnd = false)),
        s"start ($s) must be <= end ($e)")
  }

  private def isDateOnly(s: String): Boolean =
    !s.contains("T") && !s.contains(":")

  private def parseTs(s: String, isEnd: Boolean): LocalDateTime = {
    val t = s.trim
    if (isDateOnly(t)) {
      val d =
        try LocalDate.parse(t)
        catch {
          case _: java.time.DateTimeException =>
            throw new graft.QueryError(s"Unparseable timestamp: $s")
        }
      (if (isEnd) d.plusDays(1) else d).atStartOfDay()
    } else {
      val norm = t.replace("T", " ")
      val patterns = Seq(
        "yyyy-MM-dd HH:mm:ss.SSS", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm")
      patterns.view
        .map(p =>
          try Some(LocalDateTime.parse(norm, DateTimeFormatter.ofPattern(p)))
          catch { case _: java.time.DateTimeException => None })
        .collectFirst { case Some(dt) => dt }
        .getOrElse(throw new graft.QueryError(
          s"Unparseable timestamp: $s"))
    }
  }

  /** F3: normalized `yyyy-MM-dd HH:mm:ss.SSS` string; date-only `end`
    * becomes next-day midnight so `<` keeps the whole end day. */
  def normalizeTimestamp(s: String, isEnd: Boolean): String =
    parseTs(s, isEnd).format(outFmt)

  /** S8: compose-and-return — the caller triggers execution. */
  def fetch(trades: DataFrame, p: FetchParams): DataFrame = {
    validateFetchParams(p)
    val conds: Seq[Column] = Seq(
      p.underlying.map(col("underlying") === _),
      p.start.map(s =>
        col("timestamp") >= lit(normalizeTimestamp(s, isEnd = false))
          .cast("timestamp")),
      p.end.map(e =>
        col("timestamp") < lit(normalizeTimestamp(e, isEnd = true))
          .cast("timestamp")),
      p.optionType.map(col("option_type") === _),
      p.expiry.map(e => col("expiry") === lit(e).cast("date")),
      p.strike.map(col("strike") === _)
    ).flatten
    val filtered =
      conds.reduceOption(_ && _).map(trades.filter).getOrElse(trades)
    // O4: ReplacingMergeTree FINAL analog — one row per trade_id.
    val deduped =
      if (p.useFinal) filtered.dropDuplicates("trade_id") else filtered
    // O1: newest-first; trade_id tiebreaker makes top-k deterministic.
    val sorted = deduped.orderBy(desc("timestamp"), asc("trade_id"))
    p.limit.map(sorted.limit).getOrElse(sorted)
  }
}
