package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.functions.Instruments

/** Batch ingest (SURVEY §2.1 S1-S7): the reference's paginated
  * descending-cursor backfill (`collectors/trades_collector.py:97-436`)
  * re-expressed with the same contract — resumable checkpoints,
  * page-continuity validation, idempotent batched inserts — but with
  * Spark as the sink. The HTTP source is abstracted behind
  * [[TradePager]]; offline builds page over fixture data, an online
  * deployment implements the same trait over the REST endpoint with
  * retry/backoff in the client.
  */

/** Raw API-shape trade (epoch-ms timestamp, underived). */
final case class RawTrade(
    trade_id: String, instrument_name: String, timestamp_ms: Long,
    price: Double, amount: Double, direction: String,
    iv: Option[Double], index_price: Option[Double],
    mark_price: Option[Double])

/** Fully derived row matching TradesSchema (minus the partition col). */
final case class TradeRow(
    trade_id: String, instrument_name: String, timestamp: Timestamp,
    price: Double, amount: Double, direction: String,
    iv: Option[Double], index_price: Option[Double],
    mark_price: Option[Double], underlying: String, expiry: Date,
    strike: Double, option_type: String)

/** S1: one "REST page": the `count` most recent trades at or before
  * `endTsMs`, newest first (Deribit `sorting=desc`). */
trait TradePager {
  def fetchPage(endTsMs: Long, count: Int): Seq[RawTrade]
}

/** In-memory pager over fixture data (tests / offline builds).
  *
  * Pages never split a millisecond group: the driver loop's cursor is
  * `min(page ts) - 1` (the reference's descending-cursor contract,
  * `trades_collector.py:319-321`), so a page boundary inside a group
  * of equal-ms trades would silently skip the rest of the group. The
  * real REST API has exactly this hazard — it is why the reference
  * ships the S2 continuity validator and idempotent re-fetches; a
  * deterministic offline source simply closes the group. */
final class FixturePager(fixture: IndexedSeq[RawTrade]) extends TradePager {
  private val sorted: Vector[RawTrade] = fixture.sortBy(-_.timestamp_ms).toVector

  /** First index with timestamp_ms <= endTsMs (array is descending) —
    * binary search, so a full backfill is O(n log n) over all pages
    * instead of the O(n^2/pageSize) a per-page linear scan costs. */
  private def lowerBound(endTsMs: Long): Int = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid).timestamp_ms > endTsMs) lo = mid + 1 else hi = mid
    }
    lo
  }

  def fetchPage(endTsMs: Long, count: Int): Seq[RawTrade] = {
    val from = lowerBound(endTsMs)
    val until = math.min(from + count, sorted.length)
    if (until == sorted.length) sorted.slice(from, until)
    else {
      val minMs = sorted(until - 1).timestamp_ms
      var ext = until
      while (ext < sorted.length && sorted(ext).timestamp_ms == minMs) ext += 1
      sorted.slice(from, ext)
    }
  }
}

object Backfill {

  val PageSize = 1000
  val BatchSizeForInsert = 10000
  val PaginationGapThresholdMs = 1000L

  /** S2: inter-page continuity — time gap above threshold between the
    * oldest trade of the previous (newer) page and the newest of the
    * current page, plus trade_ids shared by both pages
    * (`trades_collector.py:58-94`). */
  def validatePageContinuity(
      prev: Seq[RawTrade], curr: Seq[RawTrade],
      gapThresholdMs: Long = PaginationGapThresholdMs): Seq[String] = {
    if (prev.isEmpty || curr.isEmpty) Nil
    else {
      val gapMs = prev.map(_.timestamp_ms).min - curr.map(_.timestamp_ms).max
      val gapWarn =
        if (gapMs > gapThresholdMs) Seq(s"page gap ${gapMs}ms") else Nil
      val dups = prev.map(_.trade_id).toSet intersect curr.map(_.trade_id).toSet
      val dupWarn =
        if (dups.nonEmpty) Seq(s"${dups.size} duplicate ids across pages")
        else Nil
      gapWarn ++ dupWarn
    }
  }

  /** S3: raw API trade -> derived row; None when the instrument name
    * does not parse (`trades_collector.py:183-208`). */
  def mapRow(raw: RawTrade): Option[TradeRow] =
    Instruments.parse(raw.instrument_name).map { p =>
      TradeRow(raw.trade_id, raw.instrument_name,
        new Timestamp(raw.timestamp_ms), raw.price, raw.amount,
        raw.direction, raw.iv, raw.index_price, raw.mark_price,
        p.underlying, Date.valueOf(p.expiry), p.strike, p.optionType)
    }

  /** S4 dedup token: sha256(currency:start:end:batch) truncated to 32
    * hex chars (`trades_collector.py:147-155`). */
  def dedupToken(currency: String, startMs: Long, endMs: Long,
      batch: Int): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$currency:$startMs:$endMs:$batch"
      .getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    hex.take(32)
  }

  /** S4: idempotent batched insert — each batch lands in its own
    * token-named parquet directory; a retried batch sees the directory
    * and skips, which is the server-side `insert_deduplication_token`
    * rejection re-expressed for a file sink. */
  def insertBatchIdempotent(spark: SparkSession, rows: Seq[TradeRow],
      token: String, targetDir: String): Boolean = {
    val dir = Paths.get(targetDir, s"batch_token=$token")
    // only a COMMITTED batch (_SUCCESS marker) dedupes the token; a
    // partial directory from a crashed write is overwritten, not
    // silently skipped
    if (Files.exists(dir.resolve("_SUCCESS"))) false
    else {
      import spark.implicits._
      rows.toDF().write.mode(SaveMode.Overwrite).parquet(dir.toString)
      true
    }
  }

  /** S6: checkpoint record (`trades_collector.py:337-343`). */
  final case class Checkpoint(lastEndTs: Long, batchNumber: Int,
      totalCollected: Long, paginationWarnings: Int)

  private def checkpointPath(dir: String, key: String) =
    Paths.get(dir, s"checkpoint_$key.json")

  def saveCheckpoint(dir: String, key: String, cp: Checkpoint): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json =
      s"""{"last_end_ts": ${cp.lastEndTs}, "batch_number": ${cp.batchNumber},
         | "total_collected": ${cp.totalCollected},
         | "pagination_warnings": ${cp.paginationWarnings}}""".stripMargin
    Files.write(checkpointPath(dir, key), json.getBytes(StandardCharsets.UTF_8))
  }

  def loadCheckpoint(dir: String, key: String): Option[Checkpoint] = {
    val p = checkpointPath(dir, key)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      def field(name: String): Long =
        s""""$name":\\s*(-?\\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toLong)
          .getOrElse(throw new graft.IngestError(s"bad checkpoint: $s"))
      Some(Checkpoint(field("last_end_ts"), field("batch_number").toInt,
        field("total_collected"), field("pagination_warnings").toInt))
    }
  }

  def clearCheckpoint(dir: String, key: String): Unit =
    Files.deleteIfExists(checkpointPath(dir, key))

  final case class BackfillStats(
      totalCollected: Long, batchesInserted: Int, batchesSkipped: Int,
      paginationWarnings: Int, pagesFetched: Int)

  /** S7: the descending-cursor driver loop
    * (`trades_collector.py:211-384`): page fetch -> continuity check ->
    * row mapping -> bounded buffer -> every `batchSize` rows an
    * idempotent insert + checkpoint write; tail insert + checkpoint
    * clear at the end. Memory is bounded by `batchSize`, not the total
    * range (the reference's `deque(maxlen)` concern disappears — rows
    * leave the driver at every flush). */
  def collect(
      spark: SparkSession,
      pager: TradePager,
      currency: String,
      startMs: Long,
      endMs: Long,
      targetDir: String,
      checkpointDir: String,
      pageSize: Int = PageSize,
      batchSize: Int = BatchSizeForInsert,
      resume: Boolean = true): BackfillStats = {

    val key = s"${currency}_${startMs}_$endMs"
    val cp = if (resume) loadCheckpoint(checkpointDir, key) else None
    var currentEnd = cp.map(_.lastEndTs).getOrElse(endMs)
    var batchNumber = cp.map(_.batchNumber).getOrElse(0)
    var total = cp.map(_.totalCollected).getOrElse(0L)
    var warnings = cp.map(_.paginationWarnings).getOrElse(0)
    var pages = 0
    var inserted = 0
    var skipped = 0
    var prevPage: Seq[RawTrade] = Nil
    val buffer = scala.collection.mutable.ArrayBuffer.empty[TradeRow]

    def flush(): Unit = if (buffer.nonEmpty) {
      val token = dedupToken(currency, startMs, endMs, batchNumber)
      if (insertBatchIdempotent(spark, buffer.toSeq, token, targetDir))
        inserted += 1
      else skipped += 1
      batchNumber += 1
      buffer.clear()
      saveCheckpoint(checkpointDir, key,
        Checkpoint(currentEnd, batchNumber, total, warnings))
    }

    var done = false
    while (!done && currentEnd > startMs) {
      val page = pager.fetchPage(currentEnd, pageSize)
        .filter(_.timestamp_ms >= startMs)
      pages += 1
      if (page.isEmpty) done = true
      else {
        warnings += validatePageContinuity(prevPage, page).size
        val mapped = page.flatMap(mapRow)
        buffer ++= mapped
        total += mapped.size
        currentEnd = page.map(_.timestamp_ms).min - 1
        prevPage = page
        if (buffer.size >= batchSize) flush()
      }
    }
    flush()
    clearCheckpoint(checkpointDir, key)
    BackfillStats(total, inserted, skipped, warnings, pages)
  }
}
