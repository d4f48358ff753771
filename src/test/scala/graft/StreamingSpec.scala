package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIngest

/** Structured Streaming layer (SURVEY §2.9): watermarked dedup and
  * 15-min bar aggregation driven through MemoryStream. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class Tick(trade_id: String, underlying: String,
      timestamp: Timestamp, iv: Option[Double], amount: Double)

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-10 10:$min%02d:$sec%02d")

  test("streaming ivBars emits closed 15-min windows with OHLC") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Option[Double], Double)]
    val bars = StreamingIngest.ivBars(
      input.toDF().toDF("trade_id", "underlying", "timestamp", "iv", "amount"),
      watermark = "1 minutes")
    val q = bars.writeStream.format("memory").queryName("bars_out")
      .outputMode("append").start()
    try {
      // bar 10:00-10:15 gets three trades; then advance the watermark
      // far past it so the bar closes
      input.addData(
        ("1", "BTC", ts(1), Some(0.5), 2.0),
        ("2", "BTC", ts(7), Some(0.9), 1.0),
        ("3", "BTC", ts(14), Some(0.7), 1.0))
      q.processAllAvailable()
      input.addData(("4", "BTC", ts(59), Some(0.6), 1.0))
      q.processAllAvailable()
      input.addData(("5", "BTC", Timestamp.valueOf("2024-01-10 11:30:00"),
        Some(0.6), 1.0))
      q.processAllAvailable()
      val out = spark.table("bars_out").collect()
        .map(r => r.getAs[Long]("bucket_start") ->
          (r.getAs[Double]("iv_open"), r.getAs[Double]("iv_high"),
            r.getAs[Double]("iv_low"), r.getAs[Double]("iv_close"),
            r.getAs[Long]("n_trades"))).toMap
      val k = Timestamp.valueOf("2024-01-10 10:00:00").getTime / 1000
      assert(out.contains(k), s"closed bars: ${out.keySet}")
      assert(out(k) == ((0.5, 0.9, 0.5, 0.7, 3L)))
    } finally q.stop()
  }

  test("window closes when its end EQUALS the watermark (<= semantics)") {
    // Pins the boundary rule the st2_streaming_bars oracle encodes:
    // watermark = max event time - delay; a window emits when
    // window.end <= watermark, including exact equality.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Option[Double], Double)]
    val bars = StreamingIngest.ivBars(
      input.toDF().toDF("trade_id", "underlying", "timestamp", "iv", "amount"),
      watermark = "1 minutes")
    val q = bars.writeStream.format("memory").queryName("bars_edge_out")
      .outputMode("append").start()
    try {
      input.addData(("1", "BTC", ts(1), Some(0.5), 2.0))
      q.processAllAvailable()
      // watermark advances to exactly 10:15:00 — the 10:00 window end
      input.addData(("2", "BTC", Timestamp.valueOf("2024-01-10 10:16:00"),
        Some(0.6), 1.0))
      q.processAllAvailable()
      val k = Timestamp.valueOf("2024-01-10 10:00:00").getTime / 1000
      val emitted = spark.table("bars_edge_out").collect()
        .map(_.getAs[Long]("bucket_start")).toSet
      assert(emitted.contains(k),
        s"window ending at the exact watermark must emit; got $emitted")
    } finally q.stop()
  }

  test("null-iv trades do NOT advance the ivBars watermark") {
    // Catalyst pushes the `iv IS NOT NULL` filter below the
    // EventTimeWatermark operator (it does not reference the event
    // time column), so event-time stats see only iv-non-null rows —
    // the rule the st2_streaming_bars oracle's wm CTE encodes.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Option[Double], Double)]
    val bars = StreamingIngest.ivBars(
      input.toDF().toDF("trade_id", "underlying", "timestamp", "iv", "amount"),
      watermark = "1 minutes")
    val q = bars.writeStream.format("memory").queryName("bars_nulliv_out")
      .outputMode("append").start()
    try {
      input.addData(("1", "BTC", ts(1), Some(0.5), 2.0))
      q.processAllAvailable()
      // far-future NULL-iv trades: would close the 10:00 window if
      // they reached the watermark stats
      input.addData(("2", "BTC", Timestamp.valueOf("2024-01-10 11:30:00"),
        None, 1.0))
      q.processAllAvailable()
      input.addData(("3", "BTC", Timestamp.valueOf("2024-01-10 11:31:00"),
        None, 1.0))
      q.processAllAvailable()
      assert(spark.table("bars_nulliv_out").isEmpty,
        "null-iv trades advanced the watermark")
      // a non-null-iv trade at the same horizon does close it
      input.addData(("4", "BTC", Timestamp.valueOf("2024-01-10 11:32:00"),
        Some(0.6), 1.0))
      q.processAllAvailable()
      input.addData(("5", "BTC", Timestamp.valueOf("2024-01-10 11:33:00"),
        Some(0.6), 1.0))
      q.processAllAvailable()
      assert(!spark.table("bars_nulliv_out").isEmpty)
    } finally q.stop()
  }

  test("stream-stream spot join matches trades to same-bucket ticks") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val trades = MemoryStream[(String, String, Timestamp)]
    val ticks = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamingIngest.spotTickJoin(
      trades.toDF().toDF("trade_id", "underlying", "timestamp"),
      ticks.toDF().toDF("symbol", "timestamp", "close"),
      watermark = "1 minutes")
    val q = joined.writeStream.format("memory").queryName("st_join_out")
      .outputMode("append").start()
    try {
      trades.addData(
        ("1", "BTC", ts(3)),   // bucket 10:00
        ("2", "ETH", ts(20)))  // bucket 10:15
      ticks.addData(
        ("BTC", ts(5), 100.0),  // same bucket as trade 1
        ("BTC", ts(22), 101.0), // bucket 10:15 — no BTC trade there
        ("ETH", ts(16), 50.0),  // same bucket as trade 2
        ("ETH", ts(40), 51.0))  // bucket 10:30 — no ETH trade
      q.processAllAvailable()
      val out = spark.table("st_join_out").collect()
        .map(r => (r.getAs[String]("trade_id"), r.getAs[String]("symbol"),
          r.getAs[Double]("close"))).toSet
      assert(out == Set(("1", "BTC", 100.0), ("2", "ETH", 50.0)))
      // trade/tick epochs survive as plain longs
      val eps = spark.table("st_join_out").collect()
        .map(r => (r.getAs[Long]("trade_ep"), r.getAs[Long]("tick_ep")))
      assert(eps.forall { case (a, b) => a / 900 == b / 900 })
    } finally q.stop()
  }

  test("streaming dedup drops duplicate trade_ids within watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Option[Double], Double)]
    val deduped = StreamingIngest.dedupedTrades(
      input.toDF().toDF("trade_id", "underlying", "timestamp", "iv", "amount"),
      watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        ("1", "BTC", ts(1), Some(0.5), 2.0),
        ("1", "BTC", ts(1, 30), Some(0.5), 2.0), // page-overlap dup
        ("2", "BTC", ts(2), Some(0.6), 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming PCR emits put/call ratios for closed bars") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, String, Double)]
    val pcr = StreamingIngest.pcrBars(
      input.toDF().toDF("trade_id", "underlying", "timestamp",
        "option_type", "amount"),
      watermark = "1 minutes")
    val q = pcr.writeStream.format("memory").queryName("pcr_out")
      .outputMode("append").start()
    try {
      input.addData(
        ("1", "BTC", ts(1), "P", 6.0),
        ("2", "BTC", ts(7), "C", 2.0),
        ("3", "BTC", ts(14), "C", 2.0))
      q.processAllAvailable()
      input.addData(("4", "BTC",
        Timestamp.valueOf("2024-01-10 11:30:00"), "C", 1.0))
      q.processAllAvailable()
      val k = Timestamp.valueOf("2024-01-10 10:00:00").getTime / 1000
      val row = spark.table("pcr_out")
        .collect().map(r => r.getAs[Long]("bucket_start") ->
          (r.getAs[Double]("put_volume"), r.getAs[Double]("call_volume"),
            r.getAs[Double]("pcr"))).toMap
      assert(row.contains(k))
      assert(row(k) == ((6.0, 4.0, 1.5)))
    } finally q.stop()
  }

  test("stateful gap detector carries last-seen state across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, String, Timestamp, Option[Double], Double)]
    val gaps = StreamingIngest.gapEvents(
      input.toDF().toDF("trade_id", "underlying", "timestamp", "iv", "amount"),
      thresholdSec = 3600)
    val q = gaps.writeStream.format("memory").queryName("gaps_out")
      .outputMode("append").start()
    try {
      input.addData(("1", "BTC", ts(0), Some(0.5), 1.0),
        ("2", "BTC", ts(5), Some(0.5), 1.0))
      q.processAllAvailable()
      assert(spark.table("gaps_out").count() == 0)
      // next batch: 3h after the last trade of the PREVIOUS batch —
      // detection depends on carried state
      input.addData(("3", "BTC",
        Timestamp.valueOf("2024-01-10 13:05:00"), Some(0.5), 1.0))
      q.processAllAvailable()
      val out = spark.table("gaps_out")
        .collect().map(r => (r.getAs[String]("underlying"),
          r.getAs[Long]("gap_seconds")))
      assert(out.toSeq == Seq(("BTC", 3 * 3600L)))
    } finally q.stop()
  }

  test("RocksDB state store: gap-detector state survives a query restart") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("rocksdb-ckpt").toString
    val saved = StreamingIngest.RocksDbStateStore.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StreamingIngest.RocksDbStateStore.foreach { case (k, v) =>
      spark.conf.set(k, v)
    }
    try {
      val input = MemoryStream[(String, Timestamp)]
      val gaps = StreamingIngest.gapEvents(
        input.toDF().toDF("underlying", "timestamp"), thresholdSec = 3600)
      // memory sink cannot recover from a checkpoint; foreachBatch can
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      def start() = gaps.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingIngest.GapEvent],
              _: Long) =>
            val rows = b.collect()
              .map(g => (g.underlying, g.gap_seconds))
            seen.synchronized { seen ++= rows }
            ()
        }
        .start()
      // run 1: seed the last-seen state, no gap yet
      val q1 = start()
      try {
        input.addData(("BTC", ts(0)), ("BTC", ts(5)))
        q1.processAllAvailable()
        assert(seen.synchronized(seen.isEmpty))
        // the configured provider is actually in play: RocksDB
        // surfaces its own custom state metrics in progress
        val metrics = q1.lastProgress.stateOperators.head
          .customMetrics.keySet()
        assert(metrics.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"state metrics $metrics do not look RocksDB-backed")
      } finally q1.stop()
      // run 2: NEW query from the same checkpoint — the gap vs run 1's
      // last trade is only detectable if state was restored
      val q2 = start()
      try {
        input.addData(("BTC", Timestamp.valueOf("2024-01-10 13:05:00")))
        q2.processAllAvailable()
        assert(seen.synchronized(seen.toSeq) == Seq(("BTC", 3 * 3600L)),
          "state did not survive the restart")
      } finally q2.stop()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sessionBursts splits on an exact gap-length spacing") {
    import spark.implicits._
    // session_window semantics are identical in batch; pin the merge
    // rule the st6 oracle states: an EXACT gap-length spacing still
    // extends the session (intervals merge on touch), only a
    // strictly-greater spacing splits
    val trades = Seq(
      ("BTC", ts(0), 1.0),
      ("BTC", ts(5, 0), 2.0), // exactly 5 min after: still merged
      ("BTC", ts(10, 1), 4.0), // 5 min 1 s after: NEW session
      ("ETH", ts(0), 8.0)) // other key: independent sessions
      .toDF("underlying", "timestamp", "amount")
    val out = trades
      .groupBy(session_window(col("timestamp"), "5 minutes"),
        col("underlying"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("vol"))
      .select(col("underlying"), col("n"), col("vol"),
        unix_timestamp(col("session_window.start")).as("s"),
        unix_timestamp(col("session_window.end")).as("e"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(4) - r.getLong(3))).toSet
    val btc = out.filter(_._1 == "BTC")
    assert(btc.map(t => (t._2, t._3)) == Set((2L, 3.0), (1L, 4.0)))
    // first BTC session spans [t0, t5+gap) = 10 minutes
    assert(btc.map(_._4) == Set(10 * 60L, 5 * 60L))
    assert(out.count(_._1 == "ETH") == 1)
  }

  test("curatedDocs dedups by content hash and applies the quality gate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val out = StreamingIngest.curatedDocs(
      input.toDF().toDF("doc_id", "text", "source", "ingest_ts"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the dog", "a", ts(1)),
        // same text modulo case/whitespace -> same hash -> dropped
        (2L, "  The QUICK brown fox   jumps over the dog ", "a", ts(2)),
        // quality-fail: under 5 words
        (3L, "too short", "b", ts(3)),
        // quality-fail: punct ratio >= 0.3
        (4L, "a!!! b??? c;;; d::: e,,, f...", "b", ts(4)),
        (5L, "another perfectly ordinary document with many words", "b",
          ts(5)))
      q.processAllAvailable()
      val rows = spark.table("curated_out")
        .select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "a"), (5L, "b")))
    } finally q.stop()
  }

  test("streaming ingest writes batchId-keyed partitioned parquet") {
    import spark.implicits._
    val src = Files.createTempDirectory("stream-src").toString
    val tgt = Files.createTempDirectory("stream-tgt").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val seed = Seq(
      ("1", "BTC", ts(1), Some(0.5), 2.0),
      ("2", "ETH", ts(2), Some(0.6), 1.0))
      .toDF("trade_id", "underlying", "timestamp", "iv", "amount")
    seed.write.parquet(s"$src/part1")
    val q = StreamingIngest.startIngest(spark, s"$src/part*", seed.schema,
      tgt, ckpt)
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(s"$tgt/ingest_batch=*")
    assert(written.count() == 2)
    assert(written.columns.contains("month"))
  }
}
