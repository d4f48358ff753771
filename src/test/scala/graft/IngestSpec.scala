package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._
import graft.schema._

/** Ingest + schema-system layer: backfill loop semantics (resume,
  * idempotence, continuity warnings), checkpoint round-trip, schema
  * DDL + introspection diffs, partitioned store round-trip. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 2,500 raw trades, 1 per second, alternating instruments. */
  private def fixture(n: Int = 2500): IndexedSeq[RawTrade] = {
    val base = 1700000000000L
    (0 until n).map { i =>
      val u = if (i % 2 == 0) "BTC" else "ETH"
      val inst = s"$u-27DEC24-${50000 + (i % 7) * 1000}-${if (i % 3 == 0) "P" else "C"}"
      RawTrade(i.toString, inst, base + i * 1000L, 0.05, 1.0 + i % 5,
        if (i % 2 == 0) "buy" else "sell", Some(0.5), Some(50000.0), None)
    }
  }

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("S7 backfill collects every row exactly once through paging") {
    val target = tmp("bf-target"); val ckpt = tmp("bf-ckpt")
    val fx = fixture()
    val stats = Backfill.collect(spark, new FixturePager(fx), "BTC",
      startMs = fx.head.timestamp_ms - 1,
      endMs = fx.last.timestamp_ms,
      targetDir = target, checkpointDir = ckpt,
      pageSize = 100, batchSize = 500)
    assert(stats.totalCollected == 2500)
    assert(stats.batchesInserted == 5)
    assert(stats.batchesSkipped == 0)
    val readBack = spark.read.parquet(s"$target/batch_token=*")
    assert(readBack.count() == 2500)
    assert(readBack.select("trade_id").distinct().count() == 2500)
    // checkpoint cleared on success
    assert(Backfill.loadCheckpoint(ckpt,
      s"BTC_${fx.head.timestamp_ms - 1}_${fx.last.timestamp_ms}").isEmpty)
  }

  test("S4 idempotent insert skips a re-delivered batch token") {
    val target = tmp("bf-idem")
    val rows = fixture(10).flatMap(Backfill.mapRow)
    val token = Backfill.dedupToken("BTC", 0, 1, 0)
    assert(Backfill.insertBatchIdempotent(spark, rows, token, target))
    assert(!Backfill.insertBatchIdempotent(spark, rows, token, target))
    assert(spark.read.parquet(s"$target/batch_token=*").count() == 10)
  }

  test("S4 retries a partially-written (uncommitted) batch") {
    val target = tmp("bf-partial")
    val rows = fixture(10).flatMap(Backfill.mapRow)
    val token = Backfill.dedupToken("BTC", 0, 2, 0)
    // simulate a crash: directory exists but no _SUCCESS marker
    val dir = java.nio.file.Paths.get(target, s"batch_token=$token")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(Backfill.insertBatchIdempotent(spark, rows, token, target))
    assert(spark.read.parquet(s"$target/batch_token=*").count() == 10)
  }

  test("S6 checkpoint round-trips and enables resume mid-range") {
    val ckpt = tmp("bf-ckpt2")
    val cp = Backfill.Checkpoint(123456789L, 7, 7000L, 2)
    Backfill.saveCheckpoint(ckpt, "k", cp)
    assert(Backfill.loadCheckpoint(ckpt, "k").contains(cp))
    Backfill.clearCheckpoint(ckpt, "k")
    assert(Backfill.loadCheckpoint(ckpt, "k").isEmpty)
  }

  test("resume after checkpoint continues without re-inserting") {
    val target = tmp("bf-resume"); val ckpt = tmp("bf-ckpt3")
    val fx = fixture()
    val startMs = fx.head.timestamp_ms - 1
    val endMs = fx.last.timestamp_ms
    val key = s"BTC_${startMs}_$endMs"
    // simulate a crash after 2 batches (1000 rows): cursor just below
    // the 1000th-newest trade
    val firstRun = Backfill.collect(spark, new FixturePager(fx), "BTC",
      startMs, endMs, target, ckpt, pageSize = 100, batchSize = 500)
    assert(firstRun.batchesInserted == 5)
    // re-run same range WITHOUT resume: tokens dedupe every batch
    val rerun = Backfill.collect(spark, new FixturePager(fx), "BTC",
      startMs, endMs, target, ckpt, pageSize = 100, batchSize = 500,
      resume = false)
    assert(rerun.batchesInserted == 0)
    assert(rerun.batchesSkipped == 5)
    assert(spark.read.parquet(s"$target/batch_token=*").count() == 2500)
  }

  test("S2 page continuity flags gaps and cross-page duplicates") {
    val fx = fixture(20)
    val newer = fx.slice(10, 20) // ts 10..19s
    val older = fx.slice(0, 10)
    assert(Backfill.validatePageContinuity(newer, older).isEmpty)
    val gappy = older.map(r => r.copy(timestamp_ms = r.timestamp_ms - 50000))
    assert(Backfill.validatePageContinuity(newer, gappy)
      .exists(_.contains("gap")))
    val dup = older :+ newer.head
    assert(Backfill.validatePageContinuity(newer, dup)
      .exists(_.contains("duplicate")))
  }

  test("S3 row mapper derives parsed fields and rejects bad names") {
    val good = Backfill.mapRow(RawTrade("1", "BTC-27DEC24-50000-C",
      1700000000000L, 0.05, 1.0, "buy", None, None, None)).get
    assert(good.underlying == "BTC" && good.strike == 50000.0 &&
      good.option_type == "C" && good.expiry.toString == "2024-12-27")
    assert(Backfill.mapRow(RawTrade("2", "DOGE-1JAN24-1-C",
      0L, 0, 0, "buy", None, None, None)).isEmpty)
  }

  test("S9/S10 schema DDL renders and introspector finds all 4 drifts") {
    val spec = TradesSchema.spec
    val ddl = spec.createTableDdl
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS deribit.options_trades"))
    assert(ddl.contains("PARTITIONED BY (month STRING)"))
    assert(ddl.contains("trade_id STRING NOT NULL"))
    // drift detection
    import org.apache.spark.sql.types._
    val actual = StructType(spec.structType.fields.toSeq
      .filterNot(_.name == "strike") // missing
      .map {
        case f if f.name == "price" => f.copy(dataType = FloatType) // type
        case f if f.name == "trade_id" => f.copy(nullable = true) // nullability
        case f => f
      } :+ StructField("rogue", IntegerType)) // extra
    val diffs = SchemaIntrospector.diff(spec, actual)
    assert(diffs.contains(MissingColumn("strike")))
    assert(diffs.contains(ExtraColumn("rogue")))
    assert(diffs.exists { case TypeMismatch("price", _, _) => true; case _ => false })
    assert(diffs.exists { case NullabilityMismatch("trade_id", false, true) => true; case _ => false })
    assert(SchemaIntrospector.diff(spec, spec.structType).isEmpty)
  }

  test("S5 plain append insert accumulates without dedup") {
    import spark.implicits._
    val target = tmp("store-append")
    val rows = fixture(50).flatMap(Backfill.mapRow).toDF()
    TradesStore.write(rows, target)
    TradesStore.write(rows, target,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(TradesStore.read(spark, target).count() == 100)
  }

  test("BatchSink seam: stream delivers each batchId to the sink once") {
    import spark.implicits._
    import graft.streaming.{BatchSink, StreamingIngest}
    val src = tmp("sink-src"); val ckpt = tmp("sink-ckpt")
    val seed = Seq(
      ("1", "BTC", new java.sql.Timestamp(1700000000000L), 1.0),
      ("2", "ETH", new java.sql.Timestamp(1700000001000L), 2.0))
      .toDF("trade_id", "underlying", "timestamp", "amount")
    seed.write.parquet(s"$src/part1")
    val calls = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mock = new BatchSink {
      override def writeBatch(batch: org.apache.spark.sql.DataFrame,
          batchId: Long): Unit =
        calls.synchronized { calls += ((batchId, batch.count())) }
    }
    val q = StreamingIngest.startIngestTo(spark, s"$src/part*",
      seed.schema, mock, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(calls.map(_._1).distinct.size == calls.size,
      s"batchId re-delivered without crash: $calls")
    assert(calls.map(_._2).sum == 2)
  }

  test("ParquetBatchSink: committed batch skipped, partial overwritten") {
    import spark.implicits._
    import graft.streaming.BatchSink
    val target = tmp("sink-idem")
    val sink = BatchSink.forMode("parquet", target)
    val batch = Seq(
      ("1", new java.sql.Timestamp(1700000000000L), 1.0))
      .toDF("trade_id", "timestamp", "amount")
    sink.writeBatch(batch, 7L)
    val dir = java.nio.file.Paths.get(target, "ingest_batch=7")
    val committedAt = java.nio.file.Files
      .getLastModifiedTime(dir.resolve("_SUCCESS"))
    // re-delivery of a COMMITTED batch is a no-op
    sink.writeBatch(batch, 7L)
    assert(java.nio.file.Files.getLastModifiedTime(dir.resolve("_SUCCESS"))
      == committedAt, "committed batch was rewritten")
    // a partial (uncommitted) batch is overwritten on re-delivery
    java.nio.file.Files.delete(dir.resolve("_SUCCESS"))
    sink.writeBatch(batch, 7L)
    assert(java.nio.file.Files.exists(dir.resolve("_SUCCESS")))
    assert(spark.read.parquet(s"$target/ingest_batch=*").count() == 1)
    // unknown modes fail fast at the dispatch point
    intercept[IllegalArgumentException] {
      BatchSink.forMode("clickhouse-cloud", target)
    }
  }

  test("JdbcBatchSink: round-trip, committed replay no-op, partial rewritten") {
    import spark.implicits._
    import graft.streaming.BatchSink
    val dbDir = tmp("derby")
    val url = s"jdbc:derby:$dbDir/sinkdb;create=true"
    val sink = BatchSink.forMode("jdbc", s"$url#trades_jdbc")
    def mkBatch(ids: Range) = ids.map { i =>
      (i.toString, new java.sql.Timestamp(1700000000000L + i * 1000L),
        1.0 + i)
    }.toDF("trade_id", "timestamp", "amount")
    def readBack() = spark.read
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .jdbc(url, "trades_jdbc", new java.util.Properties)

    // batch 0 round-trips
    sink.writeBatch(mkBatch(0 until 10), 0L)
    assert(readBack().count() == 10)
    // amounts are 1.0+i for i in 0..9 -> 55.0 exactly (small ints)
    assert(readBack().agg(org.apache.spark.sql.functions.sum("amount"))
      .first().getDouble(0) == 55.0)
    // replay of a COMMITTED batch is a no-op (no duplicate rows)
    sink.writeBatch(mkBatch(0 until 10), 0L)
    assert(readBack().count() == 10)
    // a partial (uncommitted) crash leftover is deleted and rewritten:
    // write rows tagged batch 1 directly, WITHOUT the commit marker
    mkBatch(100 until 103)
      .withColumn("ingest_batch", org.apache.spark.sql.functions.lit(1L))
      .write.mode("append")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .jdbc(url, "trades_jdbc", new java.util.Properties)
    assert(readBack().count() == 13)
    sink.writeBatch(mkBatch(10 until 15), 1L)
    val b1 = readBack().filter(org.apache.spark.sql.functions
      .col("ingest_batch") === 1L)
    assert(b1.count() == 5, "partial batch-1 rows not replaced")
    assert(readBack().count() == 15)
    // replaying batch 1 after commit stays a no-op
    sink.writeBatch(mkBatch(10 until 15), 1L)
    assert(readBack().count() == 15)
  }

  test("streaming ingest lands exactly-once in the JDBC sink") {
    import spark.implicits._
    import graft.streaming.{BatchSink, StreamingIngest}
    val src = tmp("jdbc-src"); val ckpt = tmp("jdbc-ckpt")
    val dbDir = tmp("derby-stream")
    val url = s"jdbc:derby:$dbDir/streamdb;create=true"
    val seed = (0 until 20).map { i =>
      (i.toString, if (i % 2 == 0) "BTC" else "ETH",
        new java.sql.Timestamp(1700000000000L + i * 1000L), 1.0)
    }.toDF("trade_id", "underlying", "timestamp", "amount")
    seed.write.parquet(s"$src/p1")
    // duplicate delivery of the same trades in a second file: the
    // watermarked dedup must drop them before the sink
    seed.write.parquet(s"$src/p2")
    val sink = BatchSink.forMode("jdbc", s"$url#trades_stream")
    val q = StreamingIngest.startIngestTo(spark, s"$src/p*", seed.schema,
      sink, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .jdbc(url, "trades_stream", new java.util.Properties)
    assert(got.select("trade_id").distinct().count() == 20)
    assert(got.count() == 20, "dedup or batch idempotence failed")
  }

  test("TradesStore writes month partitions that prune on read") {
    import spark.implicits._
    val target = tmp("store")
    val rows = fixture(100).flatMap(Backfill.mapRow)
    TradesStore.write(rows.toDF(), target)
    val dirs = new java.io.File(target).list().filter(_.startsWith("month="))
    assert(dirs.nonEmpty)
    val read = TradesStore.read(spark, target)
    assert(read.count() == 100)
    // partition filter prunes to one directory's worth of rows
    val nov = read.filter(org.apache.spark.sql.functions.col("month") === "202311")
    assert(nov.count() == 100) // fixture all in Nov 2023
  }
}
