package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, IvPercentile}

class QualityWindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("A10 quality metrics: counts, span, rates") {
    import spark.implicits._
    val trades = Seq(
      ("a", ts("2024-01-01 00:00:00"), Option(0.5), Option(42000.0)),
      ("a", ts("2024-01-01 06:00:00"), None, Option(42000.0)), // dup id
      ("b", ts("2024-01-03 12:00:00"), Option(0.0), None))
      .toDF("trade_id", "timestamp", "iv", "index_price")
    val m = DataQuality.qualityMetrics(trades).collect().head
    assert(m.getAs[Long]("total_rows") == 3)
    assert(m.getAs[Long]("unique_trades") == 2)
    assert(m.getAs[Int]("date_span_days") == 2)
    assert(m.getAs[Long]("null_iv_count") == 2) // null + zero
    assert(m.getAs[Long]("null_index_count") == 1)
    // span 60h -> 3/60
    assert(math.abs(m.getAs[Double]("avg_trades_per_hour") - 0.05) < 1e-12)
    assert(math.abs(m.getAs[Double]("dedup_rate") - 2.0 / 3) < 1e-12)
  }

  test("A18 sketches stay within error bounds of the exact counts") {
    val trades = graft.options.SyntheticTrades
      .trades(TestSpark.spark, "/root/testdata/sf0.001")
    val row = graft.queries.QualityQueries
      .a18QualitySketch(TestSpark.spark, "/root/testdata/sf0.001").head()
    val exactIds = trades.select(countDistinct(col("trade_id")))
      .head().getLong(0)
    val approxIds = row.getAs[Long]("approx_unique_trades")
    // HLL++ default rsd is 5%; allow 3x
    assert(math.abs(approxIds - exactIds).toDouble / exactIds < 0.15,
      s"approx=$approxIds exact=$exactIds")
    val qs = Seq(row.getAs[Double]("price_p50"),
      row.getAs[Double]("price_p95"), row.getAs[Double]("price_p99"))
    assert(qs(0) <= qs(1) && qs(1) <= qs(2))
    val exactMedian = trades.stat.approxQuantile("price", Array(0.5), 0.0)(0)
    assert(math.abs(qs(0) - exactMedian) / math.max(exactMedian, 1e-9) < 0.05,
      s"median sketch ${qs(0)} vs exact $exactMedian")
  }

  test("W1 gap analysis finds and ranks gaps above threshold") {
    import spark.implicits._
    val trades = Seq(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"),
      ts("2024-01-01 11:00:00"), // 10h gap
      ts("2024-01-01 17:30:00"), // 6.5h gap
      ts("2024-01-01 18:00:00"))
      .map(Tuple1(_)).toDF("timestamp")
    val gaps = DataQuality.gapAnalysis(trades, thresholdHours = 4).collect()
    assert(gaps.map(_.getAs[Long]("gap_hours")).toSeq == Seq(10L, 6L))
    assert(gaps.head.getAs[Long]("gap_end")
      - gaps.head.getAs[Long]("gap_start") == 36000)
  }

  test("W2 percentile counts prior values <= current in time window") {
    import spark.implicits._
    // bars 900s apart: iv 1,2,3,2 -> at row 3 (iv=2): priors (1,2,3), leq 2
    val bars = Seq((0L, 1.0), (900L, 2.0), (1800L, 3.0), (2700L, 2.0))
      .map { case (b, v) => ("BTC", b, v) }
      .toDF("underlying", "bucket_start", "iv_close")
    val out = IvPercentile.ivPercentile(
      bars, "iv_close", Seq(col("underlying")),
      lookbackSec = 10000L, minPeriods = 2)
      .orderBy("bucket_start").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("iv_percentile"))) // 0 priors
    assert(out(1).isNullAt(out(1).fieldIndex("iv_percentile"))) // 1 prior < 2
    assert(out(2).getAs[Double]("iv_percentile") == 100.0) // 2 priors <= 3
    assert(math.abs(out(3).getAs[Double]("iv_percentile") - 200.0 / 3) < 1e-9)
  }

  test("W2 time window expires old bars") {
    import spark.implicits._
    val bars = Seq((0L, 9.0), (900L, 1.0), (1800L, 2.0), (2700L, 3.0))
      .map { case (b, v) => ("BTC", b, v) }
      .toDF("underlying", "bucket_start", "iv_close")
    // lookback 2000s: at bar 2700, bar 0 (iv=9) is out of range
    val out = IvPercentile.ivPercentile(
      bars, "iv_close", Seq(col("underlying")),
      lookbackSec = 2000L, minPeriods = 2)
      .orderBy("bucket_start").collect()
    assert(out(3).getAs[Double]("iv_percentile") == 100.0) // priors 1,2 <= 3
  }

  test("W3 rank is min-max scaled, null on zero range") {
    import spark.implicits._
    val bars = Seq((0L, 2.0), (900L, 4.0), (1800L, 3.0),
      (2700L, 5.0), (3600L, 5.0))
      .map { case (b, v) => ("BTC", b, v) }
      .toDF("underlying", "bucket_start", "iv_close")
    val out = IvPercentile.ivRank(
      bars, "iv_close", Seq(col("underlying")),
      lookbackSec = 100000L, minPeriods = 1)
      .orderBy("bucket_start").collect()
    assert(out(2).getAs[Double]("iv_rank") == 50.0) // (3-2)/(4-2)
    assert(out(3).getAs[Double]("iv_rank") == 100.0)
    // single-value window has zero range -> null
    val solo = IvPercentile.ivRank(
      Seq(("BTC", 0L, 2.0)).toDF("underlying", "bucket_start", "iv_close"),
      "iv_close", Seq(col("underlying")), 1000L, 1).collect().head
    assert(solo.isNullAt(solo.fieldIndex("iv_rank")))
  }
}
