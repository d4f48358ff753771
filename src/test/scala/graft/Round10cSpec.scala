package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{NearestJoin, Seasonality, SpotCorr, TextAnalysis}

/** Round-10 third batch: nearest-temporal join (j7), streaming merge
  * totals (st11 — oracle-gated; batch semantics here), Zipf fit,
  * hour-of-day seasonality, rolling beta. */
class Round10cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(epochSec: Long) = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(epochSec))

  private def nearestOf(lefts: Seq[Long], rights: Seq[(Long, Double)])
      : Map[Long, (Option[Double], Option[Long])] = {
    val l = lefts.map(t => ("K", ts(t), t)).toDF("k", "t", "id")
    val r = rights.map { case (t, v) => ("K", ts(t), v) }
      .toDF("k", "t", "v")
    NearestJoin.nearest(l, r, "k", "t", "t", "v", "nv", "d")
      .collect().map(row => row.getAs[Long]("id") ->
        ((Option(row.getAs[java.lang.Double]("nv")).map(_.doubleValue),
          Option(row.getAs[java.lang.Long]("d")).map(_.longValue))))
      .toMap
  }

  test("nearest join picks the closer side, ties backward") {
    val got = nearestOf(Seq(10L, 20L, 35L, 15L),
      Seq((8L, 1.0), (22L, 2.0), (30L, 3.0)))
    assert(got(10L) == ((Some(1.0), Some(2000000L))))  // 8 at d2 vs 22 at d12
    assert(got(20L) == ((Some(2.0), Some(2000000L))))  // 22 at d2
    assert(got(35L) == ((Some(3.0), Some(5000000L))))  // only backward
    assert(got(15L) == ((Some(1.0), Some(7000000L))))  // 8/22 tie -> backward
  }

  test("nearest join: exact-timestamp match has zero delta") {
    val got = nearestOf(Seq(22L), Seq((8L, 1.0), (22L, 2.0)))
    assert(got(22L) == ((Some(2.0), Some(0L))))
  }

  test("nearest join carries across day buckets in both directions") {
    val day = 86400L
    // rights on day 0 and day 5; lefts on days 1 and 4 have no
    // same-day right rows at all
    val got = nearestOf(Seq(day + 100L, 4 * day + 100L),
      Seq((10L, 1.0), (5 * day + 10L, 5.0)))
    assert(got(day + 100L)._1 == Some(1.0))      // day-0 carry-forward
    assert(got(4 * day + 100L)._1 == Some(5.0))  // day-5 carry-back
  }

  test("nearest join: keys with no right rows yield nulls") {
    val l = Seq(("A", ts(10), 1L), ("B", ts(10), 2L))
      .toDF("k", "t", "id")
    val r = Seq(("A", ts(12), 7.0)).toDF("k", "t", "v")
    val got = NearestJoin.nearest(l, r, "k", "t", "t", "v", "nv", "d")
      .collect().map(row => row.getAs[Long]("id") ->
        Option(row.getAs[java.lang.Double]("nv"))).toMap
    assert(got(1L) == Some(7.0))
    assert(got(2L).isEmpty)
  }

  test("nearest join dedups right rows per microsecond with max value") {
    val got = nearestOf(Seq(10L), Seq((10L, 1.0), (10L, 9.0)))
    assert(got(10L) == ((Some(9.0), Some(0L))))
  }

  // ---- Zipf fit ----

  test("zipf fit recovers the OLS of a planted frequency curve") {
    // counts 24/r at ranks 1..4 — an exact power law (alpha = 1)
    val words = Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, topK = 500).head()
    assert(r.getAs[Long]("n_vocab") == 4L)
    assert(r.getAs[Long]("n_fit") == 4L)
    // reference OLS on the same 6-dp-quantized points
    def q(x: Double) = math.rint(x * 1e6) / 1e6
    val xs = (1 to 4).map(i => q(math.log(i)))
    val ys = Seq(24, 12, 8, 6).map(c => q(math.log(c)))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("alpha") - (-slope)) < 1e-4)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.999999) // exact power law
  }

  // ---- hour profile ----

  test("hour profile: shares sum to 1 and peak is the busiest hour") {
    val df = Seq(
      ("BTC", ts(3600L + 5), "i1", 1.0),
      ("BTC", ts(3600L + 9), "i1", 2.0),
      ("BTC", ts(5 * 3600L), "i2", 3.0))
      .toDF("underlying", "timestamp", "instrument_name", "amount")
    val got = Seasonality.hourProfile(df).collect()
      .map(r => r.getAs[Int]("hour") -> r).toMap
    assert(got(1).getAs[Long]("n_trades") == 2L)
    assert(got(1).getAs[Boolean]("is_peak"))
    assert(!got(5).getAs[Boolean]("is_peak"))
    assert(math.abs(got(1).getAs[Double]("volume_share") - 0.5) < 1e-12)
    assert(math.abs(got(5).getAs[Double]("volume_share") - 0.5) < 1e-12)
  }

  // ---- rolling beta ----

  test("rolling beta: exact 2x return relation gives beta 2, corr 1") {
    // BTC alternates +1%/+2%, ETH +2%/+4% -> y ~= 2x every day
    var (b, e) = (100.0, 100.0)
    val rows = (0 to 9).flatMap { d =>
      val out = Seq(("BTC", ts(d * 86400L + 60), b),
        ("ETH", ts(d * 86400L + 60), e))
      val (rb, re) = if (d % 2 == 0) (1.01, 1.02) else (1.02, 1.04)
      b *= rb; e *= re
      out
    }
    val got = SpotCorr.rollingBeta(rows.toDF("symbol", "timestamp", "close"))
      .collect()
    assert(got.length == 3) // 9 aligned return days, 7-day windows
    for (r <- got) {
      assert(math.abs(r.getAs[Double]("beta_w") - 2.0) < 1e-4)
      assert(math.abs(r.getAs[Double]("corr_w") - 1.0) < 1e-6)
    }
  }
}
