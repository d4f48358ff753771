package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Liquidity, PricePath, SmileWings, TextAnalysis,
  VarSwap}

/** Round-10 second batch: var-swap integral (m12), smile wings (a25),
  * drawdown / vol cone / ACF (a26/m13/m14), HHI + parity audit
  * (a27/a28), Kneser–Ney bigrams and padding waste. Known-answer and
  * boundary tests; the DuckDB oracles gate full-scale parity. */
class Round10bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(epochSec: Long) = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(epochSec))

  // ---- VarSwap ----

  test("var swap integrates the planted ladder exactly") {
    val expiry = java.sql.Date.valueOf("2026-12-31")
    // strikes 100 (C=10,P=10), 200 (C=5,P=30), 300 (C=2,P=60)
    // -> F = 100 (zero C-P gap), K0 = 100, q_sel = 10, 5, 2,
    //    dk = 100 each; contrib = .1 + .0125 + 2222.222222e-6
    val rows = Seq(
      (100.0, "C", 10.0), (100.0, "P", 10.0),
      (200.0, "C", 5.0), (200.0, "P", 30.0),
      (300.0, "C", 2.0), (300.0, "P", 60.0))
      .map { case (k, ot, q) =>
        ("BTC", expiry, k, ot, q, ts(1767225600L)) } // 2026-01-01
    val df = rows.toDF("underlying", "expiry", "strike", "option_type",
      "mark_price", "timestamp")
    val r = VarSwap.impliedVariance(df).head()
    assert(r.getAs[Long]("n_strikes") == 3L)
    assert(r.getAs[Double]("fwd") == 100.0)
    assert(r.getAs[Double]("k0") == 100.0)
    val contrib = 0.1 + 0.0125 + 2222.222222e-6 // 6-dp grid on 1e6 scale
    assert(math.abs(r.getAs[Double]("contrib") - contrib) < 1e-12)
    val t = 364.0 / 365.0
    assert(math.abs(r.getAs[Double]("t_years") - t) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_swap") - 2.0 / t * contrib) < 1e-9)
  }

  test("var swap: forward picks min |C-P| and K0 clamps to min strike") {
    val expiry = java.sql.Date.valueOf("2026-06-26")
    // C-P gaps: 100 -> -40, 200 -> -10 (winner). F = 200 - 10 = 190,
    // K0 = max strike <= 190 = 100.
    val df = Seq(
      (100.0, "C", 10.0), (100.0, "P", 50.0),
      (200.0, "C", 20.0), (200.0, "P", 30.0))
      .map { case (k, ot, q) =>
        ("BTC", expiry, k, ot, q, ts(1767225600L)) }
      .toDF("underlying", "expiry", "strike", "option_type",
        "mark_price", "timestamp")
    val r = VarSwap.impliedVariance(df).head()
    assert(r.getAs[Double]("fwd") == 190.0)
    assert(r.getAs[Double]("k0") == 100.0)
  }

  // ---- SmileWings ----

  test("smile wings pick nearest-moneyness quotes; RR/BF algebra") {
    val expiry = java.sql.Date.valueOf("2026-06-26")
    def row(id: String, k: Double, ot: String, iv: Double) =
      ("BTC", expiry, k, ot, Some(iv), Some(100.0), id)
    val df = Seq(
      row("1", 105.0, "C", 0.30), row("2", 110.0, "C", 0.90),
      row("3", 95.0, "P", 0.20), row("4", 90.0, "P", 0.80),
      row("5", 100.0, "C", 0.25))
      .toDF("underlying", "expiry", "strike", "option_type", "iv",
        "index_price", "trade_id")
    val r = SmileWings.wingQuotes(df).head()
    assert(r.getAs[Long]("n_quotes") == 5L)
    assert(r.getAs[Double]("iv_call_wing") == 0.30)
    assert(r.getAs[Double]("iv_put_wing") == 0.20)
    assert(r.getAs[Double]("iv_atm") == 0.25)
    assert(math.abs(r.getAs[Double]("risk_reversal") - 0.10) < 1e-12)
    assert(math.abs(r.getAs[Double]("butterfly") - 0.0) < 1e-12)
  }

  test("smile wings tie-break on trade_id and drop null ivs") {
    val expiry = java.sql.Date.valueOf("2026-06-26")
    val df = Seq(
      ("BTC", expiry, 105.0, "C", Some(0.4), Some(100.0), "b"),
      ("BTC", expiry, 105.0, "C", Some(0.6), Some(100.0), "a"), // wins tie
      ("BTC", expiry, 95.0, "P", None: Option[Double], Some(100.0), "c"))
      .toDF("underlying", "expiry", "strike", "option_type", "iv",
        "index_price", "trade_id")
    val r = SmileWings.wingQuotes(df).head()
    assert(r.getAs[Long]("n_quotes") == 2L)
    assert(r.getAs[Double]("iv_call_wing") == 0.6)
    assert(r.get(r.fieldIndex("iv_put_wing")) == null)
    assert(r.get(r.fieldIndex("risk_reversal")) == null)
  }

  // ---- PricePath: drawdown ----

  test("max drawdown finds the trough vs the running peak") {
    val closes = Seq(100.0, 120.0, 90.0, 105.0, 60.0)
    val df = closes.zipWithIndex.map { case (c, d) =>
      ("BTC", ts(d * 86400L + 30), c) }
      .toDF("symbol", "timestamp", "close")
    val r = PricePath.maxDrawdown(df).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(math.abs(r.getAs[Double]("max_drawdown") - (60.0 / 120.0 - 1.0))
      < 1e-15)
    assert(r.getAs[Long]("trough_day") == 4L)
    assert(r.getAs[Double]("peak_close") == 120.0)
  }

  test("max drawdown: monotone series never draws down") {
    val df = Seq(100.0, 110.0, 125.0).zipWithIndex.map { case (c, d) =>
      ("BTC", ts(d * 86400L), c) }.toDF("symbol", "timestamp", "close")
    val r = PricePath.maxDrawdown(df).head()
    assert(r.getAs[Double]("max_drawdown") == 0.0)
    assert(r.getAs[Long]("trough_day") == 0L) // tie -> earliest day
  }

  // ---- PricePath: vol cone ----

  test("vol cone: constant +100% returns give vol sqrt(365)") {
    // closes 1,2,4,...,512 -> nine +100% returns; 7-day windows full
    // from day 7 on -> 3 windows, all identical
    val df = (0 to 9).map(d => ("BTC", ts(d * 86400L), math.pow(2.0, d)))
      .toDF("symbol", "timestamp", "close")
    val got = PricePath.volCone(df).collect()
      .map(r => r.getAs[Int]("horizon") -> r).toMap
    assert(!got.contains(30)) // no full 30-day window
    val r7 = got(7)
    assert(r7.getAs[Long]("n_windows") == 3L)
    val expect = math.sqrt(7.0 * 365.0 / 7.0)
    assert(math.abs(r7.getAs[Double]("vol_min") - expect) < 1e-12)
    assert(math.abs(r7.getAs[Double]("vol_max") - expect) < 1e-12)
    assert(math.abs(r7.getAs[Double]("vol_avg") - expect) < 1e-9)
  }

  // ---- PricePath: ACF ----

  test("return ACF: alternating returns give lag-1 -1, lag-2 +1") {
    // closes 100,200,100,200,100,200 -> returns 1,-.5,1,-.5,1
    val df = (0 to 5).map(d =>
      ("BTC", ts(d * 86400L), if (d % 2 == 0) 100.0 else 200.0))
      .toDF("symbol", "timestamp", "close")
    val got = PricePath.returnAcf(df).collect()
      .map(r => r.getAs[Int]("lag") -> r).toMap
    assert(math.abs(got(1).getAs[Double]("acf") - (-1.0)) < 1e-9)
    assert(math.abs(got(2).getAs[Double]("acf") - 1.0) < 1e-9)
    assert(got(1).getAs[Long]("n_pairs") == 4L)
    assert(got(2).getAs[Long]("n_pairs") == 3L)
  }

  // ---- Liquidity: HHI ----

  test("volume HHI: planted concentration") {
    def row(inst: String, amt: Double) =
      ("BTC", ts(3600L), inst, amt)
    val df = Seq(row("A", 2.0), row("A", 1.0), row("B", 1.0))
      .toDF("underlying", "timestamp", "instrument_name", "amount")
    val r = Liquidity.volumeHhi(df).head()
    assert(r.getAs[Long]("n_contracts") == 2L)
    assert(r.getAs[Double]("total_volume") == 4.0)
    assert(math.abs(r.getAs[Double]("hhi") - 10.0 / 16.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("top_share") - 0.75) < 1e-12)
  }

  // ---- Liquidity: parity audit ----

  test("parity audit flags gaps beyond the threshold") {
    val expiry = java.sql.Date.valueOf("2026-06-26")
    def row(k: Double, ot: String, p: Double, s: Double) =
      ("BTC", expiry, k, ot, p, Some(s), ts(60L))
    val df = Seq(
      // strike 98: C=10, P=5, S=100 -> gap (10-5)-(100-98) = 3
      row(98.0, "C", 10.0, 100.0), row(98.0, "P", 5.0, 100.0),
      // strike 50: C=100, P=2, S=100 -> gap 98-50 = 48 (violation)
      row(50.0, "C", 100.0, 100.0), row(50.0, "P", 2.0, 100.0))
      .toDF("underlying", "expiry", "strike", "option_type", "price",
        "index_price", "timestamp")
    val r = Liquidity.parityViolations(df, threshold = 25.0).head()
    assert(r.getAs[Long]("n_strikes") == 2L)
    assert(r.getAs[Long]("n_violations") == 1L)
    assert(math.abs(r.getAs[Double]("violation_rate") - 0.5) < 1e-12)
    assert(r.getAs[Double]("max_abs_gap") == 48.0)
    assert(math.abs(r.getAs[Double]("mean_abs_gap") - 25.5) < 1e-9)
  }

  test("parity audit drops one-sided strikes") {
    val expiry = java.sql.Date.valueOf("2026-06-26")
    val df = Seq(
      ("BTC", expiry, 98.0, "C", 10.0, Some(100.0), ts(60L)))
      .toDF("underlying", "expiry", "strike", "option_type", "price",
        "index_price", "timestamp")
    assert(Liquidity.parityViolations(df).count() == 0L)
  }

  // ---- Kneser–Ney bigrams ----

  test("KN bigram probability matches the hand formula") {
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyBigrams(df, k = 10).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    // counts: (a,b)=2 (b,a)=2 (a,c)=1; ctx a=3 (2 followers), b=2 (1);
    // prec: each of a,b,c preceded by exactly 1 type; 3 bigram types
    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("cb") == 2L && ab.getAs[Long]("cctx") == 3L)
    assert(ab.getAs[Long]("n_follow") == 2L && ab.getAs[Long]("n_prec") == 1L)
    val expect = math.max(2.0 - 0.75, 0.0) / 3.0 +
      0.75 * 2.0 / 3.0 * (1.0 / 3.0)
    assert(math.abs(ab.getAs[Double]("p_kn") - expect) < 1e-15)
    // rows ordered by cb desc then w1, w2
    val head = TextAnalysis.kneserNeyBigrams(df, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(head.take(2).toSeq == Seq(("a", "b"), ("b", "a")))
  }

  test("KN probabilities per context sum to <= 1 on real-ish text") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val rows = TextAnalysis.kneserNeyBigrams(df, k = 1000).collect()
    val byCtx = rows.groupBy(_.getAs[String]("w1"))
    for ((_, rs) <- byCtx) {
      val total = rs.map(_.getAs[Double]("p_kn")).sum
      assert(total <= 1.0 + 1e-9)
    }
  }

  // ---- padding waste ----

  test("pow2 buckets clamp to [16, max] by doubling") {
    val df = Seq(1, 16, 17, 2048, 5000).map(n => Tuple1(n.toLong))
      .toDF("n")
    val got = df.select(TextAnalysis.pow2Bucket(col("n")).as("b"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(16, 16, 32, 2048, 2048))
  }

  test("pad waste: bucket totals and fractions") {
    val df = Seq(
      (1L, "w"),                          // 1 token  -> bucket 16
      (2L, ("w " * 16).trim),             // 16       -> bucket 16
      (3L, ("w " * 17).trim),             // 17       -> bucket 32
      (4L, ("w " * 5000).trim))           // overflow -> bucket 2048
      .toDF("doc_id", "text")
    val got = TextAnalysis.padWaste(df).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(got(16L).getAs[Long]("n_docs") == 2L)
    assert(got(16L).getAs[Long]("total_padding") == 15L)
    assert(got(32L).getAs[Long]("total_padding") == 15L)
    assert(got(2048L).getAs[Long]("total_padding") == 0L)
    assert(math.abs(got(16L).getAs[Double]("pad_frac") - 15.0 / 32.0) < 1e-12)
  }
}
