package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DistributedSelection, EventsAnalytics, SmileFit,
  SpotCorr, TextAnalysis}

/** Round-10 operators: distributed exact selection (a21/a22), the
  * quadratic smile fit (m10), cross-asset correlation (m11), rolling
  * actives (ev6) and character coverage. Boundary + known-answer
  * tests; the DuckDB oracles gate full-scale parity. */
class Round10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- DistributedSelection ----

  test("quantiles match the naive row_number selection, ties included") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { i =>
      (if (i % 2 == 0) "A" else "B",
        // heavy ties: values drawn from a small grid
        math.floor(rng.nextDouble() * 20) / 4.0, i.toString)
    }
    val df = rows.toDF("underlying", "amount", "trade_id")
    val qs = Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))
    val got = DistributedSelection
      .quantiles(df.select($"underlying", $"amount"), "underlying", "amount", qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // naive reference: element at rank ceil(q*n) under value order
    for (k <- Seq("A", "B")) {
      val vals = rows.filter(_._1 == k).map(_._2).sorted
      val n = vals.length
      def at(a: Int, b: Int) = vals((a * n + b - 1) / b - 1)
      val (gn, p50, p90, p99) = got(k)
      assert(gn == n)
      assert(p50 == at(1, 2) && p90 == at(9, 10) && p99 == at(99, 100))
    }
  }

  test("quantiles: single-row and single-value groups") {
    val df = Seq(("A", 5.0, "1"), ("B", 2.0, "2"), ("B", 2.0, "3"))
      .toDF("underlying", "amount", "trade_id")
    val got = DistributedSelection
      .quantiles(df.select($"underlying", $"amount"), "underlying", "amount",
        Seq((1, 2, "p50"), (99, 100, "p99")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("A").getDouble(2) == 5.0 && got("A").getDouble(3) == 5.0)
    assert(got("B").getDouble(2) == 2.0 && got("B").getDouble(3) == 2.0)
  }

  test("trimmed mean: zero-trim degenerates to the exact mean") {
    val df = (1 to 9).map(i => ("K", i.toDouble)).toDF("k", "v")
    // 5% of 9 rows floors to 0 -> nothing trimmed
    val r = DistributedSelection.trimmedMean(df, "k", "v", 5, 100)
      .head()
    assert(r.getAs[Long]("n_kept") == 9L)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 5.0) < 1e-12)
  }

  test("trimmed mean drops exactly floor(n/den) ranks per side") {
    // n=10, trim 10% each side -> drop min and max, mean of 2..9
    val df = (1 to 10).map(i => ("K", i.toDouble)).toDF("k", "v")
    val r = DistributedSelection.trimmedMean(df, "k", "v", 10, 100).head()
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(math.abs(r.getAs[Double]("trimmed_mean") - 5.5) < 1e-12)
  }

  // ---- SmileFit ----

  test("smile fit recovers a planted quadratic") {
    // iv = 0.5 - 0.4 m + 0.2 m^2 exactly on a grid of m values
    val rows = for {
      i <- 1 to 60
      m = 0.5 + i * 0.025
    } yield ("BTC", "C", 10000.0 * m, 10000.0,
      0.5 - 0.4 * m + 0.2 * m * m)
    val df = rows.toDF("underlying", "option_type", "strike",
      "index_price", "iv")
    val r = SmileFit.quadraticSmile(df).head()
    assert(r.getAs[Long]("n_fit") == 60L)
    assert(math.abs(r.getAs[Double]("a_coef") - 0.5) < 1e-4)
    assert(math.abs(r.getAs[Double]("b_coef") + 0.4) < 1e-4)
    assert(math.abs(r.getAs[Double]("c_coef") - 0.2) < 1e-4)
    // vertex of 0.2 m^2 - 0.4 m + 0.5 is at m = 1
    assert(math.abs(r.getAs[Double]("vertex_m") - 1.0) < 1e-3)
  }

  test("smile fit drops invalid rows and keeps groups independent") {
    val df = Seq(
      ("BTC", "C", 9000.0, Some(10000.0), Some(0.3)),
      ("BTC", "C", 10000.0, Some(10000.0), Some(0.25)),
      ("BTC", "C", 11000.0, Some(10000.0), Some(0.32)),
      ("BTC", "C", 11000.0, None, Some(0.32)),
      ("ETH", "P", 9000.0, Some(10000.0), None))
      .toDF("underlying", "option_type", "strike", "index_price", "iv")
    val out = SmileFit.quadraticSmile(df).collect()
    assert(out.length == 1) // ETH P had no valid rows
    assert(out.head.getAs[Long]("n_fit") == 3L)
  }

  // ---- SpotCorr ----

  test("realized corr: exact linear relation gives corr 1, beta 2") {
    // daily returns: btc (+1%, +2%), eth (+2%, +4%) -> y = 2x with
    // nonzero variance (constant returns make Pearson undefined)
    val btc = Seq(100.0, 101.0, 103.02)
    val eth = Seq(100.0, 102.0, 106.08)
    val rows =
      btc.zipWithIndex.map { case (c, d) =>
        ("BTC", java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(d * 86400L + 10)), c) } ++
      eth.zipWithIndex.map { case (c, d) =>
        ("ETH", java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(d * 86400L + 10)), c) }
    val df = rows.toDF("symbol", "timestamp", "close")
    val r = SpotCorr.realizedCorr(df).head()
    assert(r.getAs[Long]("n_days") == 2L)
    assert(math.abs(r.getAs[Double]("corr_btc_eth") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_eth_on_btc") - 2.0) < 1e-4)
  }

  test("realized corr: last tick of day wins") {
    // BTC day-0 close must be the LAST tick (110): returns become
    // (+100%, +50%) matching ETH exactly -> beta 1; picking the
    // first tick (100) would give (+120%, +50%) and beta != 1
    val rows = Seq(
      ("BTC", 0L, 100.0), ("BTC", 500L, 110.0),
      ("BTC", 86400L + 5L, 220.0), ("BTC", 2 * 86400L + 7L, 330.0),
      ("ETH", 10L, 50.0), ("ETH", 86400L + 9L, 100.0),
      ("ETH", 2 * 86400L + 3L, 150.0))
      .map { case (s, ep, c) =>
        (s, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(ep)), c) }
    val r = SpotCorr.realizedCorr(rows.toDF("symbol", "timestamp", "close"))
      .head()
    assert(r.getAs[Long]("n_days") == 2L)
    assert(math.abs(r.getAs[Double]("beta_eth_on_btc") - 1.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("corr_btc_eth") - 1.0) < 1e-6)
  }

  // ---- rolling actives ----

  test("rolling active: WAU unions the trailing window, DAU does not") {
    def ts(day: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L + 3600))
    val rows = Seq(
      (1L, ts(0)), (2L, ts(0)),           // day 0: users 1,2
      (1L, ts(3)),                        // day 3: user 1
      (3L, ts(8)))                        // day 8: user 3 (day 0 aged out)
    val df = rows.toDF("user_id", "ts")
    val got = EventsAnalytics.rollingActive(df, windowDays = 7)
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))).toMap
    assert(got(0L) == ((2L, 2L)))
    assert(got(3L) == ((1L, 2L)))  // window [-3,3] holds users 1,2
    assert(got(8L) == ((1L, 2L)))  // window [2,8] holds users 1(day3),3
  }

  // ---- max pain ----

  test("max pain picks the payout-minimizing strike, ties to lowest") {
    def row(strike: Double, ot: String, amt: Double) =
      ("BTC", java.sql.Date.valueOf("2026-09-25"), strike, ot, amt)
    // C@100 oi 2, P@300 oi 1: payout(100)=200·1=200, payout(300)=200·2=400
    val df = Seq(row(100.0, "C", 2.0), row(300.0, "P", 1.0))
      .toDF("underlying", "expiry", "strike", "option_type", "amount")
    val r = graft.operators.MaxPain.maxPain(df).head()
    assert(r.getAs[Double]("max_pain_strike") == 100.0)
    assert(r.getAs[Double]("total_payout") == 200.0)
    assert(r.getAs[Long]("n_strikes") == 2L)
  }

  test("max pain: expiries are independent groups") {
    def row(d: String, strike: Double, ot: String, amt: Double) =
      ("BTC", java.sql.Date.valueOf(d), strike, ot, amt)
    val df = Seq(
      row("2026-09-25", 100.0, "C", 2.0), row("2026-09-25", 300.0, "P", 1.0),
      row("2026-10-30", 100.0, "C", 1.0), row("2026-10-30", 300.0, "P", 5.0))
      .toDF("underlying", "expiry", "strike", "option_type", "amount")
    val got = graft.operators.MaxPain.maxPain(df).collect()
      .map(r => r.getAs[String]("expiry_date") ->
        r.getAs[Double]("max_pain_strike")).toMap
    assert(got("2026-09-25") == 100.0)
    // oct: payout(100)=200*5=1000, payout(300)=200*1=200 -> 300 wins
    assert(got("2026-10-30") == 300.0)
  }

  // ---- SCD2 ----

  test("scd2 collapses runs into versioned validity intervals") {
    def ts(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))
    val df = Seq(
      (7L, 1L, "A", ts(100L)), (7L, 2L, "A", ts(200L)),
      (7L, 3L, "B", ts(300L)), (7L, 4L, "A", ts(400L)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventsAnalytics.scd2History(df).orderBy("version_n").collect()
    assert(got.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
    assert(got.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L, 1L))
    assert(got.map(_.getAs[Long]("valid_from_us")).toSeq ==
      Seq(100L, 300L, 400L))
    assert(got.map(r => Option(r.getAs[java.lang.Long]("valid_to_us")))
      .toSeq == Seq(Some(300L), Some(400L), None))
    assert(got.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
  }

  test("scd2 orders same-timestamp changes by event_id") {
    def ts(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))
    val df = Seq(
      (1L, 2L, "B", ts(100L)), (1L, 1L, "A", ts(100L)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventsAnalytics.scd2History(df).orderBy("version_n").collect()
    assert(got.map(_.getAs[String]("attr")).toSeq == Seq("A", "B"))
  }

  // ---- streaming top-k (batch semantics of the complete-mode agg) ----

  test("topVolumeStrikes orders by volume desc with key tie-breaks") {
    val df = Seq(
      ("BTC", 100.0, 5.0), ("BTC", 100.0, 5.0),   // vol 10
      ("ETH", 200.0, 10.0),                        // vol 10 (tie)
      ("BTC", 300.0, 1.0))
      .toDF("underlying", "strike", "amount")
    val got = graft.streaming.StreamingIngest.topVolumeStrikes(df, k = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // tie at 10: BTC < ETH
    assert(got.toSeq == Seq(("BTC", 100.0), ("ETH", 200.0)))
  }

  // ---- MAD outliers ----

  test("mad outliers: median/MAD exact, threshold flags the planted spike") {
    // values 1..9 plus one 1000 spike: med = 5.5-ish? n=10 -> rank
    // ceil(10/2)=5 -> med=5; deviations |x-5|: 0,1,1,2,2,3,3,4,4,995
    // -> mad rank 5 -> 2; threshold 5*2=10 -> only the spike exceeds
    val df = ((1 to 9).map(i => ("BTC", i.toDouble)) :+ (("BTC", 1000.0)))
      .toDF("underlying", "amount")
    val r = graft.operators.MadOutliers.madOutliers(df).head()
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 2.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(math.abs(r.getAs[Double]("outlier_frac") - 0.1) < 1e-12)
  }

  // ---- span corruption ----

  test("span corruption stats are deterministic and bounded") {
    val df = Seq((1L, ("w " * 200).trim), (2L, "a b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruptionStats(df)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 200L)
    assert(out(2L).getAs[Long]("n_words") == 3L)
    for ((_, r) <- out) {
      val (starts, masked, n) = (r.getAs[Long]("n_starts"),
        r.getAs[Long]("n_masked"), r.getAs[Long]("n_words"))
      assert(masked >= starts)          // every start masks >= itself
      assert(masked <= math.min(n, starts * 3)) // spans cap at 3 words
      assert(r.getAs[Double]("mask_frac") == masked.toDouble / n)
    }
    // determinism: same input -> identical stats
    val again = TextAnalysis.spanCorruptionStats(df)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_masked")).toMap
    assert(again(1L) == out(1L).getAs[Long]("n_masked"))
  }

  // ---- source overlap ----

  test("source overlap counts shared distinct shingles with jaccard") {
    val t1 = "alpha beta gamma delta epsilon zeta"  // 2 distinct 5-grams
    val t2 = "alpha beta gamma delta epsilon"       // 1 5-gram (shared)
    val df = Seq((1L, t1, "web"), (2L, t2, "books"), (3L, t2, "web"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextDedup.sourceOverlap(df).head()
    assert(r.getAs[String]("source_a") == "books")
    assert(r.getAs[String]("source_b") == "web")
    assert(r.getAs[Long]("shared_texts") == 1L)
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("jaccard") - 0.5) < 1e-12)
  }

  // ---- char coverage ----

  test("char coverage ranks by count then char, cumulative fraction") {
    val df = Seq((1L, "aab ba"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.charCoverage(df, topK = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // chars: a×3, b×3 -> tie broken by char: a rank 1, b rank 2
    assert(got.toSeq == Seq(("a", 3L, 1L, 0.5), ("b", 3L, 2L, 1.0)))
  }

  test("char coverage topK truncates the tail") {
    val df = Seq((1L, "abcdefg")).toDF("doc_id", "text")
    val got = TextAnalysis.charCoverage(df, topK = 3).collect()
    assert(got.length == 3)
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }
}
