package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{GraftColumns, GraftMath}
import graft.operators.Greeks

/** Numeric sanity mirroring the reference's test_greeks.py:42-129. */
class GreeksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("erf matches reference values within A&S 7.1.26 tolerance") {
    // (x, erf(x)) ground truth
    val cases = Seq(
      0.0 -> 0.0, 0.5 -> 0.5204998778, 1.0 -> 0.8427007929,
      2.0 -> 0.9953222650, -1.0 -> -0.8427007929, 3.0 -> 0.9999779095)
    cases.foreach { case (x, expected) =>
      assert(math.abs(GraftMath.erf(x) - expected) < 1.6e-7,
        s"erf($x)=${GraftMath.erf(x)} vs $expected")
    }
    assert(math.abs(GraftMath.normCdf(0.0) - 0.5) < 1e-9)
    assert(math.abs(GraftMath.normCdf(1.96) - 0.975) < 1e-3)
  }

  test("Erf expression evaluates via codegen identically to GraftMath") {
    import spark.implicits._
    val xs = Seq(-3.0, -1.5, -0.1, 0.0, 0.7, 2.5)
    val out = xs.toDF("x")
      .select(col("x"), GraftColumns.erf(col("x")).as("e"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach(x => assert(out(x) == GraftMath.erf(x), s"x=$x"))
  }

  private def greeksFor(
      optionType: String, strike: Double, spot: Double, iv: Double,
      price: Double = 0.05, dteDays: Int = 30) = {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val expiry = new Date(t0.getTime + dteDays * 86400000L)
    val df = Seq((optionType, strike, spot, iv, price, t0, expiry))
      .toDF("option_type", "strike", "spot_price", "iv", "price",
        "timestamp", "expiry")
    Greeks.withGreeks(df).collect().head
  }

  test("ATM call delta in [0.5, 0.6]; put in [-0.5, -0.4]") {
    val c = greeksFor("C", 42000, 42000, 0.6)
    assert(c.getAs[Double]("bs_delta") > 0.5 &&
      c.getAs[Double]("bs_delta") < 0.6)
    val p = greeksFor("P", 42000, 42000, 0.6)
    assert(p.getAs[Double]("bs_delta") > -0.5 &&
      p.getAs[Double]("bs_delta") < -0.4)
  }

  test("gamma and vega positive, theta negative for vanilla options") {
    for (ot <- Seq("C", "P")) {
      val g = greeksFor(ot, 42000, 40000, 0.7)
      assert(g.getAs[Double]("gamma") > 0)
      assert(g.getAs[Double]("vega") > 0)
      assert(g.getAs[Double]("theta") < 0)
    }
  }

  test("premium-adjusted delta < bs delta for calls (inverse options)") {
    val g = greeksFor("C", 40000, 42000, 0.6, price = 0.08)
    assert(g.getAs[Double]("adjusted_delta") < g.getAs[Double]("bs_delta"))
    assert(math.abs(g.getAs[Double]("adjusted_delta")
      - (g.getAs[Double]("bs_delta") - 0.08 / 42000)) < 1e-12)
  }

  test("F8 mask: expired or zero-IV rows get null Greeks") {
    val expired = greeksFor("C", 42000, 42000, 0.6, dteDays = 0)
    assert(expired.isNullAt(expired.fieldIndex("bs_delta")))
    val zeroIv = greeksFor("C", 42000, 42000, 0.0)
    assert(zeroIv.isNullAt(zeroIv.fieldIndex("bs_delta")))
    assert(zeroIv.isNullAt(zeroIv.fieldIndex("gamma")))
    assert(zeroIv.isNullAt(zeroIv.fieldIndex("theta")))
  }

  test("deep ITM call delta near 1, deep OTM near 0") {
    assert(greeksFor("C", 20000, 42000, 0.5).getAs[Double]("bs_delta") > 0.95)
    assert(greeksFor("C", 90000, 42000, 0.5).getAs[Double]("bs_delta") < 0.05)
  }

  test("A14 portfolio greeks weight by position") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val expiry = Date.valueOf("2024-02-01")
    val df = Seq(
      ("C", 42000.0, 42000.0, 0.6, 0.05, t0, expiry, 2.0),
      ("P", 42000.0, 42000.0, 0.6, 0.05, t0, expiry, 1.0))
      .toDF("option_type", "strike", "spot_price", "iv", "price",
        "timestamp", "expiry", "amount")
    val g = Greeks.withGreeks(df)
    val port = Greeks.portfolioGreeks(g).collect().head
    val rows = g.collect().map(r =>
      r.getAs[String]("option_type") ->
        (r.getAs[Double]("adjusted_delta"), r.getAs[Double]("amount"))).toMap
    val expected = rows("C")._1 * 2.0 + rows("P")._1 * 1.0
    assert(math.abs(port.getAs[Double]("net_delta") - expected) < 1e-6)
    assert(port.getAs[Double]("spot_median") == 42000.0)
  }

  test("RN density: positive under flat vol and integrates to ~1") {
    import spark.implicits._
    import graft.operators.RnDensity
    val t0 = Timestamp.valueOf("2024-01-10 12:00:00")
    val expiry = Date.valueOf("2024-04-10") // ~0.25y out
    // one quote per strike, flat 50-vol ladder covering the terminal
    // distribution of S=50k
    val rows = (10 to 150).map { i =>
      (s"t$i", t0, "BTC", expiry, i * 1000.0, 0.5, 50000.0)
    }
    val df = rows.toDF("trade_id", "timestamp", "underlying", "expiry",
      "strike", "iv", "spot_price")
    val out = RnDensity.density(df).collect()
    assert(out.length == 139) // interior strikes only
    assert(out.forall(_.getAs[Boolean]("convex_ok")),
      "flat-vol BS surface must be butterfly-arbitrage-free")
    // ∫ q(K) dK = 1 over full coverage (trapezoid on the 1k grid)
    val mass = out.map(r => r.getAs[Double]("density") * 1000.0).sum
    assert(math.abs(mass - 1.0) < 0.02, s"density mass $mass")
  }

  test("bsCall is monotone in sigma and respects no-arbitrage bounds") {
    import graft.functions.ImpliedVol
    val (s, k, t, r) = (50000.0, 55000.0, 0.25, 0.02)
    val sigmas = Seq(0.05, 0.2, 0.5, 1.0, 2.0, 4.0)
    val prices = sigmas.map(ImpliedVol.bsCall(s, k, t, r, _))
    assert(prices.zip(prices.tail).forall { case (a, b) => a < b },
      s"not monotone: $prices")
    // C in (max(S - K e^{-rT}, 0), S)
    val intrinsic = math.max(s - k * math.exp(-r * t), 0.0)
    prices.foreach(p => assert(p > intrinsic && p < s))
  }

  test("bisection recovers the pricing sigma across the surface") {
    import graft.functions.ImpliedVol
    val r = Greeks.DefaultRiskFreeRate
    for {
      s <- Seq(30000.0, 50000.0)
      mny <- Seq(0.7, 0.95, 1.0, 1.1, 1.6)
      t <- Seq(0.02, 0.25, 1.5)
      sigma <- Seq(0.08, 0.45, 1.2, 3.0)
    } {
      val k = s * mny
      val px = ImpliedVol.bsCall(s, k, t, r, sigma)
      val solved = ImpliedVol.bisect(px, s, k, t, r)
      // price-space residual is the guarantee (sigma-space error can
      // be large where vega ~ 0, e.g. deep OTM short-dated)
      val resid = math.abs(ImpliedVol.bsCall(s, k, t, r, solved) - px)
      assert(resid < 1e-7, s"resid $resid at s=$s k=$k t=$t sig=$sigma")
    }
  }

  test("ImpliedVolBisect expression matches the kernel through codegen") {
    import spark.implicits._
    import graft.functions.{ImpliedVol, ImpliedVolColumns}
    val r = Greeks.DefaultRiskFreeRate
    val rows = Seq(
      (45000.0, 44000.0, 0.3, 0.55),
      (45000.0, 60000.0, 0.8, 0.95),
      (45000.0, 45000.0, 0.05, 0.35))
    val df = rows.toDF("spot", "strike", "t", "sigma")
      .withColumn("px", ImpliedVolColumns.bsCall(
        col("spot"), col("strike"), col("t"), col("sigma"), r))
      .withColumn("iv", ImpliedVolColumns.impliedVol(
        col("px"), col("spot"), col("strike"), col("t"), r))
    val got = df.select("spot", "strike", "t", "px", "iv").collect()
    got.zip(rows).foreach { case (row, (s, k, t, sigma)) =>
      val px = ImpliedVol.bsCall(s, k, t, r, sigma)
      assert(row.getDouble(3) == px, "expression px != kernel px")
      assert(row.getDouble(4) == ImpliedVol.bisect(px, s, k, t, r),
        "expression iv != kernel iv")
    }
    // null propagation
    val n = Seq((Option.empty[Double], 1.0))
      .toDF("spot", "strike")
      .select(ImpliedVolColumns.bsCall(col("spot"), col("strike"),
        lit(0.5), lit(0.5), r).as("px"))
      .collect().head
    assert(n.isNullAt(0))
  }

}
