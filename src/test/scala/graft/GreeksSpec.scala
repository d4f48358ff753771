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
}
