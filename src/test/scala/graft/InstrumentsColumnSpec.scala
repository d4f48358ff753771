package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.Instruments

/** The columnar parser must agree with the pure-Scala parser on every
  * row — valid and invalid alike. */
class InstrumentsColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val samples = Seq(
    "BTC-27DEC24-100000-C", "ETH-28MAR25-5000-P", "BTC-7MAR25-85000-P",
    "ETH-1JAN00-1-C", "BTC-31DEC99-999999-P",
    // invalid:
    "XRP-27DEC24-100-C", "BTC-99ZZZ99-100-C", "BTC-27DEC24-100-X",
    "btc-27dec24-100-c", "BTC-27DEC24--C", "", "garbage",
    "BTC-123DEC24-100-C", "BTC-27DE24-100-C")

  test("columnar parse == pure-Scala parse on valid and invalid names") {
    import spark.implicits._
    val n = col("name")
    val rows = samples.toDF("name").select(
      n,
      Instruments.underlyingCol(n).as("u"),
      Instruments.expiryCol(n).cast("string").as("e"),
      Instruments.strikeCol(n).as("k"),
      Instruments.optionTypeCol(n).as("t"),
      Instruments.isValidCol(n).as("v"))
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), r.getBoolean(5)))
      .toMap

    samples.foreach { s =>
      val expected = Instruments.parse(s)
      val (u, e, k, t, v) = rows(s)
      assert(v == expected.isDefined, s"validity mismatch for '$s'")
      expected match {
        case Some(p) =>
          assert(u.contains(p.underlying), s"underlying of '$s'")
          assert(e.contains(p.expiry.toString), s"expiry of '$s'")
          assert(k.contains(p.strike), s"strike of '$s'")
          assert(t.contains(p.optionType), s"optionType of '$s'")
        case None => // columns may be partially non-null (e.g. regex
        // matches but month bogus) — validity flag is the contract.
      }
    }
  }

  test("formatCol round-trips through the columnar parser") {
    import spark.implicits._
    val df = Seq(
      ("BTC", "2024-12-27", 100000.0, "C"),
      ("ETH", "2025-03-07", 5000.0, "P"),
      ("BTC", "2099-01-01", 1.0, "P"))
      .toDF("u", "e", "k", "t")
      .select(Instruments.formatCol(
        col("u"), col("e").cast("date"), col("k"), col("t")).as("name"))
    val names = df.collect().map(_.getString(0))
    assert(names.sameElements(
      Array("BTC-27DEC24-100000-C", "ETH-7MAR25-5000-P", "BTC-1JAN99-1-P")))
    names.foreach { nm =>
      assert(Instruments.parse(nm).isDefined, s"'$nm' should parse")
    }
  }

  test("pure format matches reference examples") {
    assert(Instruments.format("BTC", LocalDate.of(2024, 12, 27), 100000.0, "C")
      == "BTC-27DEC24-100000-C")
    assert(Instruments.format("ETH", LocalDate.of(2025, 3, 7), 5000.0, "P")
      == "ETH-7MAR25-5000-P")
    intercept[IllegalArgumentException] {
      Instruments.format("XRP", LocalDate.of(2024, 12, 27), 100.0, "C")
    }
    intercept[IllegalArgumentException] {
      Instruments.format("BTC", LocalDate.of(2024, 12, 27), 100.0, "Z")
    }
  }
}
