package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Instruments

/** ScalaCheck: `parse ∘ format = id` over the full valid domain, plus
  * rejection properties (SURVEY §5 contract-test analog). */
object InstrumentsProps extends Properties("Instruments") {

  private val genDate: Gen[LocalDate] = for {
    y <- Gen.choose(2000, 2099)
    m <- Gen.choose(1, 12)
    maxD = java.time.YearMonth.of(y, m).lengthOfMonth()
    d <- Gen.choose(1, maxD)
  } yield LocalDate.of(y, m, d)

  private val genUnderlying = Gen.oneOf("BTC", "ETH")
  private val genOptionType = Gen.oneOf("C", "P")
  private val genStrike = Gen.choose(1L, 10000000L).map(_.toDouble)

  property("format-parse roundtrip") =
    forAll(genUnderlying, genDate, genStrike, genOptionType) { (u, d, k, t) =>
      val name = Instruments.format(u, d, k, t)
      Instruments.parse(name) match {
        case Some(p) =>
          Prop(p.underlying == u && p.expiry == d &&
            p.strike == k && p.optionType == t &&
            p.instrumentName == name) :| s"parsed=$p"
        case None => Prop.falsified :| s"failed to parse $name"
      }
    }

  property("formatted names validate") =
    forAll(genUnderlying, genDate, genStrike, genOptionType) { (u, d, k, t) =>
      Instruments.isValid(Instruments.format(u, d, k, t))
    }

  property("junk strings rejected") =
    forAll(Gen.alphaNumStr) { s =>
      // alphanumeric strings never contain the dashes the format requires
      Instruments.parse(s).isEmpty
    }

  property("non-BTC/ETH underlying rejected") =
    forAll(Gen.oneOf("XRP", "SOL", "btc", ""), genDate, genStrike, genOptionType) {
      (u, d, k, t) =>
        val mon = Instruments.months(d.getMonthValue - 1)
        val name =
          f"$u-${d.getDayOfMonth}$mon${d.getYear % 100}%02d-${k.toLong}-$t"
        Instruments.parse(name).isEmpty
    }
}
