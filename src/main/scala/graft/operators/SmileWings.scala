package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Smile-wing quotes per (underlying, expiry) — the 25-delta-style
  * risk-reversal / butterfly read, stated in moneyness space (the
  * reference's moneyness bands, `features/moneyness.py`, stop at the
  * banded averages; the wing *quotes* and their RR/BF combinations
  * are the standard desk summary built from the same columns).
  *
  * Wing selection is nearest-to-target moneyness (strike/index):
  * call wing → m*=1.05 among calls, put wing → m*=0.95 among puts,
  * ATM → m*=1.0 among all quotes; RR = σ_callwing − σ_putwing,
  * BF = (σ_callwing + σ_putwing)/2 − σ_ATM.
  *
  * Distributed shape: ONE corpus-sized hash aggregate keyed
  * (underlying, expiry) — each wing is a conditional `min(struct(
  * dist, trade_id, iv))` (lexicographic struct min ≡ deterministic
  * argmin with trade-id tie-break), so map-side partials do the
  * selection and no window/sort ever sees the tape. Exactness:
  * moneyness is one exactly-rounded IEEE division, dist an exact
  * subtraction; the argmin compares exact doubles. */
object SmileWings {

  private def wing(cond: org.apache.spark.sql.Column, target: Double) = {
    val dist = abs(col("strike") / col("index_price") - lit(target))
    min(when(cond,
      struct(dist.as("dist"), col("trade_id").as("tid"), col("iv").as("iv"))))
  }

  def wingQuotes(trades: DataFrame): DataFrame = {
    val q = trades.filter(col("iv").isNotNull && col("index_price").isNotNull
      && col("index_price") > 0 && col("strike") > 0)
    q.groupBy(col("underlying"), col("expiry"))
      .agg(
        count(lit(1)).as("n_quotes"),
        wing(col("option_type") === "C", 1.05).as("cw"),
        wing(col("option_type") === "P", 0.95).as("pw"),
        wing(lit(true), 1.0).as("aw"))
      .select(
        col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"),
        col("n_quotes"),
        col("cw.iv").as("iv_call_wing"),
        col("pw.iv").as("iv_put_wing"),
        col("aw.iv").as("iv_atm"),
        (col("cw.iv") - col("pw.iv")).as("risk_reversal"),
        ((col("cw.iv") + col("pw.iv")) / 2.0 - col("aw.iv")).as("butterfly"))
  }
}
