package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes.createDecimalType

/** Max-pain strike per (underlying, expiry) — the settlement price
  * minimizing total option-holder payout, the classic expiry
  * positioning read on an options tape (the reference stores the
  * strike/type/amount columns it needs but never computes it;
  * reference `schema/clickhouse/options_trades.yaml:160-185` for the
  * derived columns).
  *
  * Payout(S) = Σ_calls oi·max(0, S−K) + Σ_puts oi·max(0, K−S),
  * candidates S = the expiry's own strikes, oi proxied by summed
  * traded amount.
  *
  * Distributed shape: the tape collapses to the (underlying, expiry,
  * strike, type) open-interest table first — one corpus-sized hash
  * aggregate; the candidate×strike pairing then happens on that
  * BOUNDED table (strike ladders are a few hundred rows per expiry at
  * worst), an equi-join on (underlying, expiry) whose fan-out is the
  * ladder width, never the tape. The argmin window partitions by
  * (underlying, expiry) over ladder-sized groups.
  *
  * Exactness: oi is an exact DECIMAL sum; strike differences are
  * exact integers (the synthetic ladder is 250-spaced); payout is a
  * pinned-scale DECIMAL product-sum — both engines order candidates
  * by the identical exact decimal, and the output payout renders
  * through a 2-dp gate whose int value fits 2^53. */
object MaxPain {

  def maxPain(trades: DataFrame): DataFrame = {
    val d6 = createDecimalType(20, 6)
    val dDiff = createDecimalType(6, 0)
    val oi = trades
      .filter(col("strike") > 0)
      .groupBy(col("underlying"), col("expiry"), col("strike"),
        col("option_type"))
      .agg(sum(col("amount").cast(createDecimalType(28, 6))).cast(d6)
        .as("oi"))
    val oiC = graft.util.Caches.materialize(oi)
    val cands = oiC
      .select(col("underlying"), col("expiry"), col("strike").as("s"))
      .distinct()
    val pay =
      when(col("option_type") === "C" && col("s") > col("strike"),
        col("oi") * (col("s") - col("strike")).cast(dDiff))
        .when(col("option_type") === "P" && col("s") < col("strike"),
          col("oi") * (col("strike") - col("s")).cast(dDiff))
        .otherwise(lit(0).cast(createDecimalType(27, 6)))
    val payout = oiC
      .join(cands, Seq("underlying", "expiry"))
      .groupBy(col("underlying"), col("expiry"), col("s"))
      .agg(sum(pay).as("payout"))
    val w = Window.partitionBy(col("underlying"), col("expiry"))
    val ranked = payout
      .withColumn("_rn",
        row_number().over(w.orderBy(col("payout"), col("s"))))
      .withColumn("n_strikes", count(lit(1)).over(w))
    ranked
      .filter(col("_rn") === 1)
      .select(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"),
        col("s").as("max_pain_strike"),
        col("payout").cast(createDecimalType(22, 2)).cast("double")
          .as("total_payout"),
        col("n_strikes"))
  }
}
