package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ImpliedVolColumns
import graft.util.Parity

/** Breeden-Litzenberger risk-neutral density extraction (beyond the
  * reference): q(K) = e^{rT} ∂²C/∂K², estimated from butterfly
  * (second divided-difference) spreads of call prices across each
  * (underlying, expiry) strike ladder — the standard read of what
  * the options market implies about the terminal-price distribution,
  * plus the convexity audit (a negative density IS a butterfly
  * arbitrage).
  *
  * Surface snapshot: last quote per (underlying, expiry, strike) and
  * last spot per underlying (row_number over (ep DESC, trade_id
  * DESC) — deterministic, engine-independent), valued at a common
  * reference time (the panel's max epoch). Calls are priced at the
  * quoted IVs by the codegen'd [[graft.functions.BsCallPrice]]
  * kernel and grid-quantized before differencing, so the divided
  * differences are exact arithmetic on identical doubles in any
  * engine.
  *
  * Scale shape: two row_number windows partitioned by fine keys, one
  * global max (one-row broadcast), one ladder window per
  * (underlying, expiry) — ladders are strikes-sized (hundreds), so
  * no partition ever exceeds an option chain. No all-pairs, no
  * global sort.
  */
object RnDensity {

  /** `enriched`: trade-level frame with timestamp, trade_id,
    * underlying, expiry, strike, iv, spot_price. */
  def density(enriched: DataFrame,
      r: Double = Greeks.DefaultRiskFreeRate): DataFrame = {
    val v = enriched
      .filter(col("iv") > 0 && col("spot_price") > 0 && col("strike") > 0)
      .withColumn("ep", Parity.epochS(col("timestamp")))
    // ONE pass over the tape: the per-(underlying, expiry, strike)
    // last quote (contract-count-sized — safe to cache at any scale).
    // Everything downstream — valuation time, spot snapshot, strike
    // ladders — derives from this table, so the fact source is
    // scanned once, not once per CTE branch. The globally-last trade
    // per underlying survives this reduction (it is the last quote
    // of its own contract), so the spot snapshot is unchanged.
    val wLast = Window.partitionBy(col("underlying"), col("expiry"),
      col("strike")).orderBy(col("ep").desc, col("trade_id").desc)
    val lastFull = graft.util.Caches.materialize(v
      .withColumn("rn", row_number().over(wLast)).filter(col("rn") === 1)
      .select(col("underlying"), col("expiry"), col("strike"), col("iv"),
        col("ep"), col("trade_id"), col("spot_price")))
    val tref = lastFull.agg(max(col("ep")).as("tref"))
    val lastQ = lastFull
      .select(col("underlying"), col("expiry"), col("strike"), col("iv"))
    // last spot per underlying WITHOUT a per-key global sort (only 2
    // underlyings — a row_number window over the raw tape would
    // funnel everything into 2 sort tasks): hash-aggregate the max
    // epoch, join back to the bounded tie set, then break ties
    val mx = lastFull.groupBy(col("underlying"))
      .agg(max(col("ep")).as("mep"))
    val wSpot = Window.partitionBy(col("underlying"))
      .orderBy(col("trade_id").desc)
    val spotQ = lastFull.as("lf")
      .join(broadcast(mx.as("mx")),
        col("lf.underlying") === col("mx.underlying")
          && col("lf.ep") === col("mx.mep"))
      .select(col("lf.underlying").as("underlying"), col("lf.trade_id"),
        col("lf.spot_price"))
      .withColumn("rn", row_number().over(wSpot)).filter(col("rn") === 1)
      .select(col("underlying"), col("spot_price").as("spot"))
    val base = lastQ
      .join(broadcast(spotQ), "underlying")
      .crossJoin(broadcast(tref))
      .withColumn("T",
        (unix_timestamp(col("expiry").cast("timestamp")) - col("tref"))
          / lit(Greeks.SecondsPerYear))
      .filter(col("T") > 0)
    val priced = base
      .withColumn("px", Parity.roundTo(ImpliedVolColumns.bsCall(
        col("spot"), col("strike"), col("T"), col("iv"), r), 6))
      .withColumn("disc", Parity.roundTo(exp(lit(r) * col("T")), 12))
    val lad = Window.partitionBy(col("underlying"), col("expiry"))
      .orderBy(col("strike"))
    val k = col("strike")
    val grid = priced
      .withColumn("k_prev", lag(k, 1).over(lad))
      .withColumn("k_next", lead(k, 1).over(lad))
      .withColumn("px_prev", lag(col("px"), 1).over(lad))
      .withColumn("px_next", lead(col("px"), 1).over(lad))
      .filter(col("k_prev").isNotNull && col("k_next").isNotNull)
      .withColumn("density",
        col("disc") * lit(2.0)
          * ((col("px_next") - col("px")) / (col("k_next") - k)
            - (col("px") - col("px_prev")) / (k - col("k_prev")))
          / (col("k_next") - col("k_prev")))
    grid.select(
      col("underlying"),
      date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"),
      k,
      Parity.roundTo(col("iv"), 9).as("iv_last"),
      col("px").as("call_px"),
      col("density"),
      (col("density") >= 0.0).as("convex_ok"))
  }
}
