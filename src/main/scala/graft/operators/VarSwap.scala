package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-free implied variance per (underlying, expiry) — the
  * VIX-style strike-ladder integral 2/T·Σ ΔK/K²·Q(K) − (F/K0−1)²/T
  * (CBOE VIX white paper construction, r=0), computed from the
  * options tape the reference stores (mark_price / strike /
  * option_type, reference `schema/clickhouse/options_trades.yaml:
  * 120-185`) but never integrates.
  *
  * Distributed shape at 100 TB:
  *   1. tape → quote ladder: ONE corpus-sized hash aggregate keyed
  *      (underlying, expiry, strike, option_type) with map-side
  *      partials (exact DECIMAL price sums);
  *   2. C/P combine: a second hash aggregate on the LADDER
  *      (underlying, expiry, strike) — ladder-sized, never the tape;
  *   3. forward + K0 per (underlying, expiry): aggregates over
  *      ladder-width groups (min-of-struct, no sort);
  *   4. ΔK: lead/lag windows partitioned by (underlying, expiry) over
  *      ladder-width partitions — thousands of independent keys, no
  *      global sort;
  *   5. final integral: hash aggregate over the ladder.
  * The ladder is materialized once (it feeds both the forward
  * selection and the join-back) so the tape aggregate runs exactly
  * once.
  *
  * Exactness/parity: per-strike quotes are davg (exact decimal sum /
  * count, one exactly-rounded division); the forward argmin compares
  * exact doubles with a strike tie-break; each ΔK/K²·Q term is a
  * chain of individually-rounded IEEE ops spelled identically in
  * both engines, quantized at 6 dp after a 1e6 upscale (≈9
  * significant digits) so the decimal sum is order-free; the closing
  * algebra is shared verbatim via [[varExpr]]. */
object VarSwap {

  /** Final variance algebra over (t_years, contrib, fwd, k0) —
    * shared verbatim with the DuckDB oracle. */
  val varExpr: String =
    "2.0 / t_years * contrib - (fwd / k0 - 1.0) * (fwd / k0 - 1.0) / t_years"

  def impliedVariance(trades: DataFrame): DataFrame = {
    import graft.util.Parity.davg

    // 1. tape -> per-(u, expiry, strike, type) quote ladder.
    val ladder0 = trades
      .filter(col("mark_price") > 0 && col("strike") > 0)
      .groupBy(col("underlying"), col("expiry"), col("strike"),
        col("option_type"))
      .agg(davg(col("mark_price")).as("q"),
        min(to_date(col("timestamp"))).as("d0"))

    // 2. C/P side-by-side per strike (one row per type -> max picks it).
    val ladder = graft.util.Caches.materialize(
      ladder0
        .groupBy(col("underlying"), col("expiry"), col("strike"))
        .agg(
          max(when(col("option_type") === "C", col("q"))).as("qc"),
          max(when(col("option_type") === "P", col("q"))).as("qp"),
          min(col("d0")).as("d0")))

    // 3. forward from the min-|C-P| strike; K0 = last strike <= F
    //    (min strike fallback keeps arbitrage-free-ness assumptions out
    //    of the synthetic tape's way).
    val fwd = ladder
      .filter(col("qc").isNotNull && col("qp").isNotNull)
      .groupBy(col("underlying"), col("expiry"))
      .agg(min(struct(abs(col("qc") - col("qp")).as("gap"),
        col("strike").as("k"), col("qc").as("qc"), col("qp").as("qp")))
        .as("m"))
      .select(col("underlying"), col("expiry"),
        (col("m.k") + (col("m.qc") - col("m.qp"))).as("fwd"))
    val k0 = ladder.join(fwd, Seq("underlying", "expiry"))
      .groupBy(col("underlying"), col("expiry"))
      .agg(
        coalesce(max(when(col("strike") <= col("fwd"), col("strike"))),
          min(col("strike"))).as("k0"),
        max(col("fwd")).as("fwd"),
        min(col("d0")).as("min_d"))

    // 4. OTM quote selection + ladder spacing.
    val sel = ladder.join(k0, Seq("underlying", "expiry"))
      .withColumn("q_sel",
        when(col("strike") < col("k0"), col("qp"))
          .when(col("strike") > col("k0"), col("qc"))
          .otherwise(coalesce((col("qc") + col("qp")) / 2.0,
            col("qc"), col("qp"))))
      .filter(col("q_sel").isNotNull)
    val w = Window.partitionBy(col("underlying"), col("expiry"))
      .orderBy(col("strike"))
    val spaced = sel
      .withColumn("k_prev", lag(col("strike"), 1).over(w))
      .withColumn("k_next", lead(col("strike"), 1).over(w))
      .withColumn("dk",
        when(col("k_prev").isNull, col("k_next") - col("strike"))
          .when(col("k_next").isNull, col("strike") - col("k_prev"))
          .otherwise((col("k_next") - col("k_prev")) / 2.0))
      .filter(col("dk").isNotNull) // single-strike ladder has no spacing

    // 5. quantized term sum + shared closing algebra. The 1e6 upscale
    //    puts ~1e-4-magnitude terms on dsum's 6-dp decimal grid with
    //    ~9 significant digits; both engines spell the identical
    //    left-associated IEEE product chain.
    val term = col("dk") / (col("strike") * col("strike")) *
      col("q_sel") * lit(1e6)
    spaced
      .groupBy(col("underlying"), col("expiry"))
      .agg(
        count(lit(1)).as("n_strikes"),
        (graft.util.Parity.dsum(term) / 1e6).as("contrib"),
        max(col("fwd")).as("fwd"),
        max(col("k0")).as("k0"),
        (datediff(max(col("expiry")), max(col("min_d"))).cast("double")
          / 365.0).as("t_years"))
      .withColumn("var_swap", expr(varExpr))
      .withColumn("vix_style",
        when(col("var_swap") >= 0, sqrt(col("var_swap")) * 100.0))
      .select(col("underlying"),
        date_format(col("expiry"), "yyyy-MM-dd").as("expiry_date"),
        col("n_strikes"), col("t_years"), col("fwd"), col("k0"),
        col("contrib"), col("var_swap"), col("vix_style"))
  }
}
