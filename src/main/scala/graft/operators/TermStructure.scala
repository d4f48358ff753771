package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Parity

/** IV term-structure slope + ratio (SURVEY §2.4 A7) — the reference's
  * `features/term_structure.py:19-173`.
  *
  * The reference computes near and far series in two resamples and
  * inner-aligns; here both sides are conditional means in ONE pass,
  * and the inner alignment is a null filter on the same row. Slope and
  * ratio share the aggregation (the reference runs the whole pipeline
  * twice).
  */
object TermStructure {

  val DefaultNearDteMax = 30 // term_structure.py DEFAULT_NEAR_DTE_MAX
  val DefaultFarDteMin = 60 // term_structure.py DEFAULT_FAR_DTE_MIN

  /** A7: per bar, mean IV of near (dte<=nearMax) vs far (dte>=farMin)
    * contracts; bars lacking either side drop (inner align,
    * term_structure.py:92-98). */
  def termStructure(
      trades: DataFrame,
      intervalSec: Int = 900,
      nearDteMax: Int = DefaultNearDteMax,
      farDteMin: Int = DefaultFarDteMin): DataFrame = {
    val dte = DteBuckets.dteExpr(col("timestamp"), col("expiry"))
    trades
      .withColumn("dte", dte)
      .groupBy(ContractSelector.bucketS(col("timestamp"), intervalSec)
        .as("bucket_start"))
      .agg(
        Parity.davg(when(col("dte") <= nearDteMax, col("iv"))).as("near_iv"),
        Parity.davg(when(col("dte") >= farDteMin, col("iv"))).as("far_iv"))
      .filter(col("near_iv").isNotNull && col("far_iv").isNotNull)
      .withColumn("slope", col("near_iv") - col("far_iv"))
      .withColumn("ratio", Parity.ratio(col("near_iv"), col("far_iv")))
  }

  /** A34: Theil–Sen robust slope of the daily IV term curve per
    * underlying — the median of all pairwise slopes
    * (iv_b − iv_a)/(mid_b − mid_a) across DTE-bucket mean IVs, the
    * outlier-robust companion to A7's two-point slope (one polluted
    * bucket moves an OLS/two-point slope arbitrarily; the median
    * slope has a 29% breakdown point).
    *
    * Exact Theil–Sen is O(n²) in points — here n is the BUCKET COUNT
    * (≤ 6), so the pair fan-out is ≤ 15 per (underlying, day) BY
    * CONSTRUCTION: the corpus collapses to the (underlying, day,
    * bucket) mean-IV panel in one hash aggregate, and everything
    * after (self-join on (underlying, day), slope, per-group median
    * by row_number over ≤ 15 rows) is bounded by the calendar × 6,
    * never by tape length. The median is the exact element at rank
    * ceil(n/2) under slope order — tie-independent, identical
    * selection both engines. */
  def theilSenSlope(trades: DataFrame): DataFrame = {
    val ep = unix_timestamp(col("timestamp"))
    val dte = DteBuckets.dteExpr(col("timestamp"), col("expiry"))
    val mid = DteBuckets.buckets.foldLeft(lit(null).cast("double")) {
      case (acc, (lo, hi)) =>
        when(col("dte").between(lo, hi), lit((lo + hi) / 2.0))
          .otherwise(acc)
    }
    val m = trades
      .filter(col("iv").isNotNull)
      .withColumn("_ep", ep)
      .withColumn("day", expr("_ep div 86400L"))
      .withColumn("dte", dte)
      .withColumn("mid", mid)
      .filter(col("mid").isNotNull)
      .groupBy(col("underlying"), col("day"), col("mid"))
      .agg(Parity.davg(col("iv")).as("miv"))
    val a = m.select(col("underlying"), col("day"),
      col("mid").as("_ma"), col("miv").as("_va"))
    val b = m.select(col("underlying"), col("day"),
      col("mid").as("_mb"), col("miv").as("_vb"))
    val pairs = a.join(b, Seq("underlying", "day"))
      .filter(col("_ma") < col("_mb"))
      .withColumn("slope",
        (col("_vb") - col("_va")) / (col("_mb") - col("_ma")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("underlying"), col("day")).orderBy(col("slope"))
    pairs
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("underlying"), col("day"))))
      .filter(col("_rn") === expr("(_n + 1) div 2"))
      .select(col("underlying"), col("day"),
        col("_n").as("n_pairs"), col("slope").as("ts_slope"))
  }
}
