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
}
