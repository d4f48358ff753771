package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Parity

/** Put-Call Ratio by expiry tenor (SURVEY §2.4 A6) — the reference's
  * `features/pcr.py:26-180`.
  *
  * The reference splits puts/calls, resamples each side, outer-aligns
  * and divides (pandas); here it is ONE conditional aggregation per
  * (bar, tenor bucket) — single scan, single shuffle.
  *
  * Output is sparse long format: only (bar, bucket) pairs that traded.
  * (The reference's pandas resample emits dense per-bucket time spines
  * with NaN rows; a dense variant is a join with a `sequence()` spine
  * at the caller's edge.) Within a traded pair the semantics match:
  * missing side → 0 (fillna), zero calls → null PCR (replace(0, nan)).
  */
object Pcr {

  /** LEAPS excluded per config.get_pcr_dte_buckets (pcr.py:16-23). */
  val pcrBuckets: Seq[(Int, Int)] = DteBuckets.buckets.filter(_._2 <= 90)

  /** A6: `method` = "volume" (sum of amount) or "count" (trade count),
    * pcr.py:105-117. */
  def pcrByTenor(
      trades: DataFrame,
      intervalSec: Int = 900,
      method: String = "volume"): DataFrame = {
    require(method == "volume" || method == "count",
      s"method must be volume|count, got $method")
    val dte = DteBuckets.dteExpr(col("timestamp"), col("expiry"))
    val bucket = pcrBuckets.foldLeft(lit(null).cast("string")) {
      case (acc, (lo, hi)) =>
        when(col("dte").between(lo, hi), s"pcr_${lo}_${hi}d").otherwise(acc)
    }
    def side(t: String) = {
      val in = when(col("option_type") === t,
        if (method == "volume") col("amount") else lit(1.0))
      coalesce(Parity.dsum(in), lit(0.0))
    }
    trades
      .withColumn("dte", dte)
      .withColumn("dte_bucket", bucket)
      .filter(col("dte_bucket").isNotNull)
      .groupBy(
        ContractSelector.bucketS(col("timestamp"), intervalSec)
          .as("bucket_start"),
        col("dte_bucket"))
      .agg(side("P").as("put_volume"), side("C").as("call_volume"))
      .withColumn("pcr", Parity.ratio(col("put_volume"), col("call_volume")))
  }
}
