package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IV surface on the (DTE-bucket × moneyness-bucket) grid, with
  * nearest-neighbor/midpoint fill along the moneyness axis — the
  * 2-D product the reference's two 1-D projections (moneyness bands,
  * `features/moneyness.py`; DTE buckets, `features/dte_buckets.py`)
  * imply but never cross. Missing interior cells fill with the
  * midpoint of their moneyness neighbors, edge cells extend the
  * nearest wing, observed cells pass through.
  *
  * Shape: ONE corpus-sized hash aggregate to the grid (≤ |tenors| ×
  * 5 cells per underlying); densification is an explode of the
  * observed (underlying, tenor) pairs over the literal bucket list
  * (no cross join — stays CartesianProduct-free) plus one
  * broadcast-sized equi-join back; the fill windows run over 5-row
  * partitions. Exactness: cell means are davg (exact decimal sum /
  * count); the midpoint fill is one exactly-rounded IEEE op. */
object SurfaceGrid {

  val MBuckets: Seq[String] = Seq(
    "deep_otm_put", "otm_put", "atm", "otm_call", "deep_otm_call")

  def ivSurface(enriched: DataFrame): DataFrame = {
    val dte = datediff(col("expiry"), to_date(col("timestamp")))
    val obs = enriched
      .filter(col("moneyness") > 0 && col("iv") > 0)
      .withColumn("dte_bucket", DteBuckets.bucketExpr(dte))
      .filter(col("dte_bucket").isNotNull)
      .withColumn("m_bucket",
        SpotProvider.moneynessBucket(col("moneyness")))
      .groupBy(col("underlying"), col("dte_bucket"), col("m_bucket"))
      .agg(graft.util.Parity.davg(col("iv")).as("iv_obs"),
        count(lit(1)).as("n_obs"))
    val dense = obs.select(col("underlying"), col("dte_bucket")).distinct()
      .withColumn("m_bucket",
        explode(array(MBuckets.map(lit(_)): _*)))
    val ord = MBuckets.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (b, i)) =>
        when(col("m_bucket") === b, i).otherwise(acc)
      }
    val w = Window.partitionBy(col("underlying"), col("dte_bucket"))
      .orderBy(col("m_ord"))
    val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = w.rowsBetween(1, Window.unboundedFollowing)
    dense
      .join(obs, Seq("underlying", "dte_bucket", "m_bucket"), "left")
      .withColumn("m_ord", ord)
      .withColumn("prev_iv", last(col("iv_obs"), ignoreNulls = true)
        .over(prevW))
      .withColumn("next_iv", first(col("iv_obs"), ignoreNulls = true)
        .over(nextW))
      .withColumn("iv_filled", coalesce(
        col("iv_obs"),
        (col("prev_iv") + col("next_iv")) / 2.0,
        col("prev_iv"), col("next_iv")))
      .withColumn("fill_src",
        when(col("iv_obs").isNotNull, "obs")
          .when(col("prev_iv").isNotNull && col("next_iv").isNotNull,
            "interp")
          .when(col("prev_iv").isNotNull || col("next_iv").isNotNull,
            "edge")
          .otherwise("empty"))
      .select(col("underlying"), col("dte_bucket"), col("m_bucket"),
        col("m_ord"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("iv_obs"), col("iv_filled"), col("fill_src"))
  }
}
