package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed NEAREST-temporal join: for every left row, the right
  * value whose time is closest in EITHER direction within the same
  * key (ties → the backward match, the as-of convention). The
  * bidirectional sibling of [[AsOfJoin]] — the enrichment the
  * reference's 15-min bucket join approximates (reference
  * `features/spot_provider.py:118-127` takes "the bucket's bar"),
  * stated exactly.
  *
  * Same merged-stream decomposition as [[AsOfJoin]] (tagged union,
  * (key, DAY-bucket) windows, metadata-sized cross-day carry), but
  * running BOTH directions in one partitioning:
  *   - backward: running last-non-null over (ep asc, right-first);
  *   - forward: running first-non-null over (ep asc, right-LAST) with
  *     a current→following frame — the flipped tie order makes a
  *     same-microsecond right row visible to the left row in both
  *     directions (inclusive ≤ / ≥), matching the dedup convention.
  * The two sorts share one (key, day) exchange. Cross-day carries are
  * windows over the per-(key, day) summary (keys × days rows): the
  * day's last right row carried forward, the day's first carried
  * backward.
  *
  * Result is well-defined in any engine: right rows collapse to one
  * per (key, µs) with max(value) first; distances are exact integer
  * µs; equal distance picks the backward row. */
object NearestJoin {

  /** leftDf nearest-joined to rightDf on `key`: adds `valCol` = the
    * nearest `rightVal`, and `deltaCol` = |Δt| in µs (NULL when the
    * key has no right rows at all). */
  def nearest(
      leftDf: DataFrame, rightDf: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVal: String, valCol: String, deltaCol: String): DataFrame = {
    val ep = col("_ep")
    val day = col("_day")

    val rights = graft.util.Caches.materialize(rightDf
      .filter(col(key).isNotNull)
      .groupBy(col(key), unix_micros(col(rightTime)).as("_ep"))
      .agg(max(col(rightVal)).as("_rv"))
      .select(col(key).as("_k"), col("_ep"), lit(1).as("_isRight"),
        struct(col("_ep").as("_rts"), col("_rv").as("_rv")).as("_rs")))
    val rsType = rights.schema("_rs").dataType

    val lefts = leftDf
      .withColumn("_k", col(key))
      .withColumn("_ep", unix_micros(col(leftTime)))
      .withColumn("_isRight", lit(0))
      .withColumn("_rs", lit(null).cast(rsType))

    val tagged = lefts.select(
      (Seq(col("_k"), ep, col("_isRight"), col("_rs")) ++
        leftDf.columns.map(c => col(c).as(s"_l_$c"))): _*)
      .unionByName(rights.select(col("_k"), ep, col("_isRight"), col("_rs")),
        allowMissingColumns = true)
      .withColumn("_day", floor(ep / 86400000000L))

    // backward: right rows sort BEFORE left on µs ties (inclusive <=)
    val wBack = Window.partitionBy(col("_k"), day)
      .orderBy(ep.asc, col("_isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: right rows sort AFTER left on ties (inclusive >=)
    val wFwd = Window.partitionBy(col("_k"), day)
      .orderBy(ep.asc, col("_isRight").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val winned = tagged
      .withColumn("_before", last(col("_rs"), ignoreNulls = true).over(wBack))
      .withColumn("_after", first(col("_rs"), ignoreNulls = true).over(wFwd))

    // cross-day carries over the per-(key, day) summary
    val perDay = rights.withColumn("_day", floor(ep / 86400000000L))
      .groupBy(col("_k"), day)
      .agg(max_by(col("_rs"), ep).as("_dayLast"),
        min_by(col("_rs"), ep).as("_dayFirst"))
    val leftDays = lefts
      .select(col("_k"), floor(ep / 86400000000L).as("_day")).distinct()
      .withColumn("_dayLast", lit(null).cast(rsType))
      .withColumn("_dayFirst", lit(null).cast(rsType))
    val allDays = perDay.unionByName(leftDays)
      .groupBy(col("_k"), day)
      .agg(max(col("_dayLast")).as("_dayLast"),
        min(col("_dayFirst")).as("_dayFirst"))
    val wCarryIn = Window.partitionBy(col("_k")).orderBy(day.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCarryBack = Window.partitionBy(col("_k")).orderBy(day.asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val carries = allDays
      .withColumn("_carryIn",
        last(col("_dayLast"), ignoreNulls = true).over(wCarryIn))
      .withColumn("_carryBack",
        first(col("_dayFirst"), ignoreNulls = true).over(wCarryBack))
      .select(col("_k"), day, col("_carryIn"), col("_carryBack"))

    val before = coalesce(col("_before"), col("_carryIn"))
    val after = coalesce(col("_after"), col("_carryBack"))
    val dBefore = ep - before.getField("_rts") // >= 0
    val dAfter = after.getField("_rts") - ep   // >= 0
    val pick =
      when(before.isNull, after)
        .when(after.isNull, before)
        .when(dBefore <= dAfter, before)
        .otherwise(after)

    winned.filter(col("_isRight") === 0)
      .join(carries, Seq("_k", "_day"), "left")
      .withColumn("_pick", pick)
      .withColumn(valCol, col("_pick").getField("_rv"))
      .withColumn(deltaCol, abs(ep - col("_pick").getField("_rts")))
      .select(leftDf.columns.map(c => col(s"_l_$c").as(c))
        :+ col(valCol) :+ col(deltaCol): _*)
  }
}
