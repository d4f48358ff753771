package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join: for every left row, the latest right value
  * with `rightTime <= leftTime` within the same key — the operator the
  * prompt's custom-operator ladder names first, built from composed
  * Spark primitives (ladder step (a)) instead of a custom SparkPlan:
  *
  *   1. dedup right rows per (key, time) — ties take max(value), so
  *      the result is well-defined in any engine;
  *   2. union left+right tagged rows, window per (key, DAY bucket)
  *      ordered by (time, right-before-left) with a running
  *      last-non-null — an O(1)-state frame, never a sort across keys;
  *   3. carry the last right value of each (key, day) forward via a
  *      window over the per-day summary (rows = keys x days, tiny),
  *      so a left row with no same-day predecessor still sees the
  *      previous days' value.
  *
  * Partitioning by (key, day) instead of key alone is the scale
  * design: with 2 underlyings and years of ticks, a key-only window
  * funnels half the corpus through one task; day buckets keep every
  * window task bounded while the boundary fix-up stays
  * metadata-sized. Same decomposition as DataQuality.gapAnalysis.
  *
  * Inclusive (<=) semantics match DuckDB/pandas ASOF so the oracle is
  * the native ASOF LEFT JOIN.
  */
object AsOfJoin {

  /** leftDf asOf-joined to rightDf on `key`: adds `asofCol` = latest
    * `rightVal` at-or-before the left row's `leftTime`. Right rows
    * with duplicate (key, rightTime) collapse to max(rightVal). */
  def asOf(
      leftDf: DataFrame, rightDf: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVal: String, asofCol: String): DataFrame = {
    val ep = col("_ep")
    val day = col("_day")

    // 1. well-defined right side; microsecond epoch (Spark timestamp
    //    resolution — the oracle truncates to the same grid)
    val rights = rightDf
      .groupBy(col(key), unix_micros(col(rightTime)).as("_ep"))
      .agg(max(col(rightVal)).as("_rv"))
      .select(col(key).as("_k"), col("_ep"),
        lit(1).as("_isRight"), col("_rv"))

    val lefts = leftDf
      .withColumn("_k", col(key))
      .withColumn("_ep", unix_micros(col(leftTime)))
      .withColumn("_isRight", lit(0))
      .withColumn("_rv", lit(null).cast(rights.schema("_rv").dataType))

    // 2. same-day running last (right rows sort before left on ties
    //    so <= is inclusive)
    val tagged = lefts.select(
      (Seq(col("_k"), ep, col("_isRight"), col("_rv")) ++
        leftDf.columns.map(c => col(c).as(s"_l_$c"))): _*)
      .unionByName(rights.select(col("_k"), ep, col("_isRight"), col("_rv")),
        allowMissingColumns = true)
      .withColumn("_day", floor(ep / 86400000000L))
    val sameDay = Window.partitionBy(col("_k"), day)
      .orderBy(ep.asc, col("_isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winned = tagged.withColumn("_sameday",
      last(col("_rv"), ignoreNulls = true).over(sameDay))

    // 3. carry-in: last right value of each (key, day), carried to
    //    later days (window over the tiny per-day summary). Left days
    //    with NO right rows union in as value-less day rows — they
    //    must still RECEIVE a carry from earlier days.
    val perDay = rights.withColumn("_day", floor(ep / 86400000000L))
      .groupBy(col("_k"), day)
      // (key, ep) is unique after step 1, so max_by on ep is total
      .agg(max_by(col("_rv"), ep).as("_dayLast"))
    val leftDays = tagged.filter(col("_isRight") === 0)
      .select(col("_k"), day).distinct()
      .withColumn("_dayLast", lit(null).cast(rights.schema("_rv").dataType))
    val allDays = perDay.unionByName(leftDays)
      .groupBy(col("_k"), day)
      .agg(max(col("_dayLast")).as("_dayLast"))
    val carry = Window.partitionBy(col("_k")).orderBy(day.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allDays.withColumn("_carry",
      last(col("_dayLast"), ignoreNulls = true).over(carry))
      .select(col("_k"), day, col("_carry"))

    winned.filter(col("_isRight") === 0)
      .join(carryIn, Seq("_k", "_day"), "left")
      .withColumn(asofCol, coalesce(col("_sameday"), col("_carry")))
      .select(leftDf.columns.map(c => col(s"_l_$c").as(c))
        :+ col(asofCol): _*)
  }
}
