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
  *   3. carry the last right row of each (key, day) forward via a
  *      window over the per-day summary (rows = keys x days, tiny),
  *      so a left row with no same-day predecessor still sees the
  *      previous days' value.
  *
  * ASOF-equality parity (matches DuckDB/pandas):
  *  - NULL keys never match (right NULL-key rows are dropped; left
  *    NULL-key rows get a NULL result) — equality-join semantics, not
  *    Window's NULLs-group-together;
  *  - a matched right row whose VALUE is null yields null (not an
  *    older non-null value): the windows carry a (time, value) struct
  *    — never null for a right row — and the value is extracted after
  *    the match, so "matched but null" and "no match" stay distinct.
  *
  * Partitioning by (key, day) instead of key alone is the scale
  * design: with 2 underlyings and years of ticks, a key-only window
  * funnels half the corpus through one task; day buckets keep every
  * window task bounded while the boundary fix-up stays
  * metadata-sized. Same decomposition as DataQuality.gapAnalysis.
  * The deduped right side feeds two branches (tagged union + per-day
  * summary) and is materialized once; the left side is scanned twice
  * (tagged union + day list) — two scans of the source beat caching a
  * 100 TB fact.
  */
object AsOfJoin {

  /** leftDf asOf-joined to rightDf on `key`: adds `asofCol` = latest
    * `rightVal` at-or-before the left row's `leftTime`. Right rows
    * with duplicate (key, rightTime) collapse to max(rightVal). */
  def asOf(
      leftDf: DataFrame, rightDf: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVal: String, asofCol: String,
      matchEpochCol: Option[String] = None): DataFrame = {
    val ep = col("_ep")
    val day = col("_day")

    // 1. well-defined right side; microsecond epoch (Spark timestamp
    //    resolution — the oracle truncates to the same grid). `_rs`
    //    is the match-carrying struct: non-null for every right row
    //    even when the value itself is null.
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

    // 2. same-day running last (right rows sort before left on ties
    //    so <= is inclusive)
    val tagged = lefts.select(
      (Seq(col("_k"), ep, col("_isRight"), col("_rs")) ++
        leftDf.columns.map(c => col(c).as(s"_l_$c"))): _*)
      .unionByName(rights.select(col("_k"), ep, col("_isRight"), col("_rs")),
        allowMissingColumns = true)
      .withColumn("_day", floor(ep / 86400000000L))
    val sameDay = Window.partitionBy(col("_k"), day)
      .orderBy(ep.asc, col("_isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val winned = tagged.withColumn("_sameday",
      last(col("_rs"), ignoreNulls = true).over(sameDay))

    // 3. carry-in: last right row of each (key, day), carried to
    //    later days (window over the tiny per-day summary). Left days
    //    (from the cheap left projection, not the union) join in as
    //    row-less days — they must still RECEIVE a carry.
    val perDay = rights.withColumn("_day", floor(ep / 86400000000L))
      .groupBy(col("_k"), day)
      // (key, ep) is unique after step 1, so max_by on ep is total
      .agg(max_by(col("_rs"), ep).as("_dayLast"))
    val leftDays = lefts
      .select(col("_k"), floor(ep / 86400000000L).as("_day")).distinct()
      .withColumn("_dayLast", lit(null).cast(rsType))
    val allDays = perDay.unionByName(leftDays)
      .groupBy(col("_k"), day)
      // max ignores the null placeholder when the day also has rights
      .agg(max(col("_dayLast")).as("_dayLast"))
    val carry = Window.partitionBy(col("_k")).orderBy(day.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allDays.withColumn("_carry",
      last(col("_dayLast"), ignoreNulls = true).over(carry))
      .select(col("_k"), day, col("_carry"))

    val matched = coalesce(col("_sameday"), col("_carry"))
    val extra = Seq(col(asofCol)) ++
      matchEpochCol.map(n => col(n)).toSeq
    winned.filter(col("_isRight") === 0)
      .join(carryIn, Seq("_k", "_day"), "left")
      .withColumn(asofCol, matched.getField("_rv"))
      .withColumns(matchEpochCol.map(n =>
        n -> matched.getField("_rts")).toMap)
      .select(leftDf.columns.map(c => col(s"_l_$c").as(c)) ++ extra: _*)
  }

  /** As-of join with a freshness tolerance (pandas `merge_asof
    * tolerance=`): a match older than `tolSec` is treated as stale —
    * the value is nulled, but the raw age stays observable. Adds
    * `asofCol` (fresh matches only), `asof_age_sec` (left − matched
    * right time, floor seconds; null when no match at all) and
    * `is_fresh`. Same distributed shape as [[asOf]] — the tolerance
    * is a pure post-projection, no extra shuffle. */
  def asOfTolerance(
      leftDf: DataFrame, rightDf: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVal: String, asofCol: String, tolSec: Long): DataFrame =
    asOf(leftDf, rightDf, key, leftTime, rightTime, rightVal, asofCol,
      matchEpochCol = Some("_match_us"))
      // leftTime goes through col() (never spliced into SQL text), so
      // names needing backticks work; the expr only sees the internal
      // _age_us. Age ≥ 0 by asof construction, so `div` == floor-div.
      .withColumn("_age_us", unix_micros(col(leftTime)) - col("_match_us"))
      .withColumn("asof_age_sec", expr("_age_us div 1000000L"))
      .drop("_age_us")
      .withColumn("is_fresh",
        col("_match_us").isNotNull && col("asof_age_sec") <= tolSec)
      .withColumn(asofCol, when(col("is_fresh"), col(asofCol)))
      .drop("_match_us")
}
