package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over the `events` stream table —
  * the batch twins of the ClickHouse-style windowFunnel / retention /
  * sessionization family (the reference's engine ships these as
  * first-class aggregate combinators; here each is a declarative
  * window/join plan Catalyst can optimize).
  *
  * All time arithmetic is integer epoch-microseconds (`unix_micros`),
  * never interval/double math — bit-exact in any engine and immune to
  * the parquet ns→µs truncation difference between readers.
  *
  * Scale notes (100 TB): every operator shuffles at most by
  * `user_id` — sessionize's window and its follow-up aggregate reuse
  * ONE user-keyed exchange (HashPartitioning(user) satisfies the
  * (user, session) clustered distribution), funnel's per-step
  * aggregates are user-keyed equi-joins over already-minimized
  * per-user rows, and retention joins a per-user cohort row (one row
  * per user) back to per-user-day activity. Nothing collects; skewed
  * power users are one partition's worth of rows, not a hot key
  * explosion, because per-user state is O(events of that user).
  */
object EventsAnalytics {

  /** Gap-based sessionization (islands-and-gaps): a new session opens
    * when the gap to the user's previous event STRICTLY exceeds
    * `gapSec`. Emits one row per session with start/end (epoch µs),
    * event count, distinct-type count and exact value total. Window
    * order is (ts, event_id) so same-microsecond events sessionize
    * deterministically. */
  def sessionize(events: DataFrame, gapSec: Long = 1800,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col("_us"), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("_us") - col("_prev") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col("_us")).as("session_start_us"),
        max(col("_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col(typeCol)).as("n_types"),
        graft.util.Parity.dsum(col(valueCol)).as("total_value"))
  }

  /** Funnel levels (windowFunnel analog, earliest-chain semantics):
    * per user, t1 = first `steps(0)` event; each later step's time is
    * the first matching event STRICTLY after the previous step and at
    * most `windowSec` after t1. `funnel_level` = number of chained
    * steps reached (0 for users who never fired step 1 — they are
    * kept, the drop-off denominator). Greedy earliest-chain is a
    * deterministic, engine-independent rule; ClickHouse's
    * windowFunnel(strict_order=0) can match later chains greedy
    * misses — divergence documented here, pinned in the spec and
    * EventsProps.
    *
    * Single-pass shape: ONE scan of the events table and ONE
    * user-keyed shuffle — each user's (time, type) pairs are
    * collected, sorted, and folded through the `aggregate` HOF whose
    * state is the chain-so-far struct. A k-step join-chain
    * formulation would re-scan the fact table k+1 times; at 100 TB
    * the fold is the only shape that survives. Per-user state is
    * O(events of that user), the same bound a stateful streaming
    * funnel needs. Sorting by time alone is enough: a later fold
    * step only fires strictly after the previous step's time, and
    * equal-time candidates produce the identical min. */
  def funnel(events: DataFrame, steps: Seq[String], windowSec: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val winUs = windowSec * 1000000L
    val fields = steps.indices.map(i => s"t${i + 1}_us")
    val zero = struct(
      fields.map(f => lit(null).cast("bigint").as(f)): _*)
    def fold(acc: Column, e: Column): Column = {
      val us = e.getField("us")
      val tp = e.getField("t")
      val cap = acc.getField(fields.head) + winUs
      struct(fields.zipWithIndex.map { case (f, i) =>
        val cur = acc.getField(f)
        val hit =
          if (i == 0) cur.isNull && tp === steps(0)
          else cur.isNull && acc.getField(fields(i - 1)).isNotNull &&
            tp === steps(i) && us > acc.getField(fields(i - 1)) &&
            us <= cap
        when(hit, us).otherwise(cur).as(f)
      }: _*)
    }
    val level = steps.indices.map(i =>
      when(col(s"t${i + 1}_us").isNotNull, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(tsCol)).as("us"), col(typeCol).as("t")))).as("_es"))
      .withColumn("_f", aggregate(col("_es"), zero, fold))
      .select(col(userCol) +: fields.map(f => col(s"_f.$f")): _*)
      .withColumn("funnel_level", level)
  }

  /** Semi-structured props extraction (ClickHouse JSONExtract twin):
    * pulls integer key `key` out of the JSON `propsCol` with the
    * codegen'd `get_json_object` path expression and rolls up exact
    * per-type stats. Missing/malformed keys surface as nulls and are
    * counted separately, never dropped silently. One hash aggregate —
    * the JSON parse runs map-side inside whole-stage codegen. */
  def propsValueStats(events: DataFrame, key: String,
      propsCol: String = "props", typeCol: String = "event_type")
      : DataFrame = {
    val k = get_json_object(col(propsCol), s"$$.$key").cast("long")
    events
      .withColumn("_k", k)
      .groupBy(col(typeCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_k")).as("n_with_key"),
        min(col("_k")).as("min_val"),
        max(col("_k")).as("max_val"),
        sum(col("_k")).as("sum_val"))
  }

  /** Cohort retention: users cohorted by their first event's UTC day;
    * for each day offset in [0, maxOffsetDays], how many cohort
    * members had any event that day. Dates leave as ISO strings and
    * offsets as exact integer day arithmetic on epoch days.
    *
    * Single-pass shape: each user's distinct active-day set is
    * collected in ONE user-keyed aggregate (map-side partial
    * collect_set dedups before the shuffle), the cohort day is the
    * array minimum, and the exploded (day0, offset) rows — one per
    * (user, day), so a plain count IS the distinct-user count — feed
    * the final roll-up. One fact-table scan and two exchanges; the
    * activity-join formulation scanned the events table twice.
    * Per-user state is the active-day set, bounded by the dataset's
    * day span. */
  def retention(events: DataFrame, maxOffsetDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val epochDay = floor(unix_micros(col(tsCol)) / lit(86400000000L))
    events
      .select(col(userCol), epochDay.as("_day"))
      .groupBy(col(userCol))
      .agg(collect_set(col("_day")).as("_days"))
      .withColumn("_day0", array_min(col("_days")))
      .select(col("_day0"), explode(col("_days")).as("_day"))
      .withColumn("day_offset", col("_day") - col("_day0"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("_day0"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_format(timestamp_seconds(col("_day0") * 86400L), "yyyy-MM-dd")
          .as("cohort_date"),
        col("day_offset"), col("n_users"))
  }
}
