package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable interval-containment join — the range-join pattern a
  * naive `a.start <= b.ts AND b.ts <= a.end` theta-join turns into a
  * cartesian disaster at scale. Spark's planner has no interval
  * index, so the classic fix is BUCKETIZATION: explode each interval
  * into the fixed-width buckets it spans, key the points by their
  * bucket, and equi-join on (key, bucket) with the exact containment
  * predicate as a post-filter. The join is then a plain shuffled
  * hash/sort-merge equi-join Catalyst can plan, the fan-out is
  * bounded by interval length / bucket width, and no all-pairs ever
  * materializes (pinned by the plan audit: zero
  * BroadcastNestedLoopJoin / CartesianProduct).
  */
object IntervalJoin {

  /** Join `points` (keyCol, tsCol in epoch seconds) to the enclosing
    * interval in `intervals` (keyCol, startCol, endCol — inclusive
    * epoch-second bounds). Inner semantics: points in no interval
    * drop; overlapping intervals yield one row per enclosure.
    * `bucketSec` trades fan-out (long intervals explode into
    * span/bucketSec rows) against join selectivity. */
  def containmentJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      bucketSec: Long = 86400L): DataFrame = {
    // Integer `div` (truncation, monotone) keeps bucket boundaries
    // exact for any integer epoch resolution — double division would
    // lose exactness past 2^53 (sub-second epochs) and cast-truncation
    // of a double is implementation-defined around negative zeros.
    // Containment only needs the SAME monotone bucket fn on both
    // sides, which `div` is. The epochs land in fixed internal
    // columns first so `expr` never sees a caller-supplied name; the
    // __gij_ prefix is reserved and enforced against both inputs.
    val clash = (points.columns ++ intervals.columns)
      .filter(_.startsWith("__gij_"))
    require(clash.isEmpty,
      s"containmentJoin reserves the __gij_ column prefix; found: ${clash.mkString(", ")}")
    val iv = intervals
      .withColumn("__gij_s_ep", col(startCol).cast("long"))
      .withColumn("__gij_e_ep", col(endCol).cast("long"))
      .withColumn("__gij_bucket",
        explode(sequence(
          expr(s"__gij_s_ep div ${bucketSec}L"),
          expr(s"__gij_e_ep div ${bucketSec}L"))))
      .drop("__gij_s_ep", "__gij_e_ep")
    val pt = points
      .withColumn("__gij_t_ep", col(tsCol).cast("long"))
      .withColumn("__gij_bucket", expr(s"__gij_t_ep div ${bucketSec}L"))
      .drop("__gij_t_ep")
    pt.join(iv, Seq(keyCol, "__gij_bucket"))
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__gij_bucket")
  }

  /** Gap-based activity intervals from an event-time column: one row
    * per (key, session) with inclusive [start, end] epoch-second
    * bounds — islands-and-gaps over a lag window, a new interval when
    * the gap STRICTLY exceeds `gapSec`. */
  def activityIntervals(events: DataFrame, keyCol: String,
      epCol: String, gapSec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(epCol))
    events
      .select(col(keyCol), col(epCol))
      .withColumn("_new",
        when(col(epCol) - lag(col(epCol), 1).over(w) > gapSec, 1)
          .otherwise(when(lag(col(epCol), 1).over(w).isNull, 1)
            .otherwise(0)))
      .withColumn("session_seq",
        sum(col("_new")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(epCol)).as("start_ep"), max(col(epCol)).as("end_ep"))
  }

  /** Interval×interval OVERLAP join (`l.start <= r.end AND r.start <=
    * l.end`, inclusive epoch-second bounds) — the other classic range
    * join Catalyst would plan as a key-only join with a theta
    * post-filter, i.e. a per-key cartesian. Same bucketization cure
    * as [[containmentJoin]], with one extra wrinkle: a pair of
    * overlapping intervals shares EVERY bucket in the overlap span,
    * so a naive equi-join on (key, bucket) emits the pair once per
    * shared bucket. Rather than a dedup shuffle (`distinct` over the
    * pair columns — a second exchange), each pair is claimed by the
    * single canonical bucket `max(bucket(l.start), bucket(r.start))`:
    * overlap implies `max(l.start, r.start) <= min(l.end, r.end)`,
    * so that bucket lies inside both intervals' bucket ranges (the
    * bucket fn is monotone), both sides emit it, and exactly one
    * joined row survives the equality filter. Output: every column of
    * both inputs (caller guarantees disjoint names apart from
    * `keyCol`), exactly once per overlapping pair.
    *
    * Internal scratch columns use a `__gij_` prefix and are rejected
    * (fail-fast `require`) if either input already carries one — a
    * caller column silently shadowing the bucket key would corrupt
    * the join, so the reserved namespace is enforced, not just
    * documented.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lStartCol: String, lEndCol: String,
      rStartCol: String, rEndCol: String,
      bucketSec: Long = 86400L): DataFrame = {
    // fixed internal names so `expr`/sequence never see caller input;
    // the prefix is reserved and enforced against both inputs
    val clash = (left.columns ++ right.columns).filter(_.startsWith("__gij_"))
    require(clash.isEmpty,
      s"overlapJoin reserves the __gij_ column prefix; found: ${clash.mkString(", ")}")
    val lb = left
      .withColumn("__gij_ls", col(lStartCol).cast("long"))
      .withColumn("__gij_le", col(lEndCol).cast("long"))
      .withColumn("__gij_lsb", expr(s"__gij_ls div ${bucketSec}L"))
      .withColumn("__gij_bucket",
        explode(sequence(col("__gij_lsb"), expr(s"__gij_le div ${bucketSec}L"))))
      .drop("__gij_ls", "__gij_le")
    val rb = right
      .withColumn("__gij_rs", col(rStartCol).cast("long"))
      .withColumn("__gij_re", col(rEndCol).cast("long"))
      .withColumn("__gij_rsb", expr(s"__gij_rs div ${bucketSec}L"))
      .withColumn("__gij_bucket",
        explode(sequence(col("__gij_rsb"), expr(s"__gij_re div ${bucketSec}L"))))
      .drop("__gij_rs", "__gij_re")
    lb.join(rb, Seq(keyCol, "__gij_bucket"))
      .filter(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol))
      .filter(col("__gij_bucket") ===
        greatest(col("__gij_lsb"), col("__gij_rsb")))
      .drop("__gij_bucket", "__gij_lsb", "__gij_rsb")
  }
}
