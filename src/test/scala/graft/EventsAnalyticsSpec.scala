package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventsAnalytics

/** Behavioral-analytics operators: gap-session boundaries, greedy
  * funnel chaining + window cutoff, cohort retention offsets. */
class EventsAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")

  test("sessionize splits strictly-greater gaps and keeps exact-gap events together") {
    val gap = 10L // seconds
    val e = ev(
      (1L, 1L, 0L, "a", 1.0),
      (2L, 1L, 10000000L, "b", 2.0),  // exactly gap -> same session
      (3L, 1L, 20000001L, "a", 3.0),  // gap + 1us -> new session
      (4L, 2L, 0L, "a", 4.0))
    val s = EventsAnalytics.sessionize(e, gapSec = gap)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(s === Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("sessionize orders same-microsecond events by event_id") {
    val e = ev(
      (2L, 1L, 5000000L, "b", 1.0),
      (1L, 1L, 5000000L, "a", 1.0))
    val s = EventsAnalytics.sessionize(e, gapSec = 1L)
    assert(s.count() === 1) // zero gap: one session however ordered
  }

  test("funnel chains steps in order within the window from step 1") {
    val e = ev(
      // user 1: full chain inside window
      (1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 1000000L, "click", 0.0),
      (3L, 1L, 2000000L, "purchase", 0.0),
      // user 2: click BEFORE view never chains; later click does
      (4L, 2L, 0L, "click", 0.0),
      (5L, 2L, 1000000L, "view", 0.0),
      (6L, 2L, 2000000L, "click", 0.0),
      // user 3: purchase outside the window from t1
      (7L, 3L, 0L, "view", 0.0),
      (8L, 3L, 1000000L, "click", 0.0),
      (9L, 3L, 100000000L, "purchase", 0.0),
      // user 4: no step-1 event at all -> level 0, still a row
      (10L, 4L, 0L, "click", 0.0))
    val f = EventsAnalytics.funnel(e, Seq("view", "click", "purchase"),
      windowSec = 60L)
      .select("user_id", "funnel_level")
      .as[(Long, Long)].collect().toMap
    assert(f === Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 0L))
  }

  test("funnel step times are the earliest chainable events") {
    val e = ev(
      (1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 1000000L, "click", 0.0),
      (3L, 1L, 500000L, "click", 0.0)) // earlier click wins
    val f = EventsAnalytics.funnel(e, Seq("view", "click"), 60L)
      .select("t2_us").as[Long].collect()
    assert(f.toSeq === Seq(500000L))
  }

  test("propsValueStats extracts JSON ints and counts missing keys apart") {
    import spark.implicits._
    val e = Seq(
      (1L, 1L, "a", """{"k": 5}"""),
      (2L, 1L, "a", """{"k": 7}"""),
      (3L, 1L, "a", """{"other": 1}"""),  // missing key -> null
      (4L, 1L, "b", "not json"))          // malformed -> null
      .toDF("event_id", "user_id", "event_type", "props")
    val s = EventsAnalytics.propsValueStats(e, key = "k")
      .select("event_type", "n_events", "n_with_key", "min_val", "sum_val")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(s === Set(
      ("a", 3L, 2L, Some(5L), Some(12L)),
      ("b", 1L, 0L, None, None)))
  }

  test("retention counts distinct cohort users per day offset") {
    val day = 86400000000L
    val e = ev(
      (1L, 1L, 0L, "a", 0.0),          // cohort day 0
      (2L, 1L, day + 1L, "a", 0.0),    // offset 1
      (3L, 1L, day + 2L, "a", 0.0),    // offset 1 again (distinct once)
      (4L, 2L, 0L, "a", 0.0),          // cohort day 0
      (5L, 2L, 9 * day, "a", 0.0))     // offset 9 > max -> dropped
    val r = EventsAnalytics.retention(e, maxOffsetDays = 7)
      .select("cohort_date", "day_offset", "n_users")
      .as[(String, Long, Long)].collect().toSet
    assert(r === Set(("1970-01-01", 0L, 2L), ("1970-01-01", 1L, 1L)))
  }
}
