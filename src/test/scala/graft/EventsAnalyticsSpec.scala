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

  test("funnel holds a 1M-event user in O(steps) state") {
    // The WindowFunnelChain buffer is the chain struct, not a per-user
    // event array: one pathological bot user with a million events
    // streams through a single task's SortAggregate without
    // materializing anything user-sized. Chain: view@0 -> first
    // click@1 -> first purchase@2 (types cycle v/c/p by index).
    val e = spark.range(1000000L).select(
      col("id").as("event_id"),
      lit(7L).as("user_id"),
      timestamp_micros(col("id")).as("ts"),
      element_at(
        typedLit(Seq("view", "click", "purchase")),
        (col("id") % 3).cast("int") + 1).as("event_type"),
      lit(0.0).as("value"))
    val f = EventsAnalytics.funnel(e, Seq("view", "click", "purchase"),
      windowSec = 3600L)
      .select("user_id", "t1_us", "t2_us", "t3_us", "funnel_level")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(f === Seq((7L, 0L, 1L, 2L, 3L)))
  }

  test("WindowFunnelChain refuses to merge two non-empty partials loudly") {
    // The O(steps) buffer cannot merge two genuine partial chains
    // exactly, so the merge path must RAISE when a group's events ever
    // reach the aggregate from more than one partial buffer (i.e. the
    // input was not pre-partitioned by the group key) — a silent
    // coalesce would return a wrong chain. Build that forbidden plan
    // directly: a partial-before-exchange aggregate over a 2-partition
    // input whose single user fires step 1 in BOTH partitions.
    val chain = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WindowFunnelChain(
        org.apache.spark.sql.GraftBridge.expression(col("_us")),
        org.apache.spark.sql.GraftBridge.expression(col("_t")),
        Seq("view", "click"), 60L * 1000000L).toAggregateExpression())
    val rows = spark.range(2).select(
      lit(1L).as("user_id"),
      (col("id") * 1000000L).as("_us"),
      lit("view").as("_t"))
      .repartition(2, col("_us")) // user 1 spans partitions
      .sortWithinPartitions(col("user_id"), col("_us"))
    val ex = intercept[Exception] {
      rows.groupBy(col("user_id")).agg(chain.as("_f")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("pre-partitioned")),
      s"expected the merge guard to fire, got: ${messages(ex).take(2)}")
  }

  test("funnelAnyChain completes via a later anchor where greedy can't") {
    // view@0 can't reach its click within the window; view@5s can.
    // Greedy (earliest-anchor) stops at level 1; any-chain reports the
    // level-2 chain anchored at 5s — the documented divergence, pinned
    // both ways.
    val e = ev(
      (1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 5000000L, "view", 0.0),
      (3L, 1L, 6000000L, "click", 0.0))
    val greedy = EventsAnalytics.funnel(e, Seq("view", "click"), 2L)
      .select("user_id", "funnel_level").as[(Long, Long)].collect().toSeq
    assert(greedy === Seq((1L, 1L)))
    val any = EventsAnalytics.funnelAnyChain(e, Seq("view", "click"), 2L)
      .select("user_id", "t1_us", "t2_us", "funnel_level_any")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(any === Seq((1L, 5000000L, 6000000L, 2L)))
  }

  test("funnelAnyChain reports the EARLIEST anchor reaching the max level") {
    val e = ev(
      (1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 1000000L, "view", 0.0),
      (3L, 1L, 2000000L, "click", 0.0),  // both anchors reach level 2
      (4L, 2L, 0L, "click", 0.0))        // no anchor -> level 0 row
    val any = EventsAnalytics.funnelAnyChain(e, Seq("view", "click"), 60L)
      .select("user_id", "t1_us", "funnel_level_any")
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(any === Set((1L, Some(0L), 2L), (2L, None, 0L)))
  }

  test("funnelAnyChain chases the third step through the second's pointer") {
    val e = ev(
      // anchor@0: click@1 then NO purchase in (1, cap]; anchor@2:
      // click@3, purchase@4 completes. Strictness: purchase tied with
      // click (user 2) never chains.
      (1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 1000000L, "click", 0.0),
      (3L, 1L, 2000000L, "view", 0.0),
      (4L, 1L, 3000000L, "click", 0.0),
      (5L, 1L, 4000000L, "purchase", 0.0),
      (6L, 2L, 0L, "view", 0.0),
      (7L, 2L, 1000000L, "click", 0.0),
      (8L, 2L, 1000000L, "purchase", 0.0)) // tied with click -> no chain
    val any = EventsAnalytics.funnelAnyChain(
      e, Seq("view", "click", "purchase"), 2L)
      .select("user_id", "t1_us", "funnel_level_any")
      .as[(Long, Long, Long)].collect().toSet
    // user 1: anchor@2s reaches 3 (purchase 4s <= 2s+2s); anchor@0
    //   only reaches 2 (purchase 4s > 0+2s cap).
    // user 2: purchase tied at 1s is not strictly after the click.
    assert(any === Set((1L, 2000000L, 3L), (2L, 0L, 2L)))
  }

  test("propsMultiKeyStats parses once and keeps absent keys visible") {
    import spark.implicits._
    val e = Seq(
      (1L, "a", """{"k": 5, "m": 2}"""),
      (2L, "a", """{"k": 7}"""),
      (3L, "b", """{"m": 9}"""))
      .toDF("event_id", "event_type", "props")
    val s = EventsAnalytics.propsMultiKeyStats(e, Seq("k", "m", "absent"))
      .select("event_type", "key_name", "n_events", "n_with_key", "sum_val")
      .as[(String, String, Long, Long, Option[Long])].collect().toSet
    assert(s === Set(
      ("a", "k", 2L, 2L, Some(12L)),
      ("a", "m", 2L, 1L, Some(2L)),
      ("a", "absent", 2L, 0L, None),
      ("b", "k", 1L, 0L, None),
      ("b", "m", 1L, 1L, Some(9L)),
      ("b", "absent", 1L, 0L, None)))
  }

  test("propsValueStats nulls non-integer values instead of truncating") {
    import spark.implicits._
    val e = Seq(
      (1L, "a", """{"k": 5}"""),
      (2L, "a", """{"k": 1.5}"""),   // non-integer -> null, never 1
      (3L, "a", """{"k": "x"}"""))   // junk -> null, never an error
      .toDF("event_id", "event_type", "props")
    val s = EventsAnalytics.propsValueStats(e, key = "k")
      .select("n_events", "n_with_key", "sum_val")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s === Seq((3L, 1L, 5L)))
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

  test("pathTransitions counts adjacent pairs per user with exact P and rank") {
    val e = ev(
      // user 1: a -> b -> a -> c ; user 2: b -> c
      (1L, 1L, 0L, "a", 0.0),
      (2L, 1L, 1000000L, "b", 0.0),
      (3L, 1L, 2000000L, "a", 0.0),
      (4L, 1L, 3000000L, "c", 0.0),
      (5L, 2L, 0L, "b", 0.0),
      (6L, 2L, 1000000L, "c", 0.0))
    val t = EventsAnalytics.pathTransitions(e)
      .select("from_type", "to_type", "n_transitions", "p_transition",
        "transition_rank")
      .as[(String, String, Long, Double, Int)].collect().toSet
    assert(t === Set(
      ("a", "b", 1L, 0.5, 1), ("a", "c", 1L, 0.5, 2),
      ("b", "a", 1L, 0.5, 1), ("b", "c", 1L, 0.5, 2)))
  }

  test("pathTransitions never pairs across users; ties order by event_id") {
    val e = ev(
      (2L, 1L, 5000000L, "b", 0.0),
      (1L, 1L, 5000000L, "a", 0.0), // same µs: event_id orders a before b
      (3L, 2L, 9000000L, "c", 0.0)) // singleton user: no transition
    val t = EventsAnalytics.pathTransitions(e)
      .select("from_type", "to_type")
      .as[(String, String)].collect().toSeq
    assert(t === Seq(("a", "b")))
  }
}
