package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Containment semantics of the bucketized range join. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("containmentJoin: inclusive bounds, cross-bucket intervals, drops misses") {
    val day = 86400L
    // interval spans three day-buckets; bounds inclusive
    val iv = Seq(("BTC", 1L, day - 10L, 2 * day + 10L))
      .toDF("symbol", "session_seq", "start_ep", "end_ep")
    val pts = Seq(
      ("BTC", day - 10L),     // exactly start -> in
      ("BTC", 2 * day + 10L), // exactly end -> in
      ("BTC", day + 5L),      // middle bucket -> in
      ("BTC", day - 11L),     // before start, same bucket -> out
      ("BTC", 2 * day + 11L), // after end, same bucket -> out
      ("ETH", day + 5L))      // wrong key -> out
      .toDF("symbol", "ep")
    val got = IntervalJoin
      .containmentJoin(pts, iv, "symbol", "ep", "start_ep", "end_ep")
      .select("ep").as[Long].collect().toSet
    assert(got === Set(day - 10L, 2 * day + 10L, day + 5L))
  }

  test("overlapping intervals emit one row per enclosure") {
    val iv = Seq(
      ("BTC", 1L, 0L, 100L),
      ("BTC", 2L, 50L, 150L))
      .toDF("symbol", "session_seq", "start_ep", "end_ep")
    val pts = Seq(("BTC", 75L)).toDF("symbol", "ep")
    val got = IntervalJoin
      .containmentJoin(pts, iv, "symbol", "ep", "start_ep", "end_ep")
      .select("session_seq").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("activityIntervals: strict gap threshold, inclusive bounds") {
    val ev = Seq(
      ("BTC", 0L), ("BTC", 100L), // gap 100 = threshold -> same
      ("BTC", 201L),              // gap 101 > 100 -> new session
      ("ETH", 5L))
      .toDF("symbol", "ep")
    val iv = IntervalJoin.activityIntervals(ev, "symbol", "ep", 100L)
      .orderBy("symbol", "session_seq")
      .select("symbol", "session_seq", "start_ep", "end_ep")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(iv == Seq(
      ("BTC", 1L, 0L, 100L), ("BTC", 2L, 201L, 201L),
      ("ETH", 1L, 5L, 5L)))
  }
}
