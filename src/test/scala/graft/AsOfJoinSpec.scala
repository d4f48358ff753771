package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Boundary semantics of the distributed as-of join: inclusive <=,
  * cross-day carry-in, null when no predecessor exists, and the
  * max-value rule for duplicate right timestamps. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest at-or-before, carries across days, nulls else") {
    import spark.implicits._
    val left = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L), // exact tie with right @10:00
      ("a", ts("2024-01-01 09:00:00"), 2L), // before any right -> null
      ("a", ts("2024-01-03 08:00:00"), 3L), // no same-day right -> carry-in
      ("b", ts("2024-01-01 12:00:00"), 4L), // other key, between rights
      ("c", ts("2024-01-01 12:00:00"), 5L)  // key with no rights -> null
    ).toDF("k", "t", "id")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 100.0),
      ("a", ts("2024-01-01 10:00:00"), 101.0), // dup ts -> max wins
      ("a", ts("2024-01-02 23:00:00"), 102.0),
      ("b", ts("2024-01-01 11:00:00"), 200.0),
      ("b", ts("2024-01-01 13:00:00"), 201.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", "v", "asof_v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_v"))).toMap
    assert(out(1L).contains(101.0)) // inclusive tie, max of dup ts
    assert(out(2L).isEmpty)
    assert(out(3L).contains(102.0)) // carried from Jan 2
    assert(out(4L).contains(200.0)) // 11:00 not 13:00
    assert(out(5L).isEmpty)
  }

  test("NULL keys never match; matched-but-null right values stay null") {
    import spark.implicits._
    val left = Seq(
      (Option.empty[String], ts("2024-01-01 10:00:00"), 1L), // null key
      (Option("k"), ts("2024-01-01 11:00:00"), 2L), // latest right val null
      (Option("k"), ts("2024-01-01 09:30:00"), 3L)  // before the null val
    ).toDF("k", "t", "id")
    val right = Seq(
      (Option.empty[String], ts("2024-01-01 09:00:00"), Option(5.0)),
      (Option("k"), ts("2024-01-01 09:00:00"), Option(3.0)),
      (Option("k"), ts("2024-01-01 10:00:00"), Option.empty[Double])
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "t", "v", "asof_v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("asof_v"))).toMap
    assert(out(1L).isEmpty, "null key must not match null-key rights")
    assert(out(2L).isEmpty,
      "the matched 10:00 right row has a null value — result must be null, not the stale 3.0")
    assert(out(3L).contains(3.0))
  }

  test("as-of matches a per-row reference computation on a dense mix") {
    import spark.implicits._
    // deterministic interleaved series across 3 days and 2 keys
    val rights = for {
      k <- Seq("x", "y"); i <- 0 until 40
    } yield (k, new Timestamp(1704100000000L + i * 7200000L + (if (k == "x") 0 else 3600000L)), i.toDouble)
    val lefts = for {
      k <- Seq("x", "y"); j <- 0 until 60
    } yield (k, new Timestamp(1704100000000L + j * 4800000L + 1000L), j.toLong + (if (k == "x") 0L else 1000L))
    val l = lefts.toDF("k", "t", "id")
    val r = rights.toDF("k", "t", "v")
    val out = AsOfJoin.asOf(l, r, "k", "t", "t", "v", "asof_v")
      .collect().map(row => row.getAs[Long]("id") ->
        Option(row.getAs[java.lang.Double]("asof_v"))).toMap
    val rMap = rights.groupBy(_._1)
    for ((k, t, id) <- lefts) {
      val expect = rMap(k).filter(_._2.getTime <= t.getTime)
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(out(id) == expect, s"row $id: got ${out(id)}, want $expect")
    }
  }
}
